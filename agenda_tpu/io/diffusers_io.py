"""HF-diffusers checkpoint import/export for the flax SD models.

The reference loads/saves models exclusively in the diffusers directory layout
(``StableDiffusionPipeline.from_pretrained`` / ``save_pretrained``,
``data_generation/finetune_sd.py:485-520, 896-911``). This module makes our
flax models bit-compatible with that layout so published AGenDA checkpoints
(and vanilla SD-1.4/1.5) load directly, and our fine-tuned pipelines load back
into torch diffusers:

    <dir>/
      model_index.json
      unet/config.json + diffusion_pytorch_model.safetensors
      vae/config.json + diffusion_pytorch_model.safetensors
      text_encoder/config.json + model.safetensors
      tokenizer/vocab.json + merges.txt + ...
      scheduler/scheduler_config.json

Key/layout translation (torch -> flax):
  conv weight (O,I,H,W)   -> kernel (H,W,I,O)
  linear weight (O,I)     -> kernel (I,O)
  norm weight             -> scale
  *embedding.weight       -> verbatim (lookup tables are not transposed)
All weights are stored/read as f32 numpy via safetensors (torch .bin fallback
via torch CPU for legacy checkpoints).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, Tuple

import numpy as np

from agenda_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from agenda_tpu.models.unet import UNet2DConditionModel, UNetConfig
from agenda_tpu.models.vae import AutoencoderKL, VAEConfig

# ---------------------------------------------------------------------------
# flat tensor-dict helpers
# ---------------------------------------------------------------------------


def _read_tensor_file(path_base: str) -> Dict[str, np.ndarray]:
    """Read <base>.safetensors or <base>.bin into {key: f32 numpy}."""
    st = path_base + ".safetensors"
    if os.path.exists(st):
        from safetensors import safe_open

        out = {}
        with safe_open(st, framework="numpy") as f:
            for k in f.keys():
                t = f.get_tensor(k)
                if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
                    t = t.astype(np.float32)
                out[k] = t
        return out
    bin_path = path_base + ".bin"
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No {path_base}.safetensors or .bin")


def _write_safetensors(path: str, tensors: Dict[str, np.ndarray]) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)


def _nest(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value
    return tree


def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


_INDEXED = re.compile(
    r"\.(\d+)(?=\.|$)"
)  # ".0." -> "_0." for list-ish torch module names


def _is_embedding_key(key: str) -> bool:
    return key.endswith("token_embedding.weight") or key.endswith("position_embedding.weight")


def _torch_leaf_to_flax(key: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map the final '.weight'/'.bias' segment + layout."""
    if _is_embedding_key(key):
        return "embedding_table", value  # handled by caller specially
    if key.endswith(".bias"):
        return "bias", value
    if key.endswith(".weight"):
        if value.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear (O,I) -> (I,O)
            return "kernel", value.transpose(1, 0)
        return "scale", value  # 1D: Layer/GroupNorm weight
    raise ValueError(f"Unhandled torch key {key}")


def _flax_leaf_to_torch(leaf: str, value: np.ndarray) -> np.ndarray:
    if leaf == "kernel":
        if value.ndim == 4:
            return value.transpose(3, 2, 0, 1)
        return value.transpose(1, 0)
    return value


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def _unet_key_to_path(key: str) -> Tuple[str, ...]:
    """'down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight'
    -> ('down_blocks_0','attentions_1','transformer_blocks_0','attn1','to_q')."""
    key = key.replace("to_out.0", "to_out_0")
    key = _INDEXED.sub(lambda m: f"_{m.group(1)}", key)
    parts = key.split(".")
    return tuple(parts[:-1])  # drop weight/bias


def unet_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    flat = {}
    for key, value in sd.items():
        # ff.net.0.proj / ff.net.2 handled by generic index flattening:
        # 'ff.net.0.proj.weight' -> ('ff','net_0','proj'); 'ff.net.2.weight' -> ('ff','net_2')
        path = _unet_key_to_path(key)
        leaf, v = _torch_leaf_to_flax(key, value)
        flat[path + (leaf,)] = v
    return {"params": _nest(flat)}


def unet_flax_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = _flatten(params.get("params", params))
    out = {}
    for path, value in flat.items():
        leaf = path[-1]
        name = ".".join(path[:-1])
        name = re.sub(r"_(\d+)(?=\.|$)", r".\1", name)
        # time_embedding MLP keeps its literal torch names.
        name = name.replace("linear.1", "linear_1").replace("linear.2", "linear_2")
        torch_leaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
        out[f"{name}.{torch_leaf}"] = _flax_leaf_to_torch(leaf, value)
    return out


# ---------------------------------------------------------------------------
# VAE — flax module names are fully flattened ('down_blocks_0_resnets_0')
# ---------------------------------------------------------------------------

_VAE_ATTN_RENAMES = {  # legacy diffusers VAE attention naming
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": "to_out_0",
}


def _vae_key_to_path(key: str) -> Tuple[str, ...]:
    key = key.replace("to_out.0", "to_out_0")
    key = _INDEXED.sub(lambda m: f"_{m.group(1)}", key)
    parts = key.split(".")[:-1]
    if parts and parts[-1] in _VAE_ATTN_RENAMES:
        parts[-1] = _VAE_ATTN_RENAMES[parts[-1]]
    if parts[0] in ("encoder", "decoder") and len(parts) > 2:
        # encoder.down_blocks_0.resnets_0.norm1 -> encoder/"down_blocks_0_resnets_0"/norm1
        scope, middle, inner = parts[0], parts[1:-1], parts[-1]
        return (scope, "_".join(middle), inner)
    return tuple(parts)


def vae_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    flat = {}
    for key, value in sd.items():
        path = _vae_key_to_path(key)
        leaf, v = _torch_leaf_to_flax(key, value)
        if leaf == "kernel" and v.ndim == 2 and "attentions" in ".".join(path):
            pass  # linear in VAE attention, already transposed
        flat[path + (leaf,)] = v
    return {"params": _nest(flat)}


def _vae_middle_to_torch(mid: str) -> str:
    """'down_blocks_0_resnets_0' -> 'down_blocks.0.resnets.0';
    'mid_block_attentions_0' -> 'mid_block.attentions.0'."""
    for two_word in ("down_blocks_", "up_blocks_", "mid_block_"):
        if mid.startswith(two_word):
            return two_word[:-1] + "." + mid[len(two_word):].replace("_", ".")
    return mid.replace("_", ".")


def vae_flax_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = _flatten(params.get("params", params))
    out = {}
    for path, value in flat.items():
        leaf = path[-1]
        parts = list(path[:-1])
        if parts[0] in ("encoder", "decoder") and len(parts) > 2:
            parts = [parts[0]] + _vae_middle_to_torch(parts[1]).split(".") + parts[2:]
        name = ".".join(parts)
        name = re.sub(r"_(\d+)(?=\.|$)", r".\1", name)
        torch_leaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
        out[f"{name}.{torch_leaf}"] = _flax_leaf_to_torch(leaf, value)
    return out


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


def clip_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    flat = {}
    for key, value in sd.items():
        if key == "text_model.embeddings.position_ids" or key.endswith("position_ids"):
            continue
        k = key
        for prefix in ("text_model.", "embeddings.", "encoder.", "text_projection."):
            k = k.replace(prefix, "")
        if k == "token_embedding.weight":
            flat[("token_embedding",)] = value
            continue
        if k == "position_embedding.weight":
            flat[("position_embedding",)] = value
            continue
        k = k.replace("self_attn.", "").replace("mlp.", "")
        k = _INDEXED.sub(lambda m: f"_{m.group(1)}", k)
        parts = k.split(".")
        leaf, v = _torch_leaf_to_flax(key, value)
        flat[tuple(parts[:-1]) + (leaf,)] = v
    return {"params": _nest(flat)}


def clip_flax_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = _flatten(params.get("params", params))
    out = {}
    for path, value in flat.items():
        if path == ("token_embedding",):
            out["text_model.embeddings.token_embedding.weight"] = value
            continue
        if path == ("position_embedding",):
            out["text_model.embeddings.position_embedding.weight"] = value
            continue
        leaf = path[-1]
        parts = list(path[:-1])
        name = ".".join(parts)
        name = re.sub(r"_(\d+)(?=\.|$)", r".\1", name)
        if name.startswith("layers."):
            mod = name.split(".")[-1]
            if mod in ("q_proj", "k_proj", "v_proj", "out_proj"):
                name = name.replace(mod, f"self_attn.{mod}")
            elif mod in ("fc1", "fc2"):
                name = name.replace(mod, f"mlp.{mod}")
            name = "text_model.encoder." + name
        else:
            name = "text_model." + name
        torch_leaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
        out[f"{name}.{torch_leaf}"] = _flax_leaf_to_torch(leaf, value)
    return out


# ---------------------------------------------------------------------------
# Config translation
# ---------------------------------------------------------------------------


def _load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def unet_config_from_json(cfg: dict) -> UNetConfig:
    return UNetConfig(
        sample_size=cfg.get("sample_size", 64),
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        down_block_types=tuple(cfg.get("down_block_types", UNetConfig().down_block_types)),
        up_block_types=tuple(cfg.get("up_block_types", UNetConfig().up_block_types)),
        attention_head_dim=cfg.get("attention_head_dim", 8),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        freq_shift=cfg.get("freq_shift", 0),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
    )


def unet_config_to_json(cfg: UNetConfig) -> dict:
    return {
        "_class_name": "UNet2DConditionModel",
        "_diffusers_version": "0.27.0",
        "act_fn": "silu",
        "attention_head_dim": cfg.attention_head_dim,
        "block_out_channels": list(cfg.block_out_channels),
        "center_input_sample": False,
        "cross_attention_dim": cfg.cross_attention_dim,
        "down_block_types": list(cfg.down_block_types),
        "downsample_padding": 1,
        "flip_sin_to_cos": cfg.flip_sin_to_cos,
        "freq_shift": cfg.freq_shift,
        "in_channels": cfg.in_channels,
        "layers_per_block": cfg.layers_per_block,
        "mid_block_scale_factor": 1,
        "norm_eps": 1e-05,
        "norm_num_groups": 32,
        "out_channels": cfg.out_channels,
        "sample_size": cfg.sample_size,
        "up_block_types": list(cfg.up_block_types),
    }


def vae_config_from_json(cfg: dict) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def vae_config_to_json(cfg: VAEConfig) -> dict:
    n = len(cfg.block_out_channels)
    return {
        "_class_name": "AutoencoderKL",
        "_diffusers_version": "0.27.0",
        "act_fn": "silu",
        "block_out_channels": list(cfg.block_out_channels),
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "in_channels": cfg.in_channels,
        "latent_channels": cfg.latent_channels,
        "layers_per_block": cfg.layers_per_block,
        "norm_num_groups": 32,
        "out_channels": cfg.out_channels,
        "sample_size": 512,
        "scaling_factor": cfg.scaling_factor,
        "up_block_types": ["UpDecoderBlock2D"] * n,
    }


def clip_config_from_json(cfg: dict) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 768),
        intermediate_size=cfg.get("intermediate_size", 3072),
        num_hidden_layers=cfg.get("num_hidden_layers", 12),
        num_attention_heads=cfg.get("num_attention_heads", 12),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
    )


def clip_config_to_json(cfg: CLIPTextConfig) -> dict:
    return {
        "architectures": ["CLIPTextModel"],
        "model_type": "clip_text_model",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "max_position_embeddings": cfg.max_position_embeddings,
        "layer_norm_eps": cfg.layer_norm_eps,
        "hidden_act": cfg.hidden_act,
        "projection_dim": cfg.hidden_size,
        "torch_dtype": "float32",
    }


# ---------------------------------------------------------------------------
# Pipeline-level load/save
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PipelineBundle:
    """Everything a StableDiffusionPipeline directory provides, flax-side."""

    unet_config: UNetConfig
    unet_params: Dict[str, Any]
    vae_config: VAEConfig
    vae_params: Dict[str, Any]
    text_config: CLIPTextConfig
    text_params: Dict[str, Any]
    tokenizer_dir: str
    scheduler_config: dict


def load_unet(model_dir: str, subfolder: str = "unet"):
    d = os.path.join(model_dir, subfolder)
    cfg = unet_config_from_json(_load_json(os.path.join(d, "config.json")))
    sd = _read_tensor_file(os.path.join(d, "diffusion_pytorch_model"))
    return cfg, unet_torch_to_flax(sd)


def load_vae(model_dir: str, subfolder: str = "vae"):
    d = os.path.join(model_dir, subfolder)
    cfg = vae_config_from_json(_load_json(os.path.join(d, "config.json")))
    sd = _read_tensor_file(os.path.join(d, "diffusion_pytorch_model"))
    return cfg, vae_torch_to_flax(sd)


def load_text_encoder(model_dir: str, subfolder: str = "text_encoder"):
    d = os.path.join(model_dir, subfolder)
    cfg = clip_config_from_json(_load_json(os.path.join(d, "config.json")))
    sd = _read_tensor_file(os.path.join(d, "model"))
    return cfg, clip_torch_to_flax(sd)


def load_pipeline(model_dir: str) -> PipelineBundle:
    unet_cfg, unet_params = load_unet(model_dir)
    vae_cfg, vae_params = load_vae(model_dir)
    text_cfg, text_params = load_text_encoder(model_dir)
    sched_path = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    sched_cfg = _load_json(sched_path) if os.path.exists(sched_path) else {}
    return PipelineBundle(
        unet_config=unet_cfg,
        unet_params=unet_params,
        vae_config=vae_cfg,
        vae_params=vae_params,
        text_config=text_cfg,
        text_params=text_params,
        tokenizer_dir=os.path.join(model_dir, "tokenizer"),
        scheduler_config=sched_cfg,
    )


def _default_scheduler_config() -> dict:
    # SD-1.x PNDM config with the variance normalization applied by the
    # reference on export (finetune_sd_token.py:174-185).
    return {
        "_class_name": "PNDMScheduler",
        "beta_end": 0.012,
        "beta_schedule": "scaled_linear",
        "beta_start": 0.00085,
        "num_train_timesteps": 1000,
        "set_alpha_to_one": False,
        "skip_prk_steps": True,
        "steps_offset": 1,
        "prediction_type": "epsilon",
    }


def save_pipeline(
    out_dir: str,
    unet_config: UNetConfig,
    unet_params: Dict[str, Any],
    vae_config: VAEConfig = None,
    vae_params: Dict[str, Any] = None,
    text_config: CLIPTextConfig = None,
    text_params: Dict[str, Any] = None,
    tokenizer_dir: str = None,
    scheduler_config: dict = None,
) -> None:
    """Write a diffusers-layout pipeline directory loadable by torch diffusers."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(sub, cfg_json, tensors, fname):
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(cfg_json, f, indent=2)
        _write_safetensors(os.path.join(d, fname), tensors)

    dump("unet", unet_config_to_json(unet_config), unet_flax_to_torch(unet_params),
         "diffusion_pytorch_model.safetensors")
    if vae_params is not None:
        dump("vae", vae_config_to_json(vae_config), vae_flax_to_torch(vae_params),
             "diffusion_pytorch_model.safetensors")
    if text_params is not None:
        dump("text_encoder", clip_config_to_json(text_config),
             clip_flax_to_torch(text_params), "model.safetensors")
    if tokenizer_dir and os.path.isdir(tokenizer_dir):
        import shutil

        dst = os.path.join(out_dir, "tokenizer")
        if os.path.abspath(tokenizer_dir) != os.path.abspath(dst):
            shutil.copytree(tokenizer_dir, dst, dirs_exist_ok=True)
    sched_dir = os.path.join(out_dir, "scheduler")
    os.makedirs(sched_dir, exist_ok=True)
    sc = dict(scheduler_config or _default_scheduler_config())
    # Variance normalization on export (finetune_sd_token.py:177-185).
    if sc.get("variance_type") in ("learned", "learned_range"):
        sc["variance_type"] = "fixed_small"
    with open(os.path.join(sched_dir, "scheduler_config.json"), "w") as f:
        json.dump(sc, f, indent=2)
    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump(
            {
                "_class_name": "StableDiffusionPipeline",
                "_diffusers_version": "0.27.0",
                "scheduler": ["diffusers", sc.get("_class_name", "PNDMScheduler")],
                "text_encoder": ["transformers", "CLIPTextModel"],
                "tokenizer": ["transformers", "CLIPTokenizer"],
                "unet": ["diffusers", "UNet2DConditionModel"],
                "vae": ["diffusers", "AutoencoderKL"],
                "safety_checker": [None, None],
                "feature_extractor": [None, None],
            },
            f,
            indent=2,
        )
