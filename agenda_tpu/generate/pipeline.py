"""Batched text-to-image sampling with fused DAAM heatmaps (the flagship path).

Functional equivalent of the reference's generation entry point
(``data_generation/data_generation.py``): a diffusers
``StableDiffusionPipeline`` run under a ``daam.trace`` hook that intercepts
every cross-attention call. TPU-first redesign:

- the whole 20-step denoise loop is ONE compiled program: ``lax.scan`` over
  the PLMS/DDIM timestep table, UNet + CFG inside, no host round-trips;
- DAAM heatmaps are accumulated *inside the scan* from the attention side
  outputs (kernels/attention.py) as a running mean over layers and steps,
  bicubic-resized to latent_hw and clamped at 0 — the
  ``hook.py:59-81`` ``compute_global_heat_map`` semantics, fused;
- the unconditional CFG half is dropped from the heatmaps exactly as the
  reference does in eval mode (``hook.py:48-49``);
- seeds map to ``jax.random.key(seed)`` folds; the reference's per-image
  python loop becomes a batch axis that shards over a device mesh.

Note on bicubic: jax.image 'cubic' uses the Keys kernel with a=-0.5 vs
torch's a=-0.75; averaged over ~320 layer-step maps the difference is
negligible for the heatmap-derived boxes (validated distributionally, see
SURVEY.md §7 "randomness parity").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agenda_tpu.core.schedules import (
    DiffusionSchedule,
    ddim_timesteps,
    ddim_step,
    make_schedule,
    plms_init_state,
    plms_step,
    plms_timesteps,
)
from agenda_tpu.data.tokenizer import CLIPTokenizer
from agenda_tpu.data.tokens import compute_token_merge_indices
from agenda_tpu.io.diffusers_io import PipelineBundle, load_pipeline
from agenda_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel


def resize_bicubic(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bicubic resize of the trailing two spatial dims."""
    shape = x.shape[:-2] + (h, w)
    return jax.image.resize(x, shape, method="cubic")


@dataclasses.dataclass
class StableDiffusionPipeline:
    """SD txt2img with optional fused per-token heatmap output."""

    unet: UNet2DConditionModel
    unet_params: Dict
    vae: AutoencoderKL
    vae_params: Dict
    text_encoder: CLIPTextModel
    text_params: Dict
    tokenizer: CLIPTokenizer
    schedule: DiffusionSchedule
    scheduler_type: str = "pndm"  # SD-1.x pipeline default
    latent_hw: int = 64  # heatmap aggregation resolution (hook.py:17-19)
    dtype: jnp.dtype = jnp.bfloat16
    mesh: object = None  # jax.sharding.Mesh: shard the seed batch over "dp"

    @classmethod
    def from_pretrained(
        cls, model_dir: str, dtype: jnp.dtype = jnp.bfloat16
    ) -> "StableDiffusionPipeline":
        bundle: PipelineBundle = load_pipeline(model_dir)
        sc = bundle.scheduler_config or {}
        schedule = make_schedule(
            num_train_timesteps=sc.get("num_train_timesteps", 1000),
            beta_start=sc.get("beta_start", 0.00085),
            beta_end=sc.get("beta_end", 0.012),
            beta_schedule=sc.get("beta_schedule", "scaled_linear"),
            prediction_type=sc.get("prediction_type", "epsilon"),
            steps_offset=sc.get("steps_offset", 1),
        )
        name = sc.get("_class_name", "PNDMScheduler").lower()
        scheduler_type = "ddim" if "ddim" in name else "pndm"
        return cls(
            unet=UNet2DConditionModel(bundle.unet_config, dtype=dtype),
            unet_params=bundle.unet_params,
            vae=AutoencoderKL(bundle.vae_config, dtype=dtype),
            vae_params=bundle.vae_params,
            text_encoder=CLIPTextModel(bundle.text_config, dtype=dtype),
            text_params=bundle.text_params,
            tokenizer=CLIPTokenizer.from_pretrained(bundle.tokenizer_dir),
            schedule=schedule,
            scheduler_type=scheduler_type,
            latent_hw=bundle.unet_config.sample_size,
            dtype=dtype,
        )

    # -- learnable tokens ---------------------------------------------------

    def add_learned_tokens(self, embeds: Dict[str, np.ndarray]) -> List[int]:
        """Add learned tokens and write their embeddings into the text encoder.

        Reference: data_generation/data_generation.py:47-52 (add_tokens,
        resize_token_embeddings, write rows into the embedding matrix).
        Returns the new token ids.
        """
        tokens = list(embeds.keys())
        self.tokenizer.add_tokens(tokens)
        ids = self.tokenizer.convert_tokens_to_ids(tokens)
        table = np.asarray(self.text_params["params"]["token_embedding"])
        need = max(ids) + 1
        if need > table.shape[0]:
            pad = np.zeros((need - table.shape[0], table.shape[1]), table.dtype)
            table = np.concatenate([table, pad], axis=0)
        for tok, i in zip(tokens, ids):
            table[i] = np.asarray(embeds[tok], dtype=table.dtype)
        new_params = jax.tree.map(lambda x: x, self.text_params)  # shallow copy tree
        new_params["params"] = dict(new_params["params"])
        new_params["params"]["token_embedding"] = jnp.asarray(table)
        self.text_params = new_params
        if table.shape[0] != self.text_encoder.config.vocab_size:
            # resize_token_embeddings equivalent: grow the model config too.
            self.text_encoder = CLIPTextModel(
                dataclasses.replace(self.text_encoder.config, vocab_size=table.shape[0]),
                dtype=self.text_encoder.dtype,
            )
        return list(ids)

    @property
    def vae_scale_factor(self) -> int:
        return 2 ** (len(self.vae.config.block_out_channels) - 1)

    # -- text ---------------------------------------------------------------

    @functools.cached_property
    def _encode_fn(self):
        # jitted: un-jitted apply would dispatch every CLIP op as its own
        # (remote) execution — hundreds of RPC roundtrips per call on a
        # tunneled TPU backend.
        return jax.jit(lambda params, ids: self.text_encoder.apply(params, ids)[0])

    def encode_prompts(self, prompts: Sequence[str]) -> jax.Array:
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        return self._encode_fn(self.text_params, ids)

    @functools.cached_property
    def _latents_fn(self):
        # One jitted program for the whole seed batch (vs one eager
        # normal-dispatch per seed). vmapped jax.random.key(seed) produces
        # bit-identical draws to the per-seed eager path for seeds in
        # [0, 2^32) (the caller wraps others mod 2^32).
        def f(seeds, lh, lw):
            keys = jax.vmap(jax.random.key)(seeds)
            return jax.vmap(
                lambda k: jax.random.normal(k, (lh, lw, 4), jnp.float32)
            )(keys)

        return jax.jit(f, static_argnums=(1, 2))

    # -- core compiled sampler ---------------------------------------------

    @functools.cached_property
    def _sample_fn(self):
        unet, vae = self.unet, self.vae
        schedule = self.schedule
        latent_hw = self.latent_hw
        scaling = vae.config.scaling_factor

        def sample(
            unet_params,
            vae_params,
            context,  # (2B, 77, C): [uncond; cond]
            latents0,  # (B, h, w, 4)
            timesteps,  # (T,) int32
            guidance_scale,  # scalar f32
            word_index_ids,  # (W, K) int32 token positions per word (or None)
            word_index_mask,  # (W, K) f32 validity (or None)
            collect_heatmaps: bool,
            scheduler_type: str,
            num_inference_steps: int,
            out_size: int,  # 0 = native resolution
            tgate_step: int = 0,  # 0 = exact sampling; m>0 = TGATE gate step
        ):
            b = latents0.shape[0]
            n_tokens = context.shape[1]

            def heat_from_maps(maps):
                acc = jnp.zeros((b, n_tokens, latent_hw, latent_hw), jnp.float32)
                for m in maps:
                    cond = m[b:]  # drop unconditional half (hook.py:48-49)
                    r = resize_bicubic(cond, latent_hw, latent_hw)
                    acc = acc + jnp.maximum(r, 0.0)
                return acc, jnp.float32(len(maps))

            def unet_cfg(latents, t):
                lat2 = jnp.concatenate([latents, latents], axis=0)
                eps, maps = unet.apply(
                    unet_params,
                    lat2,
                    jnp.broadcast_to(t, (2 * b,)),
                    context,
                    collect_attn=collect_heatmaps,
                )
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                heat = heat_from_maps(maps) if collect_heatmaps else None
                return eps, heat

            heat_sum0 = jnp.zeros((b, n_tokens, latent_hw, latent_hw), jnp.float32)
            heat_cnt0 = jnp.float32(0.0)

            # TGATE (opt-in, arXiv:2404.02747 — PAPERS.md item 2): after the
            # gate step the per-layer cross-attention output contributions are
            # frozen and replayed; since the two CFG halves share x_t and
            # differ ONLY through cross-attention, the post-gate UNet runs at
            # batch B instead of 2B (eps_u == eps_c, guidance is a no-op).
            # This APPROXIMATES the exact sampler (never the default) and
            # freezes the DAAM heatmap contribution at the gate step for the
            # remaining steps.
            use_tgate = 0 < tgate_step < num_inference_steps
            mgate = tgate_step

            def gate_call(latents, t):
                """2B forward capturing the cross-attn cache (+ CFG eps)."""
                lat2 = jnp.concatenate([latents, latents], axis=0)
                eps, maps, cross = unet.apply(
                    unet_params,
                    lat2,
                    jnp.broadcast_to(t, (2 * b,)),
                    context,
                    collect_attn=collect_heatmaps,
                    collect_cross=True,
                )
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                # Cache = mean of the two CFG halves' contributions (TGATE).
                cross_avg = [0.5 * (c[:b] + c[b:]) for c in cross]
                heat = heat_from_maps(maps) if collect_heatmaps else None
                return eps, cross_avg, heat

            context_cond = context[b:]

            def unet_gated(latents, t, cross_avg):
                eps, _ = unet.apply(
                    unet_params,
                    latents,
                    jnp.broadcast_to(t, (b,)),
                    context_cond,
                    cached_cross=cross_avg,
                )
                return eps

            if scheduler_type == "pndm":
                state0 = plms_init_state(latents0.shape)

                def body(carry, t):
                    state, lat, hsum, hcnt = carry
                    eps, heat = unet_cfg(lat, t)
                    state, lat = plms_step(schedule, state, eps, lat, t, num_inference_steps)
                    if heat is not None:
                        hsum = hsum + heat[0]
                        hcnt = hcnt + heat[1]
                    return (state, lat, hsum, hcnt), ()

                if not use_tgate:
                    (_, latents, hsum, hcnt), _ = jax.lax.scan(
                        body, (state0, latents0, heat_sum0, heat_cnt0), timesteps
                    )
                else:
                    (state, lat, hsum, hcnt), _ = jax.lax.scan(
                        body, (state0, latents0, heat_sum0, heat_cnt0),
                        timesteps[:mgate],
                    )
                    eps, cross_avg, heat = gate_call(lat, timesteps[mgate])
                    state, lat = plms_step(
                        schedule, state, eps, lat, timesteps[mgate], num_inference_steps
                    )
                    # Gate + replayed UNet evals. Counted from the timestep
                    # table, NOT num_inference_steps: plms_timesteps has T+1
                    # entries (duplicated bootstrap step), so T-mgate would
                    # underweight the gate contribution by one eval.
                    n_rest = timesteps.shape[0] - mgate
                    if heat is not None:
                        hsum = hsum + heat[0] * n_rest
                        hcnt = hcnt + heat[1] * n_rest

                    def body2(carry, t):
                        state, lat = carry
                        eps = unet_gated(lat, t, cross_avg)
                        state, lat = plms_step(
                            schedule, state, eps, lat, t, num_inference_steps
                        )
                        return (state, lat), ()

                    (_, latents), _ = jax.lax.scan(
                        body2, (state, lat), timesteps[mgate + 1:]
                    )
            elif scheduler_type == "ddim":
                step_ratio = schedule.num_train_timesteps // num_inference_steps

                def body(carry, t):
                    lat, hsum, hcnt = carry
                    eps, heat = unet_cfg(lat, t)
                    lat = ddim_step(schedule, eps, t, t - step_ratio, lat)
                    if heat is not None:
                        hsum = hsum + heat[0]
                        hcnt = hcnt + heat[1]
                    return (lat, hsum, hcnt), ()

                if not use_tgate:
                    (latents, hsum, hcnt), _ = jax.lax.scan(
                        body, (latents0, heat_sum0, heat_cnt0), timesteps
                    )
                else:
                    (lat, hsum, hcnt), _ = jax.lax.scan(
                        body, (latents0, heat_sum0, heat_cnt0), timesteps[:mgate]
                    )
                    eps, cross_avg, heat = gate_call(lat, timesteps[mgate])
                    lat = ddim_step(
                        schedule, eps, timesteps[mgate],
                        timesteps[mgate] - step_ratio, lat,
                    )
                    n_rest = timesteps.shape[0] - mgate  # gate + replayed evals
                    if heat is not None:
                        hsum = hsum + heat[0] * n_rest
                        hcnt = hcnt + heat[1] * n_rest

                    def body2(lat, t):
                        eps = unet_gated(lat, t, cross_avg)
                        return ddim_step(schedule, eps, t, t - step_ratio, lat), ()

                    latents, _ = jax.lax.scan(body2, lat, timesteps[mgate + 1:])
            else:
                raise ValueError(f"Unknown scheduler {scheduler_type}")

            images = vae.apply(vae_params, latents / scaling, method="decode")
            images = jnp.clip(images / 2.0 + 0.5, 0.0, 1.0)
            if out_size:
                # Downscale on device (bicubic a=-0.5, PIL-equivalent kernel):
                # the reference resizes 512 -> 112 on host right after
                # generation (data_generation.py:60); doing it here shrinks
                # the device->host image transfer ~20x.
                images = jnp.clip(
                    resize_bicubic(
                        jnp.transpose(images, (0, 3, 1, 2)), out_size, out_size
                    ),
                    0.0,
                    1.0,
                )
                images = jnp.transpose(images, (0, 2, 3, 1))
            # uint8 on device: 4x less device->host traffic (and identical to
            # the host-side PIL conversion the reference performs).
            images_u8 = jnp.round(images * 255.0).astype(jnp.uint8)

            heatmaps = hsum / jnp.maximum(hcnt, 1.0)  # global mean (hook.py:79)

            if word_index_ids is not None:
                # Per-word heatmaps fully on device: mean over the word's token
                # positions (daam compute_word_heat_map), min-max normalize,
                # 0-255 uint8 (data_generation.py:74-84). Transfers shrink from
                # (B,77,64,64) f32 to (B,W,64,64) u8.
                sel = jnp.take(heatmaps, word_index_ids.reshape(-1), axis=1)
                sel = sel.reshape(b, *word_index_ids.shape, latent_hw, latent_hw)
                msum = jnp.maximum(jnp.sum(word_index_mask, axis=-1), 1.0)
                wmaps = (
                    jnp.sum(sel * word_index_mask[None, :, :, None, None], axis=2)
                    / msum[None, :, None, None]
                )  # (B, W, hw, hw)
                mn = jnp.min(wmaps, axis=(2, 3), keepdims=True)
                mx = jnp.max(wmaps, axis=(2, 3), keepdims=True)
                wmaps = (wmaps - mn) / (mx - mn + 1e-8) * 255.0
                word_heatmaps_u8 = wmaps.astype(jnp.uint8)
            else:
                word_heatmaps_u8 = None

            return images_u8, heatmaps, word_heatmaps_u8

        return jax.jit(
            sample,
            static_argnames=(
                "collect_heatmaps", "scheduler_type", "num_inference_steps", "out_size",
                "tgate_step",
            ),
        )

    # -- public API ---------------------------------------------------------

    def timestep_table(self, num_inference_steps: int) -> np.ndarray:
        if self.scheduler_type == "pndm":
            return plms_timesteps(self.schedule, num_inference_steps)
        return ddim_timesteps(self.schedule, num_inference_steps)

    def __call__(
        self,
        prompt: str,
        seeds: Sequence[int],
        num_inference_steps: int = 20,
        guidance_scale: float = 7.5,
        collect_heatmaps: bool = False,
        negative_prompt: str = "",
        height: int = 512,
        width: int = 512,
        words: Optional[Sequence[str]] = None,
        out_size: int = 0,
        tgate_step: int = 0,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Generate len(seeds) images for one prompt. ``out_size`` resizes the
        decoded images on device before transfer (0 = keep native resolution).

        Returns (images uint8 (B, H, W, 3),
                 heatmaps f32 (B, 77, latent_hw, latent_hw) or None).

        With ``words`` given (implies collect), the second return is instead a
        dict {word: uint8 (B, latent_hw, latent_hw)} of min-max-normalized
        per-word heatmaps, fully computed on device (minimal host transfer).

        ``tgate_step=m`` (0 < m < num_inference_steps) enables TGATE
        (arXiv:2404.02747): cross-attention outputs are frozen at step m and
        the remaining steps run CFG-collapsed at half batch — faster,
        APPROXIMATE sampling (off by default; changes images and heatmaps).
        """
        return self.generate_async(
            prompt,
            seeds,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            collect_heatmaps=collect_heatmaps,
            negative_prompt=negative_prompt,
            height=height,
            width=width,
            words=words,
            out_size=out_size,
            tgate_step=tgate_step,
        )()

    def generate_async(
        self,
        prompt: str,
        seeds: Sequence[int],
        num_inference_steps: int = 20,
        guidance_scale: float = 7.5,
        collect_heatmaps: bool = False,
        negative_prompt: str = "",
        height: int = 512,
        width: int = 512,
        words: Optional[Sequence[str]] = None,
        out_size: int = 0,
        tgate_step: int = 0,
    ):
        """Dispatch one batch without blocking; call the returned thunk for
        the ``__call__`` result.

        JAX dispatch is asynchronous: the sampler starts on device as soon as
        this returns, so a caller can overlap host work (PNG encode/write) for
        batch i with device compute for batch i+1 — the production shape of
        the 10k-image generation loop (reference: strictly serial batch-1
        python loop, ``data_generation/data_generation.py:56``).
        """
        b = len(seeds)
        word_ids = word_mask = None
        if words:
            collect_heatmaps = True
            idx_lists = [compute_token_merge_indices(self.tokenizer, prompt, w)[0]
                         for w in words]
            k = max(len(x) for x in idx_lists)
            word_ids = np.zeros((len(words), k), np.int32)
            word_mask = np.zeros((len(words), k), np.float32)
            for i, xs in enumerate(idx_lists):
                word_ids[i, : len(xs)] = xs
                word_mask[i, : len(xs)] = 1.0
            word_ids = jnp.asarray(word_ids)
            word_mask = jnp.asarray(word_mask)
        # Single text-encoder call for [uncond; cond] (one device program).
        context = self.encode_prompts([negative_prompt] * b + [prompt] * b)

        f = self.vae_scale_factor
        lh, lw = height // f, width // f
        latents0 = self._latents_fn(
            # Seeds are taken mod 2^32 (the vmapped jax.random.key path wants
            # one uint32 word). Negative / >=2^32 seeds would otherwise crash
            # numpy's uint32 cast; the wrap is explicit and documented — the
            # CLI only ever produces seeds in [0, num_images + start_seed).
            jnp.asarray([int(s) & 0xFFFFFFFF for s in seeds], jnp.uint32), lh, lw)

        if self.mesh is not None:
            # Shard the seed batch over the dp axis: the jitted sampler then
            # runs SPMD across the mesh, one CFG pair per chip-group (the
            # reference's batch-1 python loop parallelized over ICI).
            from jax.sharding import NamedSharding, PartitionSpec as P

            bsh = NamedSharding(self.mesh, P("dp"))
            latents0 = jax.device_put(latents0, bsh)
            context = jax.device_put(context, bsh)

        ts = jnp.asarray(self.timestep_table(num_inference_steps))
        images, heatmaps, word_maps = self._sample_fn(
            self.unet_params,
            self.vae_params,
            context,
            latents0,
            ts,
            jnp.float32(guidance_scale),
            word_ids,
            word_mask,
            collect_heatmaps,
            self.scheduler_type,
            num_inference_steps,
            out_size,
            tgate_step,
        )
        def materialize():
            if words:
                # one batched transfer (sequential np.asarray pulls pay one
                # tunnel round trip each)
                imgs, wm = jax.device_get((images, word_maps))
                return imgs, {w: wm[:, i] for i, w in enumerate(words)}
            if collect_heatmaps:
                return jax.device_get((images, heatmaps))
            return np.asarray(images), None

        return materialize

    # -- heatmap post-processing -------------------------------------------

    def word_heatmap(
        self,
        heatmaps: np.ndarray,  # (B, 77, latent_hw, latent_hw)
        prompt: str,
        word: str,
    ) -> np.ndarray:
        """Per-word heatmap = mean over the word's token positions.

        daam ``compute_word_heat_map`` semantics as used at
        ``data_generation/data_generation.py:74-77``.
        """
        idxs, _ = compute_token_merge_indices(self.tokenizer, prompt, word)
        return heatmaps[:, idxs].mean(axis=1)


def heatmap_to_uint8(heatmap: np.ndarray, out_size: int) -> np.ndarray:
    """Min-max normalize to 0-255 and resize (data_generation.py:80-86)."""
    from PIL import Image

    h = heatmap.astype(np.float64)
    h = (h - h.min()) / (h.max() - h.min() + 1e-8) * 255
    img = Image.fromarray(h.astype(np.uint8))
    return np.asarray(img.resize((out_size, out_size)))


def images_to_uint8(images: np.ndarray) -> np.ndarray:
    return np.clip(np.round(images * 255.0), 0, 255).astype(np.uint8)
