"""torchvision ResNet-50 checkpoint import for the flax classifier.

The reference initializes the label-refinement classifier from torchvision's
ImageNet-pretrained resnet50 (``data_annotation/refine_label.py:326``). In a
zero-egress deployment the user supplies the ``.pth``/``.safetensors`` file;
this module maps it onto agenda_tpu.models.resnet.ResNet50's
(params, batch_stats) trees. The fc head is skipped when its output width
differs (the refiner replaces it with a 1-logit head anyway).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _split_key(key: str):
    """torchvision key -> (flax module path tuple, leaf)."""
    parts = key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    out = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m.startswith("layer") and i + 1 < len(mods) and mods[i + 1].isdigit():
            block = f"{m}_{mods[i + 1]}"
            i += 2
            out.append(block)
            continue
        if m == "downsample" and i + 1 < len(mods):
            out.append(f"downsample_{mods[i + 1]}")
            i += 2
            continue
        out.append(m)
        i += 1
    return tuple(out), leaf


def torchvision_resnet50_to_flax(
    state_dict: Dict[str, np.ndarray],
    num_classes: int = 1,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """-> (params, batch_stats) trees for models.resnet.ResNet50."""
    params: Dict[tuple, np.ndarray] = {}
    batch_stats: Dict[tuple, np.ndarray] = {}
    for key, v in state_dict.items():
        v = np.asarray(v, np.float32)
        if key.endswith("num_batches_tracked"):
            continue
        path, leaf = _split_key(key)
        is_bn = any(p.startswith("bn") or p == "downsample_1" for p in path)
        if leaf == "weight":
            if is_bn:
                params[path + ("scale",)] = v
            elif v.ndim == 4:  # conv OIHW -> HWIO
                params[path + ("kernel",)] = v.transpose(2, 3, 1, 0)
            else:  # fc
                if path == ("fc",) and v.shape[0] != num_classes:
                    continue
                params[path + ("kernel",)] = v.transpose(1, 0)
        elif leaf == "bias":
            if path == ("fc",) and v.shape[0] != num_classes:
                continue
            params[path + ("bias",)] = v
        elif leaf == "running_mean":
            batch_stats[path + ("mean",)] = v
        elif leaf == "running_var":
            batch_stats[path + ("var",)] = v
        else:
            raise ValueError(f"Unhandled key {key}")

    def nest(flat):
        tree: Dict[str, Any] = {}
        for path, value in flat.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = value
        return tree

    return nest(params), nest(batch_stats)


def load_torchvision_resnet50(path: str, num_classes: int = 1):
    """Read a .pth / .safetensors torchvision checkpoint from disk."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        sd = {}
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    else:
        import torch

        sd = {
            k: v.float().numpy()
            for k, v in torch.load(path, map_location="cpu", weights_only=True).items()
        }
    return torchvision_resnet50_to_flax(sd, num_classes)
