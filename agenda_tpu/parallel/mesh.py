"""Device mesh + sharding helpers (the distributed runtime, TPU-style).

Replaces the reference's entire L1 distributed stack — HF ``accelerate``
DDP over NCCL (``data_generation/finetune_sd.py:450-455, 659-661``) — with
``jax.sharding``: a (dp, fsdp) mesh whose collectives XLA inserts from
sharding annotations and routes over ICI. There is no hand-written comm
layer; gradient all-reduce is implicit in the pjit-compiled train step
(the ``accelerator.backward`` all-reduce at ``finetune_sd.py:822``), and the
loss all-gather for logging (``finetune_sd.py:818``) is a ``jnp.mean`` of the
already-replicated scalar.

Mesh axes:
- ``dp``:   batch data parallelism (the only parallelism the reference uses);
- ``fsdp``: optional parameter/optimizer-state sharding along the biggest
  axis of each weight (ZeRO-ish; the reference only gates this behind an
  unused DeepSpeed path, ``finetune_sd.py:491-510``).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices (DCN between, ICI within).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, fsdp: int = 1, devices=None) -> Mesh:
    """(dp, fsdp) mesh. dp=-1 consumes all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % fsdp == 0, (n, fsdp)
        dp = n // fsdp
    assert dp * fsdp == n, f"mesh {dp}x{fsdp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, ("dp", "fsdp"))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Host batch -> device arrays sharded along dp (replicated over fsdp)."""
    def put(x):
        spec = P("dp") if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def param_sharding_rules(tree: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """FSDP-style sharding specs: shard each large tensor's largest divisible
    axis over ``fsdp``; small tensors replicate. Returns a tree of
    NamedSharding matching ``tree``'s structure."""
    axis = mesh.shape["fsdp"]

    def rule(x):
        shape = getattr(x, "shape", ())
        if axis == 1 or np.prod(shape, initial=1) < min_size:
            return NamedSharding(mesh, P())
        # pick the largest dim divisible by the fsdp axis
        cands = [(d, i) for i, d in enumerate(shape) if d % axis == 0]
        if not cands:
            return NamedSharding(mesh, P())
        _, i = max(cands)
        spec = [None] * len(shape)
        spec[i] = "fsdp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(rule, tree)


def shard_params_fsdp(tree: Any, mesh: Mesh) -> Any:
    """Place params according to param_sharding_rules."""
    rules = param_sharding_rules(tree, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, rules)
