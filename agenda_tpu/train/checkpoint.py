"""Training checkpoints: diffusers-layout model + orbax train state, with
rotation and resume.

Reference semantics being matched (``data_generation/finetune_sd.py``):
- ``checkpoint-{step}/`` directories under ``output_dir`` (553-590, 842-866);
- the model inside a checkpoint is saved in *diffusers format* (``unet/``
  subdir) via the custom accelerate save hook, so any checkpoint doubles as a
  loadable model (555-564);
- ``checkpoints_total_limit`` rotation deletes oldest first (845-862);
- resume parses the step from the directory name, ``latest`` picks the
  highest (723-748).

The optimizer/EMA/step state rides in an orbax PyTree checkpoint next to the
model weights (atomic writes, async-friendly) — replacing accelerate
``save_state``/``load_state``.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np

from agenda_tpu.io.diffusers_io import unet_flax_to_torch, _write_safetensors, unet_config_to_json


_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def list_checkpoints(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    out = []
    for d in os.listdir(output_dir):
        m = _CKPT_RE.match(d)
        if m:
            out.append((int(m.group(1)), os.path.join(output_dir, d)))
    return sorted(out)


def rotate_checkpoints(output_dir: str, total_limit: Optional[int]) -> None:
    """Keep at most total_limit-1 so the next save lands within the limit
    (finetune_sd.py:845-862 semantics)."""
    if total_limit is None:
        return
    ckpts = list_checkpoints(output_dir)
    if len(ckpts) >= total_limit:
        for _, path in ckpts[: len(ckpts) - total_limit + 1]:
            shutil.rmtree(path)


def _snapshot_state(state, ema_as_unet_ema: bool) -> dict:
    """Device -> host copies of everything a checkpoint writes.

    JAX arrays are immutable, so snapshotting at step N stays valid while the
    training loop races ahead. One batched jax.device_get for the whole
    snapshot: per-leaf np.asarray pays a full RPC round trip per tensor on a
    tunneled backend (measured ~14 ms/leaf — ~10 s for a UNet+opt tree)."""
    return jax.device_get({
        "params": state.params,
        "ema_params": (
            state.ema.params
            if (ema_as_unet_ema and state.ema is not None)
            else None
        ),
        "opt_state": state.opt_state,
        "step": state.step,
        "ema_step": None if state.ema is None else state.ema.step,
    })


def atomic_checkpoint_dir(
    output_dir: str,
    step: int,
    total_limit: Optional[int],
    payload_fn,
) -> str:
    """Write a checkpoint-{step}/ directory atomically.

    Sweeps stale ``.tmp-checkpoint-*`` orphans from crashed runs (they are
    invisible to list_checkpoints/rotation and would leak disk), rotates,
    writes the payload into a tmp dir, and only deletes any pre-existing
    checkpoint-{step} immediately before the rename — a crash mid-write
    leaves the old checkpoint intact, never a partial one.
    """
    if os.path.isdir(output_dir):
        for d in os.listdir(output_dir):
            if d.startswith(".tmp-checkpoint-"):
                shutil.rmtree(os.path.join(output_dir, d), ignore_errors=True)
    rotate_checkpoints(output_dir, total_limit)
    final_path = os.path.join(output_dir, f"checkpoint-{step}")
    path = os.path.join(output_dir, f".tmp-checkpoint-{step}")
    os.makedirs(path)
    payload_fn(path)
    if os.path.exists(final_path):
        shutil.rmtree(final_path)
    os.rename(path, final_path)  # resume never sees a partial checkpoint
    return final_path


def _write_checkpoint(
    output_dir: str,
    step: int,
    unet_config,
    snap: dict,
    total_limit: Optional[int],
) -> str:
    """Pure host-side write from a snapshot; atomic via tmp-dir + rename."""
    return atomic_checkpoint_dir(
        output_dir, step, total_limit,
        lambda path: _write_payload(path, step, unet_config, snap),
    )


def _write_payload(path: str, step: int, unet_config, snap: dict) -> None:
    import json

    import orbax.checkpoint as ocp

    # Model in diffusers format (save-hook semantics, finetune_sd.py:555-564).
    unet_dir = os.path.join(path, "unet")
    os.makedirs(unet_dir, exist_ok=True)
    with open(os.path.join(unet_dir, "config.json"), "w") as f:
        json.dump(unet_config_to_json(unet_config), f, indent=2)
    _write_safetensors(
        os.path.join(unet_dir, "diffusion_pytorch_model.safetensors"),
        unet_flax_to_torch({"params": snap["params"]}),
    )

    if snap["ema_params"] is not None:
        ema_dir = os.path.join(path, "unet_ema")
        os.makedirs(ema_dir, exist_ok=True)
        with open(os.path.join(ema_dir, "config.json"), "w") as f:
            json.dump(unet_config_to_json(unet_config), f, indent=2)
        _write_safetensors(
            os.path.join(ema_dir, "diffusion_pytorch_model.safetensors"),
            unet_flax_to_torch({"params": snap["ema_params"]}),
        )

    # Optimizer / step / EMA-counter state via orbax.
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.abspath(os.path.join(path, "train_state")),
        {
            "opt_state": snap["opt_state"],
            "step": snap["step"],
            "ema_step": snap["ema_step"],
        },
    )


def save_checkpoint(
    output_dir: str,
    step: int,
    unet_config,
    state,
    total_limit: Optional[int] = None,
    ema_as_unet_ema: bool = True,
) -> str:
    """Write checkpoint-{step}/{unet/, unet_ema/, train_state/}. Returns path."""
    snap = _snapshot_state(state, ema_as_unet_ema)
    return _write_checkpoint(output_dir, step, unet_config, snap, total_limit)


class AsyncWriter:
    """One background file-IO job in flight; submit() joins the previous one
    first and ``wait()`` re-raises any writer exception on the caller."""

    def __init__(self):
        self._thread = None
        self._result = None
        self._error = None

    def submit(self, fn, name: str = "ckpt-write") -> None:
        import threading

        self.wait()  # serialize writes; surfaces a prior write's exception
        self._result = None  # wait() always reports the most recent job

        def run():
            try:
                self._result = fn()
            except BaseException as e:  # re-raised from wait()
                self._error = e

        self._thread = threading.Thread(target=run, name=name)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
        return self._result

    # Context manager: guarantees the pending write is joined even when the
    # training loop raises — on clean exit write errors propagate; during
    # exception unwind they are logged so the original error stays visible.
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.wait()
        else:
            try:
                self.wait()
            except Exception:
                import logging

                logging.getLogger(__name__).exception(
                    "pending checkpoint write failed while unwinding another error"
                )
        return False


class AsyncCheckpointer(AsyncWriter):
    """Checkpoint writes off the training thread, one in flight.

    ``save`` snapshots device state to host (cheap: blocks only for the D2H
    copy) and hands the multi-GB safetensors/orbax file IO to a writer
    thread, so the accelerator keeps training through the write — the
    reference's ``accelerator.save_state`` stalls every process for the full
    write (``finetune_sd.py:864-866``). ``wait()`` joins the pending write
    (call before reading the checkpoint back or exiting)."""

    def save(
        self,
        output_dir: str,
        step: int,
        unet_config,
        state,
        total_limit: Optional[int] = None,
        ema_as_unet_ema: bool = True,
    ) -> None:
        snap = _snapshot_state(state, ema_as_unet_ema)
        self.submit(
            lambda: _write_checkpoint(output_dir, step, unet_config, snap, total_limit),
            name=f"ckpt-write-{step}",
        )


def find_resume_checkpoint(output_dir: str, resume_from: str) -> Optional[Tuple[int, str]]:
    """resume_from is a path or 'latest' (finetune_sd.py:723-748)."""
    if resume_from != "latest":
        base = os.path.basename(os.path.normpath(resume_from))
        m = _CKPT_RE.match(base)
        path = resume_from if os.path.isabs(resume_from) else os.path.join(output_dir, base)
        if m and os.path.isdir(path):
            return int(m.group(1)), path
        return None
    ckpts = list_checkpoints(output_dir)
    return ckpts[-1] if ckpts else None


def restore_opt_payload(state_dir: str, abstract: dict, opt_template, params) -> dict:
    """orbax-restore a ``{"opt_state": ..., ...}`` payload with a
    fused<->chained int8-AdamW layout fallback.

    A checkpoint written with the other optimizer layout (pre-fused-kernel
    run, or AGENDA_TPU_NO_FUSED_ADAMW toggled between save and resume)
    carries the same ScaleByAdam8bitState payload in a different tree
    structure; on a structure-mismatch restore failure this retries with the
    alternate layout and grafts the moments (and schedule counters) into the
    active structure. Any other restore error re-raises."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    state_dir = os.path.abspath(state_dir)
    try:
        return ckptr.restore(state_dir, item=abstract)
    except Exception:
        from agenda_tpu.train.optim import (
            ScaleByAdam8bitState,
            extract_adam8bit_state,
            graft_adam8bit_state,
            make_optimizer,
        )

        try:
            extract_adam8bit_state(opt_template)
        except ValueError:
            raise  # active optimizer is not int8-Adam: not a layout issue
        active_is_fused = isinstance(opt_template, ScaleByAdam8bitState)
        alt_tx = make_optimizer(lambda s: 0.0, use_8bit_adam=True,
                                fused=not active_is_fused)
        alt_abstract = dict(abstract)
        alt_abstract["opt_state"] = jax.eval_shape(alt_tx.init, params)
        restored = ckptr.restore(state_dir, item=alt_abstract)
        adam = extract_adam8bit_state(restored["opt_state"])
        restored["opt_state"] = graft_adam8bit_state(opt_template, adam)
        return restored


def load_checkpoint(path: str, state_template) -> Any:
    """Restore a TrainState from checkpoint-{N}/: params from the diffusers
    file, opt/ema state from orbax. state_template provides tree structure."""
    import dataclasses

    import orbax.checkpoint as ocp

    from agenda_tpu.io.diffusers_io import _read_tensor_file, unet_torch_to_flax

    sd = _read_tensor_file(os.path.join(path, "unet", "diffusion_pytorch_model"))
    params = unet_torch_to_flax(sd)["params"]

    abstract = jax.eval_shape(
        lambda: {
            "opt_state": state_template.opt_state,
            "step": state_template.step,
            "ema_step": None if state_template.ema is None else state_template.ema.step,
        }
    )
    restored = restore_opt_payload(
        os.path.join(path, "train_state"), abstract,
        state_template.opt_state, state_template.params,
    )

    ema = state_template.ema
    if ema is not None:
        ema_file = os.path.join(path, "unet_ema", "diffusion_pytorch_model")
        if os.path.exists(ema_file + ".safetensors"):
            ema_params = unet_torch_to_flax(_read_tensor_file(ema_file))["params"]
        else:
            ema_params = params
        ema = dataclasses.replace(ema, params=jax.tree.map(jnp_f32, ema_params), step=restored["ema_step"])

    return dataclasses.replace(
        state_template,
        params=jax.tree.map(jnp_f32, params),
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema=ema,
    )


def jnp_f32(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.float32)
