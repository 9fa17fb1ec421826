"""Detector training/testing runner (the mmengine-Runner equivalent).

Drives any detector family exposing the (model, loss_fn, predict_fn)
interface over a dp mesh:

- epoch-based training with SGD+momentum or AdamW (the reference configs
  use SGD lr 0.2 / 0.02, ``configs/Real_Source/faster-rcnn.py:375-383``),
  linear warmup + MultiStep or cosine decay;
- validation every ``val_interval`` epochs with the COCO-mAP evaluator and
  ``save_best`` checkpointing on bbox_mAP/bbox_mAP_50
  (``faster-rcnn.py:336-342, 392-397``);
- ``test`` produces prediction records (the reference's ``prediction.pkl``
  format) consumed by the annotation stage.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agenda_tpu.annotate.records import save_predictions
from agenda_tpu.detect.coco_eval import coco_map
from agenda_tpu.io.diffusers_io import _flatten, _nest, _write_safetensors, _read_tensor_file
from agenda_tpu.utils.profiling import StepTimer

logger = logging.getLogger("agenda_tpu.detect")


@dataclasses.dataclass
class RunnerConfig:
    output_dir: str = "work_dirs/run"
    max_epochs: int = 100
    batch_size: int = 16  # per device
    lr: float = 0.02
    optimizer: str = "sgd"  # sgd | adamw
    momentum: float = 0.9
    weight_decay: float = 1e-4
    warmup_iters: int = 500
    lr_milestones: Tuple[float, ...] = (0.66, 0.88)  # fractions of max_epochs
    val_interval: int = 5
    save_best: Tuple[str, ...] = ("bbox_mAP", "bbox_mAP_50")
    clip_grad_norm: Optional[float] = 35.0
    ema_decay: float = 0.0  # >0 enables EMA eval/checkpointing (mmyolo EMAHook)
    seed: int = 0
    log_interval: int = 20
    # -- mmyolo YOLOv5OptimizerConstructor + YOLOv5ParamSchedulerHook parity
    # (the yolo configs construct SGD through it with batch_size_per_gpu —
    # Real_Source/yolov5.py:190-191, yolov8.py:197-198): weight decay only on
    # conv/linear kernels (norm scales + all biases exempt), scaled by
    # total_bs*accum/64; nesterov momentum; linear per-epoch lr decay to
    # lr*lr_factor with iter-level warmup (bias group warms from
    # warmup_bias_lr, momentum from warmup_momentum).
    yolo_optimizer: bool = False
    nesterov: bool = False
    lr_factor: float = 0.01          # yolov5 Real_Source: 0.1 (yolov5.py:38)
    warmup_epochs: float = 3.0
    warmup_mim_iter: int = 1000      # "critical" per yolov5.py:207-211
    warmup_bias_lr: float = 0.1
    warmup_momentum: float = 0.8
    base_total_batch_size: int = 64  # mmyolo base_total_batch_size
    # -- mmengine auto_scale_lr (Real_Source/vitdet.py:431): opt-in (the
    # reference never enables it on the CLI); lr *= global_bs/base_batch_size.
    auto_scale_lr: bool = False
    base_batch_size: Optional[int] = None
    # -- mosaic-close pipeline switch (Real_Source/yolov8.py:34,215-216):
    # for the final close_mosaic_epochs the train aug switches to the
    # stage-2 recipe and val cadence becomes val_interval_stage2.
    close_mosaic_epochs: int = 0
    val_interval_stage2: Optional[int] = None
    # -- device-side augmentation (detect/device_aug.py): dataset tensor in
    # HBM, host builds plans (random draws + exact box math), the chip
    # renders mosaic/affine/mixup/hsv/flip inside the train step. Concat
    # datasets route through ConcatAugPlanner; the fallback to the host
    # pipeline remains only for the LSJ recipe and cache-disabled datasets.
    device_aug: bool = False
    # -- parallel plan building (device_aug only): worker processes pre-build
    # FUTURE epochs' plan batches (epoch rng streams are independent by
    # construction — see device_aug.PlanPrefetcher). 0 = serial in-process.
    # Plans are bit-identical either way (test-locked); this only raises the
    # single-core ~1800 img/s plan-feed ceiling on multi-core hosts.
    device_aug_workers: int = 0
    # -- mmdet LayerDecayOptimizerConstructor (every reference vitdet stage:
    # Real_Source/vitdet.py:327-341, Synthetic_Heatmap/001_lsj...py:142-155,
    # Synthetic_Target/vitdet.py:319-333 — decay_rate 0.7, layer_wise, 12
    # layers). scale = rate^(L+1-layer_id); layer_id 0 for patch/pos embed,
    # i+1 for backbone block i, L+1 elsewhere. Weight decay is skipped for
    # 1-d params and biases (the constructor's no_decay group).
    layer_decay_rate: Optional[float] = None
    layer_decay_layers: int = 12


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    # One batched device_get instead of per-leaf np.asarray: over a tunneled
    # backend each leaf pull pays a full RPC round trip (measured 6.4 s for
    # yolov8's 183 params vs 0.33 s batched — 14 ms/leaf latency).
    variables = jax.device_get(variables)
    flat = {}
    for col, tree in variables.items():
        for k, v in _flatten(tree).items():
            flat[col + "." + ".".join(k)] = np.asarray(v)
    _write_safetensors(path, flat)


def load_variables(path: str) -> Dict[str, Any]:
    base = path[: -len(".safetensors")] if path.endswith(".safetensors") else path
    sd = _read_tensor_file(base)
    cols: Dict[str, dict] = {}
    for key, v in sd.items():
        col, rest = key.split(".", 1)
        cols.setdefault(col, {})[tuple(rest.split("."))] = v
    return {col: _nest(flat) for col, flat in cols.items()}


def make_lr_fn(cfg: RunnerConfig, steps_per_epoch: int):
    total = cfg.max_epochs * steps_per_epoch
    milestones = [int(m * total) for m in cfg.lr_milestones]

    def fn(step):
        s = jnp.float32(step)
        warm = jnp.clip(s / max(1, cfg.warmup_iters), 0.0, 1.0)
        base = jnp.float32(cfg.lr) * (0.001 + (1 - 0.001) * warm)
        decay = jnp.ones(())
        for m in milestones:
            decay = decay * jnp.where(s >= m, 0.1, 1.0)
        return base * decay

    return fn


def _leaf_name_mask(params, match: str):
    """True for leaves whose innermost key equals ``match``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: str(getattr(path[-1], "key", path[-1])) == match, params)


def decay_mask(params):
    """mmyolo param groups: decay ONLY conv/linear weights ("kernel" leaves);
    norm scales ("scale") and every bias are exempt
    (YOLOv5OptimizerConstructor's conv/bn/bias three-group split)."""
    return _leaf_name_mask(params, "kernel")


def bias_mask(params):
    return _leaf_name_mask(params, "bias")


def not_bias_mask(params):
    return jax.tree.map(lambda b: not b, bias_mask(params))


def layer_decay_scale(path, rate: float, num_layers: int) -> float:
    """Per-leaf lr multiplier, mmdet LayerDecayOptimizerConstructor /
    detectron2 ``get_vit_lr_decay_rate`` semantics: patch/pos embed decay
    the most (layer 0), backbone block i is layer i+1, everything outside
    the backbone (FPN, RPN, box head, backbone final norm) trains at the
    full lr."""
    names = [str(getattr(p, "key", p)) for p in path]
    if not names or names[0] != "backbone":
        return 1.0
    sub = names[1] if len(names) > 1 else ""
    if sub in ("patch_embed", "pos_embed"):
        layer_id = 0
    elif sub.startswith("block_"):
        layer_id = int(sub.split("_")[1]) + 1
    else:
        layer_id = num_layers + 1
    return rate ** (num_layers + 1 - layer_id)


def scale_by_layer_decay(rate: float, num_layers: int):
    """Multiply each leaf's (already lr-scaled) AdamW update by its layer
    scale — identical math to torch per-param-group lr: both the Adam term
    and the decoupled weight-decay term use the group lr."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, u: u * layer_decay_scale(path, rate, num_layers),
            updates)
        return scaled, state

    return optax.GradientTransformation(init, update)


def no_decay_mask(params):
    """LayerDecayOptimizerConstructor's decay group: weight decay only on
    params with ndim > 1 (1-d params and biases are 'no_decay')."""
    return jax.tree.map(lambda x: getattr(x, "ndim", 0) > 1, params)


def scaled_weight_decay(cfg: RunnerConfig, total_bs: int) -> float:
    """YOLOv5OptimizerConstructor: wd *= total_bs * accumulate / 64 where
    accumulate = max(round(64 / total_bs), 1)."""
    accumulate = max(round(cfg.base_total_batch_size / max(1, total_bs)), 1)
    return cfg.weight_decay * total_bs * accumulate / cfg.base_total_batch_size


def make_yolo_schedules(cfg: RunnerConfig, steps_per_epoch: int, base_lr=None):
    """YOLOv5ParamSchedulerHook semantics as step functions.

    Per-epoch linear factor ``(1 - e/max_epochs)*(1-lr_factor) + lr_factor``
    applied at epoch boundaries; iter-level linear warmup over
    ``max(warmup_epochs*steps_per_epoch, warmup_mim_iter)`` iters — weights/
    norms warm from 0, biases from warmup_bias_lr down/up to the epoch lr,
    momentum from warmup_momentum to momentum.
    """
    base_lr = cfg.lr if base_lr is None else base_lr
    warm_total = max(round(cfg.warmup_epochs * steps_per_epoch),
                     cfg.warmup_mim_iter)

    def epoch_lr(step):
        e = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        e = jnp.minimum(e, float(cfg.max_epochs))
        factor = (1.0 - e / cfg.max_epochs) * (1.0 - cfg.lr_factor) + cfg.lr_factor
        return jnp.float32(base_lr) * factor

    def w(step):
        return jnp.clip(jnp.float32(step) / warm_total, 0.0, 1.0)

    def lr_main(step):
        return w(step) * epoch_lr(step)

    def lr_bias(step):
        return cfg.warmup_bias_lr + w(step) * (epoch_lr(step) - cfg.warmup_bias_lr)

    def momentum_fn(step):
        return cfg.warmup_momentum + w(step) * (cfg.momentum - cfg.warmup_momentum)

    return lr_main, lr_bias, momentum_fn


def make_optimizer(cfg: RunnerConfig, steps_per_epoch: int,
                   total_bs: Optional[int] = None, base_lr: Optional[float] = None):
    base_lr = cfg.lr if base_lr is None else base_lr
    chain = []
    if cfg.clip_grad_norm:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    if cfg.yolo_optimizer:
        lr_main, lr_bias, momentum_fn = make_yolo_schedules(
            cfg, steps_per_epoch, base_lr)
        wd = scaled_weight_decay(cfg, total_bs or cfg.batch_size)
        sgd = optax.inject_hyperparams(optax.sgd)
        chain += [
            optax.add_decayed_weights(wd, mask=decay_mask),
            # Two masked chains = per-group lr (identical math to torch param
            # groups: momentum traces are per-leaf, so the split is exact).
            optax.masked(
                sgd(learning_rate=lr_main, momentum=momentum_fn,
                    nesterov=cfg.nesterov),
                not_bias_mask),
            optax.masked(
                sgd(learning_rate=lr_bias, momentum=momentum_fn,
                    nesterov=cfg.nesterov),
                bias_mask),
        ]
        return optax.chain(*chain), lr_main
    lr_fn = make_lr_fn(cfg, steps_per_epoch) if base_lr == cfg.lr else \
        make_lr_fn(dataclasses.replace(cfg, lr=base_lr), steps_per_epoch)
    if cfg.optimizer == "sgd":
        chain.append(optax.sgd(lr_fn, momentum=cfg.momentum,
                               nesterov=cfg.nesterov))
        if cfg.weight_decay:
            chain.insert(-1, optax.add_decayed_weights(cfg.weight_decay))
    elif cfg.optimizer == "adamw":
        if cfg.layer_decay_rate:
            chain.append(optax.adamw(lr_fn, weight_decay=cfg.weight_decay,
                                     mask=no_decay_mask))
            chain.append(scale_by_layer_decay(cfg.layer_decay_rate,
                                              cfg.layer_decay_layers))
        else:
            chain.append(optax.adamw(lr_fn, weight_decay=cfg.weight_decay))
    else:
        raise ValueError(cfg.optimizer)
    return optax.chain(*chain), lr_fn


class DetectorRunner:
    """Train/val/test driver for a detector family.

    family interface:
      init_variables(rng) -> {"params", "batch_stats"?}
      loss_fn(variables, batch, rng, train=True) -> (loss, (metrics, new_batch_stats))
      predict_fn(variables, images) -> (boxes (B,K,4), scores (B,K), valid (B,K))
    """

    def __init__(self, family, run_cfg: RunnerConfig):
        self.family = family
        self.cfg = run_cfg
        os.makedirs(run_cfg.output_dir, exist_ok=True)

    # -- training -----------------------------------------------------------

    def _import_key(self) -> str:
        """Family key for the torch-checkpoint importer, from the family class."""
        name = type(self.family).__name__
        return {
            "FasterRCNNFamily": "faster-rcnn",
            "YOLOv5Family": "yolov5",
            "YOLOv8Family": "yolov8",
            "ViTDetFamily": "vitdet",
        }.get(name, name.lower())

    def train(self, train_dataset, val_dataset=None, resume: Optional[str] = None,
              pretrained: Optional[str] = None):
        from agenda_tpu.data.datasets import DataLoader
        from agenda_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        cfg = self.cfg
        mesh = make_mesh()
        global_bs = cfg.batch_size * mesh.shape["dp"]
        planner = data_dev = None
        data_host = None
        if cfg.device_aug:
            planner, why = self._make_planner(train_dataset)
            if planner is None:
                logger.warning("device_aug requested but unsupported (%s); "
                               "using the host aug pipeline", why)
            else:
                # Host-only cache fill; the device upload happens AFTER the
                # plan-prefetcher pool forks (workers share the decoded set
                # copy-on-write and must not inherit mid-upload jax state).
                data_host = planner.dataset_tensor()
        loader = DataLoader(train_dataset, global_bs, shuffle=True, seed=cfg.seed,
                            num_workers=2, pad_to_full=True)
        switch_epoch = cfg.max_epochs - cfg.close_mosaic_epochs \
            if cfg.close_mosaic_epochs > 0 else None
        prefetcher = None
        if planner is not None and cfg.device_aug_workers > 0:
            # fork AFTER planner.dataset_tensor() filled the tile cache so
            # workers share the decoded train set copy-on-write, and BEFORE
            # model init / the device upload (forking with a live
            # accelerator client risks inheriting held runtime locks; the
            # children only ever run numpy/PIL). Stage-2 (mosaic-close)
            # epochs mutate the aug recipe, so they stay serial
            # (stop_epoch).
            from agenda_tpu.detect.device_aug import PlanPrefetcher
            prefetcher = PlanPrefetcher(
                planner, loader.batches_for_epoch,
                (cfg.seed + 1) * 1_000_003, train_dataset.max_gt,
                max(1, min(64, global_bs // 8)), cfg.device_aug_workers,
                stop_epoch=switch_epoch)
        if data_host is not None:
            data_dev = jnp.asarray(data_host)
            logger.info("device aug on: %d tiles (%.0f MB) resident in "
                        "device memory", data_dev.shape[0],
                        data_dev.nbytes / 1e6)
            del data_host
        steps_per_epoch = len(loader)
        base_lr = cfg.lr
        if cfg.auto_scale_lr and cfg.base_batch_size:
            # mmengine auto_scale_lr (linear scaling rule) — opt-in, like the
            # reference's --auto-scale-lr flag (Real_Source/vitdet.py:431).
            base_lr = cfg.lr * global_bs / cfg.base_batch_size
            logger.info("auto_scale_lr: lr %.2e -> %.2e (global_bs %d / base %d)",
                        cfg.lr, base_lr, global_bs, cfg.base_batch_size)
        tx, lr_fn = make_optimizer(cfg, steps_per_epoch, total_bs=global_bs,
                                   base_lr=base_lr)

        variables = self.family.init_variables(jax.random.key(cfg.seed))
        if pretrained:
            # COCO/ImageNet init from a torch checkpoint — the reference's
            # `load_from` (Real_Source/faster-rcnn.py:37).
            from agenda_tpu.io.torch_import import (
                import_detector_weights,
                load_torch_checkpoint,
            )

            sd = load_torch_checkpoint(pretrained)
            variables, report = import_detector_weights(variables, sd, self._import_key())
            logger.info("pretrained init from %s: %d tensors imported, %d "
                        "head tensors shape-skipped", pretrained,
                        len(report.imported), len(report.skipped_shape))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)
        start_epoch = 0
        gstep = 0
        resume_ema = None
        if resume:
            loaded = load_variables(resume)
            params = loaded["params"]
            batch_stats = loaded.get("batch_stats", batch_stats)
            resume_ema = loaded.get("ema_params")
            # Full mmengine-style resume: optimizer moments + epoch/step
            # counters ride in a train_state sidecar that is written together
            # with latest.safetensors each epoch — it matches ONLY that file.
            # Resuming a best_*.safetensors (saved at some earlier epoch) must
            # not pair those weights with latest's optimizer state.
            ts_base = os.path.join(os.path.dirname(os.path.abspath(resume)),
                                   "train_state")
            is_latest = os.path.basename(resume) == "latest.safetensors"
            if is_latest and os.path.exists(ts_base + ".safetensors"):
                opt_state, last_epoch, gstep = self._load_train_state(ts_base, opt_state)
                start_epoch = last_epoch + 1
                logger.info("resumed optimizer/epoch state: epoch %d, step %d",
                            start_epoch, gstep)
            elif not is_latest:
                logger.info("%s is not latest.safetensors: weights-only resume "
                            "(train_state sidecar only matches latest)", resume)
            else:
                logger.info("no train_state next to %s: weights-only resume",
                            resume)

        params = replicate(params, mesh)
        batch_stats = replicate(batch_stats, mesh)
        opt_state = replicate(opt_state, mesh)
        # EMA shadow only exists when enabled (None = empty pytree: no extra
        # params-sized copy flows through the jitted step when off).
        ema_params = None
        if cfg.ema_decay > 0:
            src = resume_ema if resume_ema is not None else params
            ema_params = replicate(jax.tree.map(jnp.asarray, src), mesh)

        loss_fn = self.family.loss_fn

        ema_decay = cfg.ema_decay
        if planner is not None:
            from agenda_tpu.detect.device_aug import (
                render_batch as _render,
                render_lsj_batch as _render_lsj,
            )
            tile_hw = (planner.th, planner.tw)
            src_hw = (getattr(planner, "sh", 0), getattr(planner, "sw", 0))
            data_rep = replicate(data_dev, mesh)
            separable = planner.separable

        def train_step(params, ema_params, batch_stats, opt_state, batch, rng,
                       step, has_mix=False):
            rng = jax.random.fold_in(rng, step)
            if "inv" in batch:
                # device-side augmentation: render the batch from the
                # HBM-resident dataset tensor inside the compiled step
                image = _render(batch["data"], batch["scratch"], batch,
                                tile_hw, has_mix=has_mix, separable=separable)
                batch = {"image": image, "gt_boxes": batch["gt_boxes"],
                         "gt_valid": batch["gt_valid"]}
            elif "lsj_idx" in batch:
                # device-side LSJ (ViTDet heatmap stage): antialiased
                # per-sample filter matmuls over the raw-tile tensor
                image = _render_lsj(batch["data"], batch, tile_hw, src_hw)
                batch = {"image": image, "gt_boxes": batch["gt_boxes"],
                         "gt_valid": batch["gt_valid"]}

            def lf(p):
                loss, (metrics, new_bs) = loss_fn(
                    {"params": p, "batch_stats": batch_stats}, batch, rng
                )
                return loss, (metrics, new_bs)

            (loss, (metrics, new_bs)), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if ema_decay > 0:
                # mmyolo ExpMomentumEMA-style warmup: effective decay ramps in.
                d = ema_decay * (1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0) / 2000.0))
                new_ema = jax.tree.map(
                    lambda e, p: e * d + (1.0 - d) * p, ema_params, new_params
                )
            else:
                new_ema = ema_params
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_params, new_ema, new_bs, new_opt, metrics

        train_step = jax.jit(train_step, static_argnums=(7,))
        rng = jax.random.key(cfg.seed)
        best: Dict[str, float] = {k: -1.0 for k in cfg.save_best}
        timer = StepTimer()
        metrics_log = open(os.path.join(cfg.output_dir, "metrics.jsonl"), "a")
        import json as _json

        # Per-epoch latest+train-state saves ride a writer thread: the
        # device_get's tunnel RPC releases the GIL, so the pull and the file
        # write overlap the next epoch's plan building/host aug (measured
        # ~0.7 s/epoch synchronous on yolov8 — at the reference's
        # interval=1 cadence with few steps per epoch that was ~40% of
        # wall). Functional updates never mutate the captured arrays, and
        # submit() joins the previous job, so latest/train_state stay a
        # consistent pair for resume.
        from agenda_tpu.train.checkpoint import AsyncWriter
        saver = AsyncWriter()

        def epoch_batches(epoch):
            """Sharded device batches: host-augmented images, or plan arrays
            for the in-step device render."""
            if planner is None:
                for batch in loader:
                    yield shard_batch(
                        {"image": batch["image"], "gt_boxes": batch["gt_boxes"],
                         "gt_valid": batch["gt_valid"]}, mesh)
                return
            # MedianBlur/CLAHE passthrough slots: expected rare-sample count
            # is ~3% of the batch; 64 covers global_bs 1024 at > 6 sigma
            slots = max(1, min(64, global_bs // 8))
            zero_scratch = getattr(self, "_zero_scratch", None)
            if zero_scratch is None or zero_scratch.shape[0] != slots:
                zero_scratch = replicate(np.zeros(
                    (slots, planner.th, planner.tw, 3), np.float32), mesh)
                self._zero_scratch = zero_scratch

            def plan_stream():
                """(packed, scratch|None) pairs — prefetched when a pool is
                on and the epoch precedes the stage-2 recipe switch."""
                pre = (prefetcher.epoch_batches(epoch)
                       if prefetcher is not None else None)
                if pre is not None:
                    loader.epoch += 1
                    yield from pre
                    return
                aug_rng = np.random.default_rng(
                    (cfg.seed + 1) * 1_000_003 + epoch)
                # keyed on the TRUE epoch (not loader.epoch, which restarts
                # at 0 on resume) so the shuffle stream matches the
                # prefetched path and a resumed run continues the same
                # epoch->batches mapping as an uninterrupted one
                batches = loader.batches_for_epoch(epoch)
                loader.epoch += 1
                for idx_b in batches:
                    packed, scratch, _ = planner.plan_batch(
                        idx_b, aug_rng, train_dataset.max_gt,
                        scratch_slots=slots)
                    used = bool((packed["pass_slot"] >= 0).any())
                    yield packed, (scratch if used else None)

            for packed, scratch in plan_stream():
                db = shard_batch(packed, mesh)
                # upload the scratch slab only when a passthrough sample used
                # it — the common batch reuses the device-resident zeros
                db["scratch"] = (replicate(scratch, mesh)
                                 if scratch is not None else zero_scratch)
                db["data"] = data_rep
                yield db

        def recipe_has_mix():
            a = getattr(train_dataset, "aug", None)
            return bool(planner is not None and a is not None
                        and a.mosaic and a.mixup_prob > 0)

        try:
            for epoch in range(start_epoch, cfg.max_epochs):
                if switch_epoch is not None and epoch >= switch_epoch:
                    self._apply_stage2_aug(train_dataset)
                has_mix = recipe_has_mix()
                for db in epoch_batches(epoch):
                    params, ema_params, batch_stats, opt_state, metrics = train_step(
                        params, ema_params, batch_stats, opt_state, db, rng,
                        jnp.int32(gstep), has_mix
                    )
                    gstep += 1
                    if gstep % cfg.log_interval == 0 or gstep <= 2:
                        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                        m.update(epoch=epoch, step=gstep, lr=float(lr_fn(gstep)),
                                 sps=timer.tick(gstep))
                        metrics_log.write(_json.dumps(m) + "\n")
                        metrics_log.flush()
                        logger.info("e%d s%d loss=%.4f lr=%.2e", epoch, gstep,
                                    m["loss"], m["lr"])
                # dynamic_intervals: tighter val cadence inside the mosaic-close
                # window (Real_Source/yolov8.py:229-232, val_interval_stage2 = 1).
                val_every = cfg.val_interval
                if (switch_epoch is not None and epoch >= switch_epoch
                        and cfg.val_interval_stage2 is not None):
                    val_every = cfg.val_interval_stage2
                if val_dataset is not None and (epoch + 1) % val_every == 0:
                    eval_params = ema_params if cfg.ema_decay > 0 else params
                    variables = {"params": eval_params, "batch_stats": batch_stats}
                    results = self.evaluate(variables, val_dataset)
                    logger.info("epoch %d val: %s", epoch,
                                {k: round(v, 4) for k, v in results.items()})
                    metrics_log.write(_json.dumps({"epoch": epoch, **results}) + "\n")
                    metrics_log.flush()
                    for key in cfg.save_best:
                        if results.get(key, -1) > best[key]:
                            best[key] = results[key]
                            save_variables(
                                os.path.join(cfg.output_dir, f"best_{key}.safetensors"),
                                variables,
                            )
                latest = {"params": params, "batch_stats": batch_stats}
                if cfg.ema_decay > 0:
                    latest["ema_params"] = ema_params

                def _save(latest=latest, opt_state=opt_state, epoch=epoch,
                          gstep=gstep):
                    save_variables(
                        os.path.join(cfg.output_dir, "latest.safetensors"), latest)
                    self._save_train_state(opt_state, epoch, gstep)

                saver.submit(_save, name=f"latest-e{epoch}")
        finally:
            # the worker pool must not outlive a failed training
            # (NaN abort / OOM / KeyboardInterrupt) — each stranded
            # pool holds a copy-on-write view of the dataset tensor
            if prefetcher is not None:
                prefetcher.close()
        saver.wait()
        metrics_log.close()
        return {"params": ema_params if cfg.ema_decay > 0 else params,
                "batch_stats": batch_stats}

    @staticmethod
    def _make_planner(dataset):
        """-> (planner | None, reason). Device aug needs cached
        CocoDetDataset parts; LSJ recipes route to the LSJPlanner (needs a
        uniform raw tile size, single dataset)."""
        from agenda_tpu.detect.device_aug import (
            AugPlanner,
            ConcatAugPlanner,
            LSJPlanner,
        )

        parts = getattr(dataset, "datasets", None)
        for part in (parts or [dataset]):
            aug = getattr(part, "aug", None)
            if aug is None:
                return None, "dataset has no aug recipe"
            if aug.lsj:
                if parts is not None:
                    return None, "LSJ over a ConcatDataset"
                if dataset.source_size() is None:
                    return None, "LSJ needs a uniform source tile size"
                return LSJPlanner(dataset), ""
            if getattr(part, "_scaled_cache", None) is None:
                return None, "tile cache disabled (AGENDA_TPU_IMG_CACHE_MB)"
        if parts is not None:
            return ConcatAugPlanner(dataset), ""
        return AugPlanner(dataset), ""

    def _apply_stage2_aug(self, dataset) -> None:
        """Switch a (possibly concatenated) train dataset to the stage-2
        (mosaic-closed) recipe; idempotent."""
        from agenda_tpu.detect.augment import stage2_aug

        parts = getattr(dataset, "datasets", [dataset])
        for part in parts:
            a = getattr(part, "aug", None)
            if a is not None and not a.standalone_affine:
                part.aug = stage2_aug(a)
                logger.info("mosaic-close: switched train aug to stage-2 "
                            "recipe (mosaic/mixup off, standalone affine)")

    def _save_train_state(self, opt_state, epoch: int, gstep: int) -> None:
        """Optimizer moments + epoch/step counters (mmengine resume parity).

        One safetensors file with the opt_state leaves in tree order — orbax's
        many-small-files sync save measured 13 s/epoch on this host.
        """
        leaves = jax.device_get(jax.tree.leaves(opt_state))  # batched pull
        flat = {f"opt.{i:04d}": np.asarray(x) for i, x in enumerate(leaves)}
        flat["epoch"] = np.asarray(epoch, np.int64)
        flat["gstep"] = np.asarray(gstep, np.int64)
        _write_safetensors(
            os.path.join(self.cfg.output_dir, "train_state.safetensors"), flat)

    @staticmethod
    def _load_train_state(path_base: str, opt_state_template):
        """-> (opt_state, epoch, gstep); template provides the tree structure."""
        sd = _read_tensor_file(path_base)
        leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
        restored = [np.asarray(sd[f"opt.{i:04d}"], np.asarray(l).dtype)
                    for i, l in enumerate(leaves)]
        opt_state = jax.tree_util.tree_unflatten(treedef, restored)
        return opt_state, int(sd["epoch"]), int(sd["gstep"])

    # -- evaluation / test --------------------------------------------------

    def _predict_batches(self, variables, dataset, batch_size=None):
        cfg = self.cfg
        bs = batch_size or cfg.batch_size

        predict = jax.jit(self.family.predict_fn)
        records = []
        n = len(dataset)

        # Multi-chip labeling: shard the image batch over the dp mesh and
        # replicate the weights — XLA compiles one SPMD predict program and
        # a 10k-image labeling pass scales with the slice (the reference
        # shards tools/test.py over GPUs with mmengine's dist launcher).
        mesh = None
        if jax.device_count() > 1 and bs % jax.device_count() == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from agenda_tpu.parallel.mesh import make_mesh, replicate

            mesh = make_mesh()
            variables = replicate(variables, mesh)
            img_sharding = NamedSharding(mesh, P("dp"))

        def put_images(images):
            if mesh is not None:
                return jax.device_put(images, img_sharding)
            return jnp.asarray(images)

        # Eval-time device resize: uniform source tiles -> the host only
        # decodes uint8 and the resize to img_scale rides the predict
        # program as two filter matmuls (data/device_resize.py). A 10k-image
        # labeling pass touches each tile once, so the train-path tile cache
        # cannot amortize the host resize here.
        src = None
        if (not os.environ.get("AGENDA_TPU_NO_DEVICE_RESIZE")
                and getattr(dataset, "train", True) is False
                and hasattr(dataset, "source_size")):
            src = dataset.source_size()
        if src is not None:
            from agenda_tpu.data.device_resize import resize_weights

            out_w, out_h = dataset.img_scale
            wy = jnp.asarray(resize_weights(src[1], out_h, "bilinear"))
            wx = jnp.asarray(resize_weights(src[0], out_w, "bilinear"))

            @jax.jit
            def predict_u8(variables, u8):
                x = u8.astype(jnp.float32)
                x = jnp.einsum("Ww,bhwc->bhWc", wx, x)
                x = jnp.einsum("Hh,bhwc->bHwc", wy, x)
                # the host path quantizes the resized tile to uint8 (native
                # resize output) before /255 — match it
                x = jnp.round(jnp.clip(x, 0.0, 255.0)) / 255.0
                return self.family.predict_fn(variables, x)

        def dispatch(i):
            # Host-side decode(/resize) + async device dispatch: JAX returns
            # futures, so the device runs batch i while the host prepares
            # batch i+1 (one batch in flight — the generate_async pattern;
            # the previous serial loop left the chip idle for the full
            # decode+materialize time of every batch of a 10k-image labeling
            # run).
            if src is not None:
                items = [dataset.item_u8(j, expect_size=src)
                         for j in range(i, min(i + bs, n))]
                pad = bs - len(items)
                images = np.stack([it["image_u8"] for it in items]
                                  + [items[-1]["image_u8"]] * pad)
                return items, predict_u8(variables, put_images(images))
            items = [dataset[j] for j in range(i, min(i + bs, n))]
            pad = bs - len(items)
            images = np.stack([it["image"] for it in items] + [items[-1]["image"]] * pad)
            return items, predict(variables, put_images(images))

        def collect(pending):
            items, (boxes, scores, valid) = pending
            # one batched transfer: three sequential np.asarray pulls pay
            # three tunnel round trips per batch
            boxes, scores, valid = jax.device_get((boxes, scores, valid))
            for k, it in enumerate(items):
                keep = valid[k] & (scores[k] > 0)
                records.append(
                    {
                        "item": it,
                        "boxes": boxes[k][keep],
                        "scores": scores[k][keep],
                    }
                )

        pending = None
        for i in range(0, n, bs):
            cur = dispatch(i)
            if pending is not None:
                collect(pending)
            pending = cur
        if pending is not None:
            collect(pending)
        return records

    def evaluate(self, variables, dataset) -> Dict[str, float]:
        recs = self._predict_batches(variables, dataset)
        gts = [r["item"]["gt_boxes"][r["item"]["gt_valid"]] for r in recs]
        return coco_map(gts, [r["boxes"] for r in recs], [r["scores"] for r in recs])

    def test(self, variables, dataset, out_pkl: Optional[str] = None,
             img_dir: Optional[str] = None,
             batch_size: Optional[int] = None) -> List[dict]:
        """Produce prediction records (== mmdet tools/test.py --out)."""
        recs = self._predict_batches(variables, dataset, batch_size=batch_size)
        out = []
        for r in recs:
            it = r["item"]
            image_id = int(it["image_id"])
            file_name = dataset.file_name(image_id)
            sb = np.asarray(it.get("scale_back", np.ones(4)), np.float32)
            rec = {
                "img_path": os.path.join(img_dir or dataset.img_dir, file_name),
                "gt_instances": {
                    "bboxes": np.asarray(it["gt_boxes"][it["gt_valid"]], np.float32) * sb,
                    "labels": np.zeros(int(it["gt_valid"].sum()), np.int64),
                },
                "pred_instances": {
                    "bboxes": np.asarray(r["boxes"], np.float32) * sb,
                    "scores": np.asarray(r["scores"], np.float32),
                    "labels": np.zeros(len(r["scores"]), np.int64),
                },
            }
            out.append(rec)
        if out_pkl:
            save_predictions(out, out_pkl)
        return out
