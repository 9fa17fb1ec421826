"""mmyolo optimizer-constructor + param-scheduler parity, and the
mosaic-close pipeline switch (VERDICT round-2 items 2-3).

The reference yolo configs construct SGD through YOLOv5OptimizerConstructor
with batch_size_per_gpu (``Real_Source/yolov5.py:190-191``,
``yolov8.py:197-198``): per-group weight decay (bias/norm exempt), wd scaled
by batch size, nesterov momentum, and YOLOv5ParamSchedulerHook lr_factor
scheduling (``yolov5.py:38,212``). The yolov8 configs additionally switch to
a mosaic-free stage-2 pipeline for the final 10 epochs
(``Real_Source/yolov8.py:34,215-216``).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agenda_tpu.detect.runner import (
    RunnerConfig,
    bias_mask,
    decay_mask,
    make_optimizer,
    make_yolo_schedules,
    scaled_weight_decay,
)


def test_decay_mask_hand_listed_tree():
    """Golden: decay only on "kernel" leaves; norm scale + every bias exempt
    (YOLOv5OptimizerConstructor's conv/bn/bias 3-group split)."""
    params = {
        "backbone": {
            "conv0": {"kernel": jnp.ones((3, 3, 3, 8)), "bias": jnp.zeros(8)},
            "bn0": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        },
        "head": {"fc": {"kernel": jnp.ones((8, 1)), "bias": jnp.zeros(1)}},
    }
    assert decay_mask(params) == {
        "backbone": {
            "conv0": {"kernel": True, "bias": False},
            "bn0": {"scale": False, "bias": False},
        },
        "head": {"fc": {"kernel": True, "bias": False}},
    }
    assert bias_mask(params) == {
        "backbone": {
            "conv0": {"kernel": False, "bias": True},
            "bn0": {"scale": False, "bias": True},
        },
        "head": {"fc": {"kernel": False, "bias": True}},
    }


def test_decay_mask_on_real_yolov8_params():
    """Every leaf of a real yolov8 tree is classified: kernels decay, all
    scale/bias leaves do not, and nothing is left over."""
    from agenda_tpu.detect.families import build_family

    fam = build_family("yolov8", model=dict(img_size=64, max_gt=8))
    params = fam.init_variables(jax.random.key(0))["params"]
    mask = decay_mask(params)
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = jax.tree.leaves(mask)
    assert len(flat_p) == len(flat_m)
    n_decay = 0
    for (path, _), m in zip(flat_p, flat_m):
        name = str(getattr(path[-1], "key", path[-1]))
        assert m == (name == "kernel"), (path, m)
        if name in ("scale", "bias"):
            assert not m
        n_decay += bool(m)
    assert n_decay > 10  # the tree really has conv kernels


def test_scaled_weight_decay_goldens():
    """wd *= total_bs * accumulate / 64, accumulate = max(round(64/total),1)
    — YOLOv5OptimizerConstructor."""
    cfg = RunnerConfig(weight_decay=0.0005)
    assert scaled_weight_decay(cfg, 64) == pytest.approx(0.0005)
    assert scaled_weight_decay(cfg, 200) == pytest.approx(0.0005 * 200 / 64)
    assert scaled_weight_decay(cfg, 512) == pytest.approx(0.0005 * 8)
    # small batches: accumulate compensates, wd stays ~base
    assert scaled_weight_decay(cfg, 16) == pytest.approx(0.0005)
    assert scaled_weight_decay(cfg, 32) == pytest.approx(0.0005)


def test_yolo_schedule_warmup_and_epoch_decay():
    cfg = RunnerConfig(yolo_optimizer=True, lr=0.01, lr_factor=0.1,
                       max_epochs=100, momentum=0.937, warmup_momentum=0.8,
                       warmup_bias_lr=0.1, warmup_mim_iter=1000,
                       warmup_epochs=3.0)
    lr_main, lr_bias, mom = make_yolo_schedules(cfg, steps_per_epoch=10)
    # warmup_total = max(3*10, 1000) = 1000 ("critical", yolov5.py:207-211)
    assert float(lr_main(0)) == 0.0
    assert float(lr_bias(0)) == pytest.approx(0.1)
    assert float(mom(0)) == pytest.approx(0.8)
    # epoch at step 1000 is 100 -> factor = lr_factor
    assert float(lr_main(1000)) == pytest.approx(0.01 * 0.1, rel=1e-5)
    assert float(mom(2000)) == pytest.approx(0.937)
    # mid-training epoch factor: e=50 -> (1-0.5)*0.9+0.1 = 0.55
    cfg2 = RunnerConfig(yolo_optimizer=True, lr=0.01, lr_factor=0.1,
                        max_epochs=100, warmup_mim_iter=1)
    lm, _, _ = make_yolo_schedules(cfg2, steps_per_epoch=10)
    assert float(lm(500)) == pytest.approx(0.01 * 0.55, rel=1e-5)


def test_yolo_sgd_matches_torch_param_groups():
    """The masked optax chain reproduces torch.optim.SGD with mm-style param
    groups (decay on kernel only, per-group lr, nesterov, scheduled
    momentum) step for step."""
    torch = pytest.importorskip("torch")

    cfg = RunnerConfig(yolo_optimizer=True, lr=0.5, momentum=0.9,
                       nesterov=True, weight_decay=0.01, lr_factor=0.1,
                       max_epochs=4, warmup_mim_iter=2, warmup_epochs=0.0,
                       warmup_momentum=0.8, warmup_bias_lr=0.1,
                       batch_size=64, clip_grad_norm=None)
    tx, _ = make_optimizer(cfg, steps_per_epoch=2, total_bs=64)
    pj = {"m": {"kernel": jnp.array([2.0]), "bias": jnp.array([1.5]),
                "scale": jnp.array([0.7])}}
    sj = tx.init(pj)

    tw = torch.nn.Parameter(torch.tensor([2.0]))
    tb = torch.nn.Parameter(torch.tensor([1.5]))
    ts = torch.nn.Parameter(torch.tensor([0.7]))
    opt = torch.optim.SGD(
        [{"params": [tw], "weight_decay": 0.01},
         {"params": [ts], "weight_decay": 0.0},
         {"params": [tb], "weight_decay": 0.0}],
        lr=0.5, momentum=0.9, nesterov=True)

    for it in range(6):
        g = 0.3 + 0.05 * it
        # YOLOv5ParamSchedulerHook oracle
        e = min(it // 2, 4)
        factor = (1 - e / 4) * (1 - 0.1) + 0.1
        w = min(it / 2, 1.0)
        lr_k = w * 0.5 * factor
        lr_b = 0.1 + w * (0.5 * factor - 0.1)
        m = 0.8 + w * (0.9 - 0.8)
        for gi, lr in ((0, lr_k), (1, lr_k), (2, lr_b)):
            opt.param_groups[gi]["lr"] = lr
            opt.param_groups[gi]["momentum"] = m
        for t in (tw, tb, ts):
            t.grad = torch.tensor([g])
        opt.step()

        gj = jax.tree.map(lambda x: jnp.full_like(x, g), pj)
        u, sj = tx.update(gj, sj, pj)
        pj = optax.apply_updates(pj, u)

    assert float(pj["m"]["kernel"][0]) == pytest.approx(tw.item(), abs=2e-5)
    assert float(pj["m"]["bias"][0]) == pytest.approx(tb.item(), abs=2e-5)
    assert float(pj["m"]["scale"][0]) == pytest.approx(ts.item(), abs=2e-5)


def test_auto_scale_lr_optional():
    """Linear scaling rule is opt-in; base_lr flows into the schedule."""
    cfg = RunnerConfig(lr=0.02, max_epochs=2, warmup_iters=1)
    _, lr_fn = make_optimizer(cfg, steps_per_epoch=10, base_lr=0.04)
    assert float(lr_fn(5)) == pytest.approx(0.04, rel=1e-2)


def test_presets_carry_yolo_optimizer_and_close_mosaic():
    from agenda_tpu.detect.configs import DatasetSpec, preset

    spec = [DatasetSpec("/tmp/none", "ann.json")]
    v8 = preset("real_source", "yolov8", spec)
    assert v8.runner.yolo_optimizer and v8.runner.nesterov
    assert v8.runner.momentum == pytest.approx(0.937)
    assert v8.runner.weight_decay == pytest.approx(0.0005)
    assert v8.runner.lr_factor == pytest.approx(0.01)
    assert v8.runner.close_mosaic_epochs == 10      # yolov8.py:34
    assert v8.runner.val_interval_stage2 == 1       # yolov8.py:40
    assert v8.runner.clip_grad_norm is None

    v5 = preset("real_source", "yolov5", spec)
    assert v5.runner.yolo_optimizer
    assert v5.runner.lr_factor == pytest.approx(0.1)  # yolov5.py:38
    assert v5.runner.close_mosaic_epochs == 0       # no switch for yolov5

    fr = preset("real_source", "faster-rcnn", spec)
    assert not fr.runner.yolo_optimizer
    assert fr.runner.base_batch_size == 64
    vt = preset("synthetic_heatmap", "vitdet", spec)
    assert vt.runner.base_batch_size == 64          # 001_lsj base :228


def test_stage2_aug_derivation():
    from agenda_tpu.detect.augment import mix_stage_aug, stage2_aug

    a = mix_stage_aug(mixup_prob=0.1, mixup_mosaic_pre=True)
    s2 = stage2_aug(a)
    assert not s2.mosaic and s2.mixup_prob == 0.0
    assert s2.standalone_affine
    # photometric tail unchanged (Real_Source/yolov8.py:116-134 keeps
    # Albu/HSV/flip in train_pipeline_stage2)
    assert s2.hsv == a.hsv and s2.flip_prob == a.flip_prob
    assert s2.blur_prob == a.blur_prob
    assert s2.affine_scale == a.affine_scale


def _square_dataset(root, n_images=8, size=112):
    """Tiny COCO dir with one centered box per image."""
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    images, anns = [], []
    for i in range(n_images):
        arr = np.full((size, size, 3), 30, np.uint8)
        arr[40:70, 40:70] = 220
        Image.fromarray(arr).save(os.path.join(root, "images", f"{i}.png"))
        images.append({"id": i, "file_name": f"{i}.png", "width": size,
                       "height": size})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [40, 40, 30, 30], "area": 900, "iscrowd": 0})
    coco = {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "small"}]}
    with open(os.path.join(root, "ann.json"), "w") as f:
        json.dump(coco, f)


def test_standalone_affine_sample_valid(tmp_path):
    """The stage-2 recipe produces in-range boxes and finite pixels."""
    from agenda_tpu.detect.augment import mix_stage_aug, stage2_aug
    from agenda_tpu.detect.dataset import CocoDetDataset

    root = str(tmp_path)
    _square_dataset(root, n_images=4)
    ds = CocoDetDataset(root, "ann.json", img_scale=(64, 64), max_gt=8,
                        train=True, aug=stage2_aug(mix_stage_aug()))
    hits = 0
    for i in range(12):
        s = ds[i % 4]
        assert s["image"].shape == (64, 64, 3)
        assert np.isfinite(s["image"]).all()
        if s["gt_valid"].any():
            b = s["gt_boxes"][s["gt_valid"]]
            assert (b[:, :2] >= -1).all() and (b[:, 2:] <= 65).all()
            hits += 1
    assert hits > 4  # affine keeps the centered box most of the time


def test_mosaic_close_switch_epoch(tmp_path):
    """The train loop switches the dataset recipe exactly at
    max_epochs - close_mosaic_epochs (Real_Source/yolov8.py:215-216)."""
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    root = str(tmp_path)
    _square_dataset(root, n_images=8)

    class ProbeDataset(CocoDetDataset):
        """Records the active recipe at every sample load."""

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.mosaic_log = []

        def __getitem__(self, index):
            self.mosaic_log.append(bool(self.aug.mosaic))
            return super().__getitem__(index)

    from agenda_tpu.detect.augment import mix_stage_aug

    ds = ProbeDataset(root, "ann.json", img_scale=(64, 64), max_gt=8,
                      train=True, aug=mix_stage_aug())
    fam = build_family("yolov8", model=dict(img_size=64, max_gt=8))
    cfg = RunnerConfig(output_dir=os.path.join(root, "work"), max_epochs=2,
                       batch_size=2, lr=0.001, val_interval=100,
                       warmup_iters=2, log_interval=100,
                       close_mosaic_epochs=1, val_interval_stage2=1)
    DetectorRunner(fam, cfg).train(ds)

    assert ds.aug.standalone_affine and not ds.aug.mosaic
    log = ds.mosaic_log
    # epoch 0 trained with mosaic; epoch 1 (the close window) without.
    # Mosaic loads 4 sub-images per sample, so epoch 0 contributes >8
    # True entries; the tail of the log must be all False.
    assert log[0] is True
    assert log[-1] is False
    flips = [i for i in range(1, len(log)) if log[i] != log[i - 1]]
    assert len(flips) == 1  # exactly one switch, never back


# ---------------------------------------------------------------------------
# LayerDecayOptimizerConstructor (vitdet stages)
# ---------------------------------------------------------------------------


def _vitdet_like_tree():
    return {
        "backbone": {
            "patch_embed": {"kernel": jnp.full((2, 2, 3, 4), 0.5),
                            "bias": jnp.full((4,), 0.1)},
            "pos_embed": jnp.full((1, 4, 4, 4), 0.2),
            "block_0": {"qkv": {"kernel": jnp.full((4, 12), 0.3),
                                "bias": jnp.full((12,), 0.05)}},
            "block_11": {"qkv": {"kernel": jnp.full((4, 12), -0.4)}},
            "norm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
        },
        "fpn": {"s4_lat": {"kernel": jnp.full((1, 1, 4, 4), 0.7),
                           "bias": jnp.full((4,), -0.2)}},
    }


def test_layer_decay_scale_table():
    """Golden scales for decay_rate 0.7, 12 layers (every reference vitdet
    stage, e.g. Real_Source/vitdet.py:327-341): patch/pos embed 0.7^13,
    block i 0.7^(12-i), non-backbone and the backbone final norm 1.0."""
    import jax.tree_util as jtu

    from agenda_tpu.detect.runner import layer_decay_scale

    tree = _vitdet_like_tree()
    scales = {
        jtu.keystr(path): layer_decay_scale(path, 0.7, 12)
        for path, _ in jtu.tree_flatten_with_path(tree)[0]
    }
    assert scales["['backbone']['patch_embed']['kernel']"] == pytest.approx(0.7 ** 13)
    assert scales["['backbone']['pos_embed']"] == pytest.approx(0.7 ** 13)
    assert scales["['backbone']['block_0']['qkv']['kernel']"] == pytest.approx(0.7 ** 12)
    assert scales["['backbone']['block_11']['qkv']['kernel']"] == pytest.approx(0.7 ** 1)
    assert scales["['backbone']['norm']['scale']"] == 1.0
    assert scales["['fpn']['s4_lat']['kernel']"] == 1.0
    assert scales["['fpn']['s4_lat']['bias']"] == 1.0


def test_layer_decay_adamw_matches_per_group_oracle():
    """One make_optimizer(adamw+layer_decay) step == per-leaf torch-style
    param groups: AdamW at lr*scale with weight decay only on ndim>1 leaves."""
    import jax.tree_util as jtu

    from agenda_tpu.detect.runner import layer_decay_scale, make_optimizer

    params = _vitdet_like_tree()
    grads = jax.tree.map(lambda x: jnp.full_like(x, 0.01), params)

    cfg = RunnerConfig(optimizer="adamw", lr=1e-3, weight_decay=0.1,
                       layer_decay_rate=0.7, layer_decay_layers=12,
                       clip_grad_norm=None, warmup_iters=1,
                       lr_milestones=(), max_epochs=1)
    tx, lr_fn = make_optimizer(cfg, steps_per_epoch=10)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)

    lr0 = float(lr_fn(0))
    flat_u = dict(jtu.tree_flatten_with_path(updates)[0])
    flat_p = dict(jtu.tree_flatten_with_path(params)[0])
    flat_g = dict(jtu.tree_flatten_with_path(grads)[0])
    for path, u in flat_u.items():
        scale = layer_decay_scale(path, 0.7, 12)
        p, g = flat_p[path], flat_g[path]
        wd = 0.1 if p.ndim > 1 else 0.0
        oracle = optax.adamw(lr0 * scale, weight_decay=wd)
        ou, _ = oracle.update(g, oracle.init(p), p)
        np.testing.assert_allclose(np.asarray(u), np.asarray(ou),
                                   rtol=1e-6, atol=1e-9,
                                   err_msg=jtu.keystr(path))


def test_vitdet_presets_carry_layer_decay():
    from agenda_tpu.detect.configs import DatasetSpec, preset

    for stage in ("real_source", "synthetic_heatmap", "synthetic_target"):
        cfg = preset(stage, "vitdet", train=[DatasetSpec("/tmp", "a.json")])
        assert cfg.runner.layer_decay_rate == 0.7, stage
        assert cfg.runner.layer_decay_layers == 12, stage
        assert cfg.runner.weight_decay == 0.1, stage
