"""Device-side augmentation tests.

The planner replicates the host pipeline's random-draw ORDER, so a
same-seeded generator must produce the SAME augmentation decisions as
``CocoDetDataset.__getitem__`` — boxes bit-exactly (same helper code paths),
pixels within resampling tolerance (PIL quantizes to uint8; MixUp's
jitter-resize uses PIL's triangle filter where the device folds the scale
into one bilinear gather)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from agenda_tpu.detect import device_aug as D
from agenda_tpu.detect.configs import DatasetSpec, preset
from agenda_tpu.detect.dataset import CocoDetDataset


def _make_ds(root, n=48, size=112, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(
            os.path.join(root, "images", f"{i}.png"))
        images.append({"id": i, "file_name": f"{i}.png", "width": size,
                       "height": size})
        for _ in range(rng.randint(1, 4)):
            cx, cy = rng.uniform(10, size - 10, 2)
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [cx - 21.18, cy - 21.18, 42.36, 42.36],
                         "area": 42.36 ** 2, "iscrowd": 0})
            aid += 1
    with open(os.path.join(root, "ann.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "small"}]}, f)


@pytest.fixture(scope="module")
def aug_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("devaug"))
    _make_ds(root)
    return root


def _mix_dataset(root):
    cfg = preset("real_source", "yolov8", train=[DatasetSpec(root, "ann.json")],
                 output_dir=os.path.join(root, "wd"))
    return cfg.build_train_dataset()


def _render_plans(planner, packed, scratch):
    data = jnp.asarray(planner.dataset_tensor())
    out = D.render_batch(data, jnp.asarray(scratch),
                         {k: jnp.asarray(v) for k, v in packed.items()},
                         (planner.th, planner.tw))
    return np.asarray(out) * 255.0


def test_plan_matches_host_draw_stream(aug_root):
    """Same seed => same decisions: boxes EXACTLY equal to the host item's,
    device pixels close to the host item's."""
    ds = _mix_dataset(aug_root)
    ds_plan = _mix_dataset(aug_root)
    planner = D.AugPlanner(ds_plan)
    idxs = list(range(12))

    host_imgs, host_boxes, host_valid = [], [], []
    for i in idxs:  # first calls: _aug_calls becomes 1..12 in order
        item = ds[i]
        host_imgs.append(item["image"] * 255.0)
        host_boxes.append(item["gt_boxes"])
        host_valid.append(item["gt_valid"])

    plans = []
    for call, i in enumerate(idxs, start=1):
        rng = np.random.default_rng((call * 2654435761 + i) % (2 ** 31))
        plans.append(planner.plan_item(i, rng))

    for k, p in enumerate(plans):
        nb = int(host_valid[k].sum())
        assert len(p.boxes) == nb or (len(p.boxes) > 64 and nb == 64)
        np.testing.assert_array_equal(p.boxes[:nb].astype(np.float32),
                                      host_boxes[k][:nb])

    packed, scratch, _ = _pack(planner, plans)
    out = _render_plans(planner, packed, scratch)
    diff = np.abs(out - np.stack(host_imgs))
    assert diff.mean() < 1.5, diff.mean()
    assert (diff > 8).mean() < 0.03, (diff > 8).mean()


def _pack(planner, plans):
    """plan_batch's packing for externally built plans."""
    b = len(plans)
    max_gt = planner.ds.max_gt
    packed = {
        "idx": np.zeros((b, 2, 4), np.int32),
        "center": np.zeros((b, 2, 2), np.float32),
        "inv": np.zeros((b, 2, 3, 3), np.float32),
        "use_mosaic": np.zeros((b, 2), bool),
        "clip": np.zeros((b, 2, 2), np.float32),
        "mix": np.zeros((b,), np.float32),
        "flip": np.zeros((b,), bool),
        "hsv_on": np.zeros((b,), bool),
        "hsv_gains": np.zeros((b, 3), np.float32),
        "gray": np.zeros((b,), bool),
        "blur_k": np.zeros((b,), np.int32),
        "pass_slot": np.full((b,), -1, np.int32),
        "gt_boxes": np.zeros((b, max_gt, 4), np.float32),
        "gt_valid": np.zeros((b, max_gt), bool),
    }
    scratch = np.zeros((2, planner.th, planner.tw, 3), np.float32)
    slot = 0
    for i, p in enumerate(plans):
        for br_i, br in enumerate(p.branches):
            packed["idx"][i, br_i] = br.idxs
            packed["center"][i, br_i] = br.center
            packed["inv"][i, br_i] = br.inv
            packed["use_mosaic"][i, br_i] = br.use_mosaic
            packed["clip"][i, br_i] = br.clip_wh
        packed["mix"][i] = 0.5 if p.mix else 0.0
        packed["flip"][i] = p.flip
        packed["hsv_on"][i] = p.hsv_gains is not None
        if p.hsv_gains is not None:
            packed["hsv_gains"][i] = p.hsv_gains
        packed["gray"][i] = p.gray
        packed["blur_k"][i] = p.blur_k
        if p.passthrough and slot < 2:
            scratch[slot] = planner.render_host(p)
            packed["pass_slot"][i] = slot
            slot += 1
    return packed, scratch, plans


def test_device_render_matches_host_oracle(aug_root):
    """Device gather vs the PIL oracle over many random plans: sub-LSB mean,
    seam pixels only above 2."""
    ds = _mix_dataset(aug_root)
    planner = D.AugPlanner(ds)
    rng = np.random.default_rng(7)
    packed, scratch, plans = planner.plan_batch(
        list(rng.integers(0, len(ds), 24)), rng, max_gt=64, scratch_slots=3)
    out = _render_plans(planner, packed, scratch)
    host = np.stack([planner.render_host(p) for p in plans])
    diff = np.abs(out - host)
    assert diff.mean() < 0.8, diff.mean()
    assert (diff > 2).mean() < 0.01, (diff > 2).mean()
    # passthrough samples are bit-exact (they ARE the host render)
    for i, p in enumerate(plans):
        if packed["pass_slot"][i] >= 0:
            np.testing.assert_allclose(out[i], host[i], atol=0.01)


def test_separable_render_matches_gather(aug_root):
    """The matmul-resample formulation computes the same bilinear sum as the
    per-pixel gather path (identical corners/weights, different summation
    order) — near-bitwise over random mosaic/mixup/flip plans."""
    ds = _mix_dataset(aug_root)
    planner = D.AugPlanner(ds)
    assert planner.separable  # yolov8 recipe: rotate 0 / shear 0
    rng = np.random.default_rng(11)
    packed, scratch, _ = planner.plan_batch(
        list(rng.integers(0, len(ds), 16)), rng, max_gt=64, scratch_slots=2)
    data = jnp.asarray(planner.dataset_tensor())
    jplans = {k: jnp.asarray(v) for k, v in packed.items()}
    sep = np.asarray(D.render_batch(data, jnp.asarray(scratch), jplans,
                                    (planner.th, planner.tw), separable=True))
    gat = np.asarray(D.render_batch(data, jnp.asarray(scratch), jplans,
                                    (planner.th, planner.tw), separable=False))
    np.testing.assert_allclose(sep * 255.0, gat * 255.0, atol=2e-3)


def test_separable_property_tracks_rotation(aug_root):
    import dataclasses

    ds = _mix_dataset(aug_root)
    planner = D.AugPlanner(ds)
    assert planner.separable
    ds.aug = dataclasses.replace(ds.aug, max_rotate_degree=10.0)
    assert not planner.separable


def test_plan_batch_deterministic(aug_root):
    ds = _mix_dataset(aug_root)
    planner = D.AugPlanner(ds)
    a1, s1, _ = planner.plan_batch([0, 3, 5], np.random.default_rng(3), 64, 2)
    a2, s2, _ = planner.plan_batch([0, 3, 5], np.random.default_rng(3), 64, 2)
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k])
    np.testing.assert_array_equal(s1, s2)


def test_lsj_recipe_rejected(aug_root):
    from agenda_tpu.detect.augment import lsj_aug

    ds = CocoDetDataset(aug_root, "ann.json", aug=lsj_aug())
    planner = D.AugPlanner(ds)
    with pytest.raises(ValueError, match="LSJ"):
        planner.plan_item(0, np.random.default_rng(0))


def test_runner_device_aug_trains(aug_root, tmp_path):
    """End-to-end: DetectorRunner with device_aug=True runs real train steps
    through the in-step render and produces finite losses."""
    from agenda_tpu.detect.runner import DetectorRunner

    cfg = preset("real_source", "yolov8",
                 train=[DatasetSpec(aug_root, "ann.json")],
                 output_dir=str(tmp_path / "wd"))
    cfg.runner.batch_size = 2
    cfg.runner.max_epochs = 1
    cfg.runner.val_interval = 100
    cfg.runner.close_mosaic_epochs = 0
    cfg.runner.log_interval = 1
    cfg.runner.device_aug = True
    family = cfg.build_family()
    runner = DetectorRunner(family, cfg.runner)
    ds = cfg.build_train_dataset()
    runner.train(ds)
    losses = []
    with open(os.path.join(cfg.runner.output_dir, "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            if "loss" in m:
                losses.append(m["loss"])
    assert losses and all(np.isfinite(l) for l in losses)


def test_make_planner_fallback_reasons(aug_root):
    from agenda_tpu.detect.dataset import ConcatDataset
    from agenda_tpu.detect.runner import DetectorRunner

    ds = _mix_dataset(aug_root)
    planner, why = DetectorRunner._make_planner(ds)
    assert planner is not None
    p2, why = DetectorRunner._make_planner(ConcatDataset([ds, _mix_dataset(aug_root)]))
    assert p2 is not None  # concat supported (Synthetic_Target stage)
    os.environ["AGENDA_TPU_IMG_CACHE_MB"] = "0"
    try:
        ds_nc = _mix_dataset(aug_root)
        p, why = DetectorRunner._make_planner(ds_nc)
        assert p is None and "cache" in why
    finally:
        del os.environ["AGENDA_TPU_IMG_CACHE_MB"]


def test_concat_planner_parity_and_routing(aug_root, tmp_path):
    """ConcatAugPlanner: retrieval stays within the sample's part (reference
    per-part Mosaic wrapping), tile indices address the combined tensor, and
    the device render matches the host oracle."""
    root2 = str(tmp_path / "part2")
    _make_ds(root2, n=16, seed=5)
    from agenda_tpu.detect.dataset import ConcatDataset

    a = _mix_dataset(aug_root)
    b = _mix_dataset(root2)
    concat = ConcatDataset([a, b])
    planner = D.ConcatAugPlanner(concat)
    rng = np.random.default_rng(2)
    n_a = len(a)
    # part-B sample: every tile index must land in part B's tensor range
    for _ in range(4):
        p = planner.plan_item(n_a + 3, rng)
        for br in p.branches:
            assert (br.idxs >= n_a).all() and (br.idxs < n_a + len(b)).all()
    # part-A sample stays in part A's range
    p = planner.plan_item(1, rng)
    for br in p.branches:
        assert (br.idxs < n_a).all()

    packed, scratch, plans = planner.plan_batch(
        [0, 5, n_a + 1, n_a + 7], rng, max_gt=64, scratch_slots=2)
    data = jnp.asarray(planner.dataset_tensor())
    assert data.shape[0] == len(concat)
    out = np.asarray(D.render_batch(
        data, jnp.asarray(scratch),
        {k: jnp.asarray(v) for k, v in packed.items()},
        (planner.th, planner.tw))) * 255.0
    host = np.stack([planner.render_host(p) for p in plans])
    diff = np.abs(out - host)
    assert diff.mean() < 0.8 and (diff > 2).mean() < 0.01


def test_runner_device_aug_concat_trains(aug_root, tmp_path):
    from agenda_tpu.detect.runner import DetectorRunner

    root2 = str(tmp_path / "nocars")
    _make_ds(root2, n=8, seed=9)
    cfg = preset("synthetic_target", "yolov8",
                 train=[DatasetSpec(aug_root, "ann.json"),
                        DatasetSpec(root2, "ann.json")],
                 output_dir=str(tmp_path / "wd"))
    cfg.runner.batch_size = 2
    cfg.runner.max_epochs = 1
    cfg.runner.val_interval = 100
    cfg.runner.close_mosaic_epochs = 0
    cfg.runner.log_interval = 1
    cfg.runner.device_aug = True
    family = cfg.build_family()
    runner = DetectorRunner(family, cfg.runner)
    ds = cfg.build_train_dataset()
    assert getattr(ds, "datasets", None) is not None
    runner.train(ds)
    losses = [json.loads(l)["loss"]
              for l in open(os.path.join(cfg.runner.output_dir, "metrics.jsonl"))
              if "loss" in json.loads(l)]
    assert losses and all(np.isfinite(l) for l in losses)


# ---------------------------------------------------------------------------
# LSJ (ViTDet heatmap stage)
# ---------------------------------------------------------------------------


def _lsj_dataset(root):
    cfg = preset("synthetic_heatmap", "vitdet",
                 train=[DatasetSpec(root, "ann.json")],
                 output_dir=os.path.join(root, "wd_lsj"),
                 img_scale=(128, 128))
    return cfg.build_train_dataset()


def test_lsj_plan_matches_host_draw_stream(aug_root):
    """Same seed => device-LSJ plans carry the SAME boxes as the host LSJ
    items (bit-identical: shared lsj_params/lsj_boxes helpers) and the
    device render matches host pixels to ~1 LSB."""
    ds = _lsj_dataset(aug_root)
    ds_plan = _lsj_dataset(aug_root)
    assert ds.aug.lsj
    planner = D.LSJPlanner(ds_plan)
    idxs = list(range(16))

    host_imgs, host_boxes, host_valid = [], [], []
    for i in idxs:
        item = ds[i]
        host_imgs.append(item["image"] * 255.0)
        host_boxes.append(item["gt_boxes"])
        host_valid.append(item["gt_valid"])

    plans = []
    for call, i in enumerate(idxs, start=1):
        rng = np.random.default_rng((call * 2654435761 + i) % (2 ** 31))
        plans.append(planner.plan_item(i, rng))

    for k, p in enumerate(plans):
        nb = int(host_valid[k].sum())
        assert len(p["boxes"]) == nb or (len(p["boxes"]) > ds.max_gt and nb == ds.max_gt)
        np.testing.assert_array_equal(p["boxes"][:nb].astype(np.float32),
                                      host_boxes[k][:nb])

    # plan_batch smoke (it draws its own stream; the parity render below
    # uses the host-matched plans instead)
    pb_packed, pb_scratch, _ = planner.plan_batch(
        idxs, np.random.default_rng(0), ds.max_gt, 1)
    assert pb_packed["lsj_idx"].shape == (len(idxs),)
    assert (pb_packed["pass_slot"] == -1).all()
    packed = {
        "lsj_idx": np.array([p["index"] for p in plans], np.int32),
        "lsj_flip": np.array([p["flip"] for p in plans], bool),
        "lsj_snwh": np.array([[p["scale"], p["nw"], p["nh"]] for p in plans],
                             np.float32),
        "lsj_xy0": np.array([[p["x0"], p["y0"]] for p in plans], np.float32),
    }
    data = jnp.asarray(planner.dataset_tensor())
    out = np.asarray(D.render_lsj_batch(
        data, {k: jnp.asarray(v) for k, v in packed.items()},
        (planner.th, planner.tw), (planner.sh, planner.sw))) * 255.0

    host = np.stack(host_imgs)
    diff = np.abs(out - host)
    # PIL quantizes filter coefficients to fixed point; the device keeps
    # float — agreement to ~1 LSB, like the SD device-resize path.
    assert diff.mean() < 0.6, diff.mean()
    assert (diff > 2).mean() < 0.01, (diff > 2).mean()


def test_lsj_render_host_oracle_matches_dataset(aug_root):
    """LSJPlanner.render_host replays a plan to the exact dataset pixels."""
    ds = _lsj_dataset(aug_root)
    ds_plan = _lsj_dataset(aug_root)
    planner = D.LSJPlanner(ds_plan)
    for call, i in enumerate(range(4), start=1):
        item = ds[i]
        rng = np.random.default_rng((call * 2654435761 + i) % (2 ** 31))
        p = planner.plan_item(i, rng)
        np.testing.assert_array_equal(planner.render_host(p),
                                      item["image"] * 255.0)


def test_lsj_runner_uses_device_planner(aug_root):
    """_make_planner routes LSJ recipes to LSJPlanner."""
    from agenda_tpu.detect.runner import DetectorRunner

    ds = _lsj_dataset(aug_root)
    planner, why = DetectorRunner._make_planner(ds)
    assert isinstance(planner, D.LSJPlanner), why


def test_lsj_runner_device_aug_trains(aug_root, tmp_path):
    """The Synthetic_Heatmap ViTDet stage trains end-to-end with the
    device-side LSJ render (tiny ViT backbone)."""
    from agenda_tpu.detect.runner import DetectorRunner

    cfg = preset("synthetic_heatmap", "vitdet",
                 train=[DatasetSpec(aug_root, "ann.json")],
                 output_dir=str(tmp_path / "wd_lsj_train"),
                 img_scale=(64, 64), max_gt=8,
                 model=dict(embed_dim=64, vit_depth=2, vit_heads=2,
                            window_size=2, window_block_indexes=(0,),
                            drop_path_rate=0.0, nms_pre=128,
                            num_proposals=32, rpn_sample=32, rcnn_sample=32))
    cfg.runner.batch_size = 2
    cfg.runner.max_epochs = 1
    cfg.runner.val_interval = 100
    cfg.runner.log_interval = 1
    cfg.runner.device_aug = True
    family = cfg.build_family()
    runner = DetectorRunner(family, cfg.runner)
    ds = cfg.build_train_dataset()
    planner, why = DetectorRunner._make_planner(ds)
    assert isinstance(planner, D.LSJPlanner), why
    runner.train(ds)
    losses = [json.loads(l)["loss"]
              for l in open(os.path.join(cfg.runner.output_dir, "metrics.jsonl"))
              if "loss" in json.loads(l)]
    assert losses and all(np.isfinite(l) for l in losses)


def test_plan_prefetcher_bit_identical(aug_root, tmp_path):
    """PlanPrefetcher (worker pool, epoch-granularity) must produce plans
    BITWISE identical to the serial builder: same per-epoch rng stream,
    same batch order (VERDICT r4 #7 done-criterion)."""
    from agenda_tpu.data.datasets import DataLoader

    ds = _mix_dataset(aug_root)
    planner = D.AugPlanner(ds)
    planner.dataset_tensor()  # fill the tile cache BEFORE forking
    loader = DataLoader(ds, 4, shuffle=True, seed=3, num_workers=0,
                        pad_to_full=True)
    base, max_gt, slots = 7_000_019, 8, 2

    serial = []
    for epoch in range(3):
        rng = np.random.default_rng(base + epoch)
        for idx_b in loader.batches_for_epoch(epoch):
            packed, scratch, _ = planner.plan_batch(
                idx_b, rng, max_gt, scratch_slots=slots)
            used = bool((packed["pass_slot"] >= 0).any())
            serial.append((packed, scratch if used else None))

    pre = D.PlanPrefetcher(planner, loader.batches_for_epoch, base, max_gt,
                           slots, workers=2, stop_epoch=2)
    try:
        got = []
        for epoch in range(3):
            out = pre.epoch_batches(epoch)
            if epoch < 2:
                assert out is not None
                got.extend(out)
            else:
                # past stop_epoch (the stage-2 recipe switch): not prefetched
                assert out is None
    finally:
        pre.close()

    assert len(got) == sum(
        len(loader.batches_for_epoch(e)) for e in range(2))
    for (p_s, s_s), (p_w, s_w) in zip(serial, got):
        assert set(p_s) == set(p_w)
        for k in p_s:
            np.testing.assert_array_equal(p_s[k], p_w[k], err_msg=k)
        assert (s_s is None) == (s_w is None)
        if s_s is not None:
            np.testing.assert_array_equal(s_s, s_w)


def test_runner_device_aug_workers_trains(aug_root, tmp_path):
    """End-to-end: a short device-aug training with the worker pool runs and
    produces the same parameters as the serial path (plans identical, so the
    whole optimization trajectory is)."""
    from agenda_tpu.detect.runner import DetectorRunner

    def run(workers, out):
        cfg = preset("real_source", "yolov8",
                     train=[DatasetSpec(aug_root, "ann.json")],
                     output_dir=str(tmp_path / out))
        cfg.runner.batch_size = 2
        cfg.runner.max_epochs = 2
        cfg.runner.val_interval = 100
        cfg.runner.close_mosaic_epochs = 0
        cfg.runner.log_interval = 100
        cfg.runner.device_aug = True
        cfg.runner.device_aug_workers = workers
        runner = DetectorRunner(cfg.build_family(), cfg.runner)
        return runner.train(cfg.build_train_dataset())

    v0 = run(0, "w0")
    v2 = run(2, "w2")
    flat0 = jax.tree_util.tree_leaves(v0["params"])
    flat2 = jax.tree_util.tree_leaves(v2["params"])
    for a, b in zip(flat0, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
