"""Real-pretrained-checkpoint smoke test, gated on file presence.

The pipeline's parity runs start from the reference's own COCO-pretrained mm
checkpoints (``load_from``, e.g. ``Real_Source/faster-rcnn.py:37``). This
deployment is zero-egress, so those files are usually absent — but whenever
any file from ``scripts/fetch_pretrained.py``'s manifest is on disk
(sneakernet copy into $AGENDA_TPU_CKPT_DIR or ./ckpts), this test proves the
real import path end-to-end: load_torch_checkpoint + import_detector_weights
reach >=95% coverage of every backbone/neck module and the imported model
runs a finite forward (VERDICT round-2 item 8).
"""

import os

import numpy as np
import pytest

# manifest names from scripts/fetch_pretrained.py, keyed by family
MANIFEST = {
    "faster-rcnn": "faster_rcnn_r50_fpn_2x_coco.pth",
    "yolov5": "yolov5_m_coco.pth",
    "yolov8": "yolov8_m_coco.pth",
    "vitdet": "vitdet_vit_b_mae_coco.pth",
}

# backbone + neck module roots per family (heads are expected to shape-skip:
# COCO has 80 classes, the pipeline 1)
BACKBONE_NECK = {
    "faster-rcnn": [("backbone",), ("fpn",)],
    "vitdet": [("backbone",), ("fpn",)],
    "yolov5": [("stem",), ("down1",), ("down2",), ("down3",), ("down4",),
               ("c3_1",), ("c3_2",), ("c3_3",), ("c3_4",), ("sppf",),
               ("neck_c3_1",), ("neck_c3_2",), ("neck_c3_3",), ("neck_c3_4",),
               ("reduce4",), ("reduce5",), ("neck_down3",), ("neck_down4",)],
    "yolov8": [("stem",), ("down1",), ("down2",), ("down3",), ("down4",),
               ("c2f_1",), ("c2f_2",), ("c2f_3",), ("c2f_4",), ("sppf",),
               ("neck_p3",), ("neck_p4",), ("neck_p4b",), ("neck_p5",),
               ("neck_down3",), ("neck_down4",)],
}


def _ckpt_dirs():
    d = os.environ.get("AGENDA_TPU_CKPT_DIR")
    cands = [d] if d else []
    cands += [os.path.join(os.path.dirname(__file__), "..", "ckpts"),
              "/root/ckpts"]
    return [c for c in cands if c and os.path.isdir(c)]


def _find(name):
    for d in _ckpt_dirs():
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def _run_smoke(family, path):
    """load_torch_checkpoint + import + coverage floors + finite forward."""
    import jax
    import jax.numpy as jnp

    from agenda_tpu.detect.families import build_family
    from agenda_tpu.io.torch_import import (
        import_detector_weights,
        load_torch_checkpoint,
    )

    fam = build_family(family, model=dict(img_size=128, max_gt=8))
    variables = fam.init_variables(jax.random.key(0))
    sd = load_torch_checkpoint(path)
    variables, report = import_detector_weights(variables, sd, family)

    assert len(report.imported) > 100, len(report.imported)
    for prefix in BACKBONE_NECK[family]:
        cov = report.coverage(variables, prefix)
        assert cov >= 0.95, (family, prefix, cov)

    boxes, scores, valid = jax.jit(fam.predict_fn)(
        variables, jnp.zeros((1, 128, 128, 3)))
    assert np.isfinite(np.asarray(boxes)).all()
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.parametrize("family", sorted(MANIFEST))
def test_real_checkpoint_import_and_forward(family):
    path = _find(MANIFEST[family])
    if path is None:
        pytest.skip(f"{MANIFEST[family]} not present (zero-egress; copy it "
                    f"into $AGENDA_TPU_CKPT_DIR to enable)")
    pytest.importorskip("torch")
    _run_smoke(family, path)


def test_smoke_harness_self_check(tmp_path):
    """CI-proof of the harness itself: fabricate an mm-schema faster-rcnn
    .pth (COCO-sized heads included) and run the identical smoke path."""
    torch = pytest.importorskip("torch")
    import jax

    import test_torch_import as tti
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.io.diffusers_io import _flatten

    fam = build_family("faster-rcnn", model=dict(img_size=128, max_gt=8))
    variables = fam.init_variables(jax.random.key(0))
    fp = dict(_flatten(variables["params"]))
    fb = dict(_flatten(variables.get("batch_stats", {})))

    sd = tti._invert_resnet(fp, fb)
    for i in range(4):
        for mm, ours in ((f"neck.lateral_convs.{i}.conv", f"lateral_{i}"),
                         (f"neck.fpn_convs.{i}.conv", f"fpn_{i}")):
            sd[mm + ".weight"] = tti._conv_torch(fp[("fpn", ours, "kernel")].shape)
            sd[mm + ".bias"] = tti._seq(fp[("fpn", ours, "bias")].shape)
    for mm, ours in (("rpn_head.rpn_conv", "rpn_conv"),
                     ("rpn_head.rpn_cls", "rpn_cls"),
                     ("rpn_head.rpn_reg", "rpn_reg")):
        sd[mm + ".weight"] = tti._conv_torch(fp[("rpn", ours, "kernel")].shape)
        sd[mm + ".bias"] = tti._seq(fp[("rpn", ours, "bias")].shape)
    in1, out1 = fp[("box_head", "fc1", "kernel")].shape
    sd["roi_head.bbox_head.shared_fcs.0.weight"] = tti._seq((out1, in1))
    sd["roi_head.bbox_head.shared_fcs.0.bias"] = tti._seq((out1,))
    in2, out2 = fp[("box_head", "fc2", "kernel")].shape
    sd["roi_head.bbox_head.shared_fcs.1.weight"] = tti._seq((out2, in2))
    sd["roi_head.bbox_head.shared_fcs.1.bias"] = tti._seq((out2,))
    sd["roi_head.bbox_head.fc_cls.weight"] = tti._seq((81, 1024))
    sd["roi_head.bbox_head.fc_cls.bias"] = tti._seq((81,))
    sd["roi_head.bbox_head.fc_reg.weight"] = tti._seq((320, 1024))
    sd["roi_head.bbox_head.fc_reg.bias"] = tti._seq((320,))

    # _seq values are shape fingerprints (arange) — far too large to run a
    # numerically sane forward. Keep the shapes, re-draw small values.
    rng = np.random.RandomState(0)
    def small(k, v):
        if k.endswith("running_var"):
            return np.ones(np.shape(v), np.float32)
        if k.endswith("running_mean"):
            return np.zeros(np.shape(v), np.float32)
        return rng.normal(0, 0.02, np.shape(v)).astype(np.float32)

    path = str(tmp_path / MANIFEST["faster-rcnn"])
    torch.save({"state_dict": {k: torch.from_numpy(small(k, v))
                               for k, v in sd.items()},
                "meta": {"fabricated": True}}, path)
    _run_smoke("faster-rcnn", path)
