"""Stage x family hyperparameter parity vs the reference mm-configs.

Parses max_epochs / train_batch_size_per_gpu / learning rate out of every
reference detector config and asserts detect/configs.HYPERPARAMS carries the
same values, so the presets the CLI exposes ARE the published recipes
(VERDICT round-1 item 5). Skips when the reference checkout is absent.
"""

import os
import re

import pytest

REF = "/root/reference/data_annotation/configs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)

STAGES = {
    "Real_Source": "real_source",
    "Synthetic_Heatmap": "synthetic_heatmap",
    "Synthetic_Target": "synthetic_target",
}
FAMILIES = ["faster-rcnn", "yolov5", "yolov8", "vitdet"]


def _strip_comments(src: str) -> str:
    return re.sub(r"#.*", "", src)


def _ref_values(stage_dir: str, family: str):
    path = os.path.join(REF, stage_dir, f"{family}.py")
    src = _strip_comments(open(path).read())
    # ViTDet configs inherit bs/epochs from the LSJ base file.
    base = re.search(r"['\"]\./(001[^'\"]+)['\"]", src)
    if base:
        src = _strip_comments(open(os.path.join(REF, stage_dir, base.group(1))).read()) \
            + "\n" + src

    def grab(pattern):
        m = re.findall(pattern, src, re.MULTILINE)
        return float(m[-1]) if m else None

    epochs = grab(r"^max_epochs\s*=\s*([0-9.]+)")
    bs = grab(r"^train_batch_size_per_gpu\s*=\s*([0-9.]+)")
    if epochs is None:
        epochs = grab(r"max_epochs\s*=\s*([0-9.]+)")
    if bs is None:
        bs = grab(r"train_batch_size_per_gpu\s*=\s*([0-9.]+)")
    lr = grab(r"^base_lr\s*=\s*([0-9.e-]+)")
    if lr is None:
        lr = grab(r"\blr\s*=\s*([0-9.e-]+)")
    return dict(
        epochs=epochs, bs=bs, lr=lr,
        lr_factor=grab(r"^lr_factor\s*=\s*([0-9.e-]+)"),
        close_mosaic=grab(r"^close_mosaic_epochs\s*=\s*([0-9]+)"),
        val_interval_stage2=grab(r"^val_interval_stage2\s*=\s*([0-9]+)"),
    )


@pytest.mark.parametrize("stage_dir", list(STAGES))
@pytest.mark.parametrize("family", FAMILIES)
def test_hyperparams_match_reference(stage_dir, family):
    from agenda_tpu.detect.configs import HYPERPARAMS

    ours = HYPERPARAMS[(STAGES[stage_dir], family)]
    ref = _ref_values(stage_dir, family)
    assert ref["epochs"] is not None and ref["bs"] is not None and ref["lr"] is not None, (
        stage_dir, family, ref)
    assert ours["epochs"] == int(ref["epochs"]), (stage_dir, family, ours, ref)
    assert ours["bs"] == int(ref["bs"]), (stage_dir, family, ours, ref)
    assert abs(ours["lr"] - ref["lr"]) < 1e-9, (stage_dir, family, ours, ref)
    # yolo-only recipe details: lr_factor schedule, mosaic-close switch
    if ref["lr_factor"] is not None and family.startswith("yolo"):
        assert ours.get("yolo_opt"), (stage_dir, family)
        assert abs(ours["lr_factor"] - ref["lr_factor"]) < 1e-9, (
            stage_dir, family, ours, ref)
    if ref["close_mosaic"] is not None:
        assert ours.get("close_mosaic", 0) == int(ref["close_mosaic"]), (
            stage_dir, family, ours, ref)
        if ref["val_interval_stage2"] is not None:
            assert ours.get("val_interval_stage2") == int(
                ref["val_interval_stage2"]), (stage_dir, family, ours, ref)
    else:
        assert ours.get("close_mosaic", 0) == 0, (stage_dir, family)
