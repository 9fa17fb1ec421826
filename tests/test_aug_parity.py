"""Augmentation-constant parity vs the reference Real_Source pipeline.

Complements test_hyperparam_parity / test_flag_parity: the heavy "mix" stage
recipe (Mosaic pad, RandomAffine ranges, Albu probabilities, flip prob) is
read out of the reference config and asserted against augment.mix_stage_aug.
Skips without the mounted reference checkout.
"""

import os
import re

import pytest

REF_CFG = "/root/reference/data_annotation/configs/Real_Source/faster-rcnn.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_CFG), reason="reference checkout not mounted"
)


def test_mix_stage_matches_reference():
    from agenda_tpu.detect.augment import mix_stage_aug

    src = re.sub(r"#.*", "", open(REF_CFG).read())
    aug = mix_stage_aug()

    affine_scale = float(re.search(r"affine_scale\s*=\s*([0-9.]+)", src).group(1))
    assert aug.affine_scale == affine_scale  # 0.9

    rot = float(re.search(r"max_rotate_degree\s*=\s*([0-9.]+)", src).group(1))
    shear = float(re.search(r"max_shear_degree\s*=\s*([0-9.]+)", src).group(1))
    assert aug.max_rotate_degree == rot and aug.max_shear_degree == shear

    from agenda_tpu.detect import augment

    pad = float(re.search(r"pad_val\s*=\s*([0-9.]+)", src).group(1))
    assert augment.PAD_VAL == pad  # 114

    albu = dict(re.findall(r"type='(Blur|MedianBlur|ToGray|CLAHE)',\s*p=([0-9.]+)", src))
    assert aug.blur_prob == float(albu["Blur"])
    assert aug.median_blur_prob == float(albu["MedianBlur"])
    assert aug.to_gray_prob == float(albu["ToGray"])
    assert aug.clahe_prob == float(albu["CLAHE"])

    flip = float(re.search(r"type='RandomFlip',\s*prob=([0-9.]+)", src).group(1))
    assert aug.flip_prob == flip

    assert aug.mosaic and aug.hsv and aug.mixup_prob > 0  # pipeline composition
