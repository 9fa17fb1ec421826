"""GENERATION-half quality gate (VERDICT r4 #1): a procedural mini-AGenDA,
end to end, from a TRAINED tiny SD through fused DAAM heatmaps to calibrated
pseudo-label and cross-domain-detection floors.

Unlike tests/test_annotation_quality.py — whose heatmap stacks are
procedurally synthesized — every stack here comes out of the actual
pipeline: full-SD fine-tune on a procedural aerial domain pair (the
LINZ+UGRC joint-training shape), AttnDreamBooth-style token stage 1
(fg+bg tokens, cross-attention regularization) and stage 2, batched
compiled generation with per-word DAAM heatmaps through the production
CLIs, RGB stacking, Synthetic_Heatmap-stage detector training on the
GENERATED source stacks, F1-max threshold selection, pseudo-COCO on the
shifted target, refine-classifier rescue, and the final synthetic-target
detector scored on REAL target images. Ground truth for generated images
is recovered from the domain's redness invariant
(tests/mini_agenda_data.py).

Claims gated (reference: /root/reference/data_generation/README.md:34-66 +
docs/index.html tables):
  (a) the object word's DAAM heatmap mass concentrates on the rendered
      cars (lift over the uniform-area baseline),
  (b) prompt conditioning is real (no-cars campaign renders ~no cars),
  (c) the chain over REAL generated stacks clears pseudo-label P/R floors
      and refinement does not degrade them,
  (d) the paper's bottom line: an RGB detector trained on real source
      degrades on the shifted target; the AGenDA chain's synthetic-target
      detector recovers it with margin.

Calibration (scripts/calibrate_mini_agenda.py full; seeds fixed):
  2026-08-21 TPU v5e chip run A (n_gen 48, pre-area-band domain):
    src lift 1.64 (min 1.36); chain pseudo F1 0.727;
    margin 0.666 -> 0.790
  2026-08-21 TPU v5e chip run B (n_gen 64, final domain):
    src lift 1.645 (min 0.99), tgt lift 1.616 (min 1.21);
    chain src-val mAP50 1.0, pseudo P 0.850 R 0.948 F1 0.897,
    refined F1 0.910 (refine IMPROVES); margin 0.736 -> 0.994;
    no-cars campaign 0.453 cars/img vs 1.5-1.75 on car prompts.
  2026-08-21 TPU v5e chip run C (domain seed 7 — cross-seed robustness
    probe, NOT the gate's pinned seed): chain still strong (src-val
    0.851, pseudo F1 0.878, refined 0.930) but tgt lift 1.19 and margin
    +0.016 — that domain draw's source-only detector does not degrade on
    target (0.971), so the margin floor is meaningful only for the
    pinned seed-0 domain, whose source-only baseline measures 0.67-0.74.
Floors are calibrated values minus safety margin (2 independent runs at
the pinned domain seed; generation seeds deterministic).

Runtime: ~40 min on the attached chip (AGENDA_TPU_TESTS=1), ~4 h on the
single-core CPU host — env-gated like the full convergence gates.
"""

import argparse
import importlib.util
import os
import sys

import pytest

_gate = pytest.mark.skipif(
    not os.environ.get("AGENDA_GENERATION_QUALITY"),
    reason="set AGENDA_GENERATION_QUALITY=1 (~40 min on chip with "
           "AGENDA_TPU_TESTS=1, ~4 h on one CPU core); calibrated "
           "2026-08-21 on TPU v5e — see module docstring",
)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_calib():
    """Import the calibration harness as a module. Its import-time platform
    pinning matches the test env: conftest already pinned CPU (or the real
    chip under AGENDA_TPU_TESTS=1, which we forward)."""
    if os.environ.get("AGENDA_TPU_TESTS") == "1":
        os.environ["AGENDA_CALIB_TPU"] = "1"
    spec = importlib.util.spec_from_file_location(
        "mini_agenda_calib",
        os.path.join(_ROOT, "scripts", "calibrate_mini_agenda.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["mini_agenda_calib"] = mod
    spec.loader.exec_module(mod)
    return mod


@_gate
@pytest.mark.slow
def test_generation_half_quality_gate(tmp_path):
    calib = _load_calib()
    # domain_seed is PINNED: the floors are calibrated for this domain
    # draw. A cross-seed robustness run (seed 7, 2026-08-21) measured the
    # variance: tgt lift drops to 1.19 and the margin to +0.016 — not
    # because the chain weakens (pseudo F1 0.878, refine improves to
    # 0.930) but because that draw's source-only detector does not
    # degrade on target (0.971 mAP50): the engineered domain gap itself
    # is seed-dependent.
    import jax

    # bs is PER-DEVICE (the trainer CLI semantics): pin the calibrated
    # GLOBAL batch 32 across platforms (1 chip vs the 8-virtual-device
    # CPU mesh)
    per_dev_bs = max(1, 32 // jax.device_count())
    args = argparse.Namespace(
        workdir=str(tmp_path), domain_seed=0, n_train=96, resolution=64,
        vae_steps=500, sd_steps=2600, tok_steps=800, tok2_steps=400,
        tok_lr=5e-4, bs=per_dev_bs, lr=1e-3, cache_latents=True, n_gen=64,
        det_epochs=30, steps=20, guidance=1.0, model_dir=None)

    calib.phase_setupb(args)
    calib.phase_train(args)
    calib.phase_token1(args)
    calib.phase_token2(args)
    calib.phase_gentok(args)

    # -- (a) + (b): heatmap localization and prompt conditioning
    score = calib.phase_score(args)
    src, tgt = score["gen_src"], score["gen_tgt"]
    assert src["frac_with_cars"] >= 0.90, score   # calibrated 1.0
    assert tgt["frac_with_cars"] >= 0.90, score   # calibrated 1.0
    assert src["lift_mean"] >= 1.25, score        # calibrated 1.64, 1.645
    assert tgt["lift_mean"] >= 1.25, score        # calibrated 1.45, 1.616
    assert src["lift_min"] >= 0.85, score         # calibrated 1.36, 0.99
    empty = score.get("gen_tgt_empty")
    assert empty is not None, score
    # conditioning contrast as a RATIO (calibrated 0.45 vs 1.5-1.75 cars/img
    # = 0.30): a model that ignores the prompt scores ~1.0 here
    assert empty["mean_cars"] <= 0.6 * min(src["mean_cars"],
                                           tgt["mean_cars"]), score

    # -- (c): the REAL generated stacks through the production chain
    chain = calib.phase_chain(args)
    assert chain["src_val_map50"] >= 0.80, chain  # calibrated 0.985, 1.0
    assert chain["pseudo_p"] >= 0.60, chain       # calibrated 0.857, 0.850
    assert chain["pseudo_r"] >= 0.50, chain       # calibrated 0.948
    assert chain["pseudo_f1"] >= 0.60, chain      # calibrated 0.897
    # refinement must not degrade the pseudo labels (calibrated +0.013)
    assert chain["refined_f1"] >= chain["pseudo_f1"] - 0.05, chain

    # -- (d): cross-domain margin on REAL target images
    margin = calib.phase_margin(args)
    assert margin["agenda_map50"] >= margin["source_only_map50"] + 0.08, \
        margin                                    # calibrated +0.124, +0.258
    assert margin["agenda_map50"] >= 0.70, margin  # calibrated 0.790, 0.994
