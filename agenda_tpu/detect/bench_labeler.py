"""Quick-trained stage-3 labeler for the composed bench (VERDICT r4 #4).

Round 4's composed bench labeled the generated heatmap stacks with a
RANDOM-weight yolov8 and cutoffs below its score floor, so ~56 boxes/img of
noise flowed through the stage-4 per-box math (~5x the 1-10 boxes/img a
trained detector passes at the production F1-max threshold). This module
makes the annotation half's operating point real:

- quick-trains the tiny yolov8 on the procedural heatmap domain
  (io/procedural.py — the same distribution the annotation-chain quality
  gate trains on) at the Synthetic_Heatmap 128-px geometry
  (/root/reference/data_annotation/configs/Synthetic_Heatmap/yolov8.py);
- calibrates the F1-max confidence threshold on a held-out labeled val set
  (VisualizeTestResults.ipynb cell 17 role);
- caches weights + threshold under .bench_cache/ so subsequent bench runs
  skip the ~2-4 min train.

The bench then clips that threshold into the score band that passes 1-10
boxes/img on the actual generated stacks (the random-weight SD produces
arbitrary score distributions; a real campaign's trained SD would not need
the clip) and reports the operating point in the breakdown.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Tuple

_META = "stack_labeler_meta.json"
_CKPT = "stack_labeler.safetensors"

MODEL_KW = dict(img_size=128, max_gt=8)


def _domain_fingerprint() -> str:
    """sha1 over the procedural-domain builder source: a change to the
    training distribution must invalidate the cached labeler+threshold
    (they were calibrated against the old distribution)."""
    import hashlib
    import inspect

    from agenda_tpu.io import procedural

    return hashlib.sha1(
        inspect.getsource(procedural).encode()).hexdigest()[:16]


def prepare_stack_labeler(cache_dir: str, *, retrain: bool = False,
                          epochs: int = 30, log=print) -> Tuple[object, dict, float]:
    """Returns (family, variables, f1max_threshold); trains + caches on miss."""
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import load_variables, save_variables

    os.makedirs(cache_dir, exist_ok=True)
    meta_path = os.path.join(cache_dir, _META)
    ckpt_path = os.path.join(cache_dir, _CKPT)
    fam = build_family("yolov8", model=dict(MODEL_KW))
    domain_sha = _domain_fingerprint()

    if not retrain and os.path.exists(meta_path) and os.path.exists(ckpt_path):
        meta = json.load(open(meta_path))
        if (meta.get("model_kw") == MODEL_KW and meta.get("epochs") == epochs
                and meta.get("domain_sha") == domain_sha):
            log(f"# stack labeler: cached (thr={meta['threshold']:.3f} "
                f"ap={meta['ap']:.3f})")
            return fam, load_variables(ckpt_path), float(meta["threshold"])

    from agenda_tpu.cli import select_threshold
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig
    from agenda_tpu.io.procedural import make_heatmap_domain

    log(f"# stack labeler: quick-training yolov8-128 on the procedural "
        f"heatmap domain ({epochs} epochs)...")
    with tempfile.TemporaryDirectory(prefix="bench_lab_") as root:
        tr = os.path.join(root, "train")
        va = os.path.join(root, "val")
        os.makedirs(tr), os.makedirs(va)
        make_heatmap_domain(tr, 48, seed=0, noise=10, p_dim=0.05, p_spurious=0.1)
        make_heatmap_domain(va, 16, seed=7, noise=10, p_dim=0.05, p_spurious=0.1)
        train_ds = CocoDetDataset(tr, "ann.json", "daam_stack_heatmaps/",
                                  img_scale=(128, 128), max_gt=8, train=True)
        val_ds = CocoDetDataset(va, "ann.json", "daam_stack_heatmaps/",
                                img_scale=(128, 128), max_gt=8, train=False)
        cfg = RunnerConfig(output_dir=os.path.join(root, "work"),
                           max_epochs=epochs, batch_size=2, lr=0.01,
                           val_interval=1000, warmup_iters=20,
                           log_interval=100, lr_milestones=(0.7,))
        runner = DetectorRunner(fam, cfg)
        variables = runner.train(train_ds)
        pkl = os.path.join(root, "val_pred.pkl")
        runner.test(variables, val_ds, out_pkl=pkl)
        res = select_threshold.main(["--prediction_pkl", pkl])
        save_variables(ckpt_path, variables)
        with open(meta_path, "w") as f:
            json.dump({"threshold": res["threshold"], "ap": res["ap"],
                       "f1_max": res["f1_max"], "model_kw": MODEL_KW,
                       "epochs": epochs, "domain_sha": domain_sha}, f)
        log(f"# stack labeler: trained (val AP {res['ap']:.3f}, F1-max thr "
            f"{res['threshold']:.3f}) -> cached in {cache_dir}")
        return fam, variables, float(res["threshold"])
