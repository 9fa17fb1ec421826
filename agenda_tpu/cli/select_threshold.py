"""CLI: F1-max confidence-threshold selection + pseudo-COCO export.

Replaces the two reference notebooks with one scriptable tool:

- analysis mode (VisualizeTestResults.ipynb): greedy IoU>=0.5 matching,
  101-pt AP, argmax-F1 threshold, optional P/R/F1-vs-score table dump;
- conversion mode (ConvertPredToCOCOPseudoAnnotations.ipynb): with
  ``--emit-pseudo-coco``, writes the pseudo-label COCO at the chosen (or
  selected) threshold using the recipe-encoding filename;
- ``--plot out.png`` renders the notebook's analysis figures (PR curve,
  P/R/F1 vs confidence with the selected threshold marked, per-image
  TP/FP/FN scatter — VisualizeTestResults.ipynb cells 18-32) headlessly.
"""

from __future__ import annotations

import argparse
import json
import os

from agenda_tpu.annotate.coco import (
    predictions_to_pseudo_coco,
    pseudo_coco_filename,
    save_coco,
)
from agenda_tpu.annotate.records import load_predictions
from agenda_tpu.annotate.threshold import (
    average_precision_101,
    match_predictions,
    pr_f1_table,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Threshold selection / pseudo-COCO export.")
    p.add_argument("--prediction_pkl", type=str, required=True)
    p.add_argument("--iou-thresh", type=float, default=0.5)
    p.add_argument("--thresh-conf", type=float, default=None,
                   help="Use this confidence threshold instead of F1-max.")
    p.add_argument("--emit-pseudo-coco", action="store_true")
    p.add_argument("--out-dir", type=str, default=None,
                   help="Output dir for the pseudo COCO (default: alongside the pkl).")
    p.add_argument("--detector-tag", type=str, default="FasterRCNN")
    p.add_argument("--dataset-tag", type=str, default="SynLINZ-STACKDAAMHeatMaps")
    p.add_argument("--bboxes-size-px", type=float, default=42.36)
    p.add_argument("--image-size", type=int, default=112)
    p.add_argument("--table-out", type=str, default=None,
                   help="Write the P/R/F1-vs-score table as JSON here.")
    p.add_argument("--result-out", type=str, default=None,
                   help="Write the analysis result (ap, f1_max, threshold) as "
                        "JSON here — the pipeline orchestrator reads the "
                        "selected threshold from it.")
    p.add_argument("--plot", type=str, default=None,
                   help="Write the analysis figures (PR curve, P/R/F1 vs "
                        "confidence, per-image TP/FP/FN scatter) to this PNG.")
    p.add_argument("--visualize-samples", type=str, default=None, metavar="DIR",
                   help="Write sample_TP/FN/FP.png detection overlays (GT "
                        "dashed, preds colored by TP/FP at the selected "
                        "threshold) — VisualizeTestResults.ipynb cells 26-32.")
    p.add_argument("--sample-seed", type=int, default=0,
                   help="Seed for the random sample choice in "
                        "--visualize-samples (notebook: random.choice).")
    return p.parse_args(argv)


def _render_plots(path, table, result, records, iou_thresh):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from agenda_tpu.annotate.threshold import match_predictions, prediction_ious

    fig, axes = plt.subplots(1, 4, figsize=(20, 4.2))

    ax = axes[0]
    ax.plot(table["recall"], table["precision"], lw=1.5)
    ax.set_xlabel("recall"), ax.set_ylabel("precision")
    ax.set_title(f"PR curve (AP={result['ap']:.3f})")
    ax.set_xlim(0, 1), ax.set_ylim(0, 1.02), ax.grid(alpha=0.3)

    ax = axes[1]
    ax.plot(table["score"], table["precision"], label="precision", lw=1.2)
    ax.plot(table["score"], table["recall"], label="recall", lw=1.2)
    ax.plot(table["score"], table["f1"], label="F1", lw=1.6)
    ax.axvline(result["threshold"], color="k", ls="--", lw=1,
               label=f"F1-max thr={result['threshold']:.3f}")
    ax.set_xlabel("confidence"), ax.set_title("P/R/F1 vs confidence")
    ax.legend(fontsize=8), ax.grid(alpha=0.3)

    # per-image TP/FP/FN at the selected threshold (notebook cells 18-32)
    ax = axes[2]
    tps, fps, fns = [], [], []
    for r in records:
        scores_i, is_tp_i, n_gt_i = match_predictions([r], iou_thresh)
        keep = scores_i >= result["threshold"]
        tp = int(is_tp_i[keep].sum())
        tps.append(tp)
        fps.append(int(keep.sum()) - tp)
        fns.append(n_gt_i - tp)
    idx = np.arange(len(records))
    ax.scatter(idx, tps, s=8, label="TP", color="#2a9d3a")
    ax.scatter(idx, fps, s=8, label="FP", color="#d62728", marker="x")
    ax.scatter(idx, fns, s=8, label="FN", color="#1f77b4", marker="^")
    ax.set_xlabel("image index"), ax.set_title("per-image TP/FP/FN @ thr")
    ax.legend(fontsize=8), ax.grid(alpha=0.3)

    # score-vs-GT-IoU distribution of ALL predictions (notebook cell 20):
    # TPs green, non-matched magenta, threshold + IoU-gate crosshairs.
    ax = axes[3]
    scores_all, is_tp_all, _ = match_predictions(records, iou_thresh)
    ious_all = prediction_ious(records)
    ax.scatter(scores_all[is_tp_all], ious_all[is_tp_all], s=6, alpha=0.35,
               edgecolor="none", color="#2a9d3a",
               label=f"Positive ({int(is_tp_all.sum()):,d})")
    ax.scatter(scores_all[~is_tp_all], ious_all[~is_tp_all], s=6, alpha=0.35,
               edgecolor="none", color="magenta",
               label=f"Negative ({int((~is_tp_all).sum()):,d})")
    ax.axvline(result["threshold"], color="k", ls="--", lw=1)
    ax.axhline(iou_thresh, color="k", ls="--", lw=1)
    ax.set_xlabel("confidence score"), ax.set_ylabel("GT IoU")
    ax.set_xlim(-0.05, 1.05), ax.set_ylim(-0.05, 1.05)
    ax.set_title("predictions distribution")
    ax.legend(fontsize=8, title="Prediction Type"), ax.grid(alpha=0.3)

    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print(f"wrote {path}")


def _render_sample_overlays(out_dir, records, threshold, iou_thresh, seed):
    """Per-category (TP / FN / FP) sample overlays, matching the notebook's
    cells 26/29/32: one random image containing that outcome, GT boxes
    dashed, predictions >= threshold colored lime (TP) / red (FP);
    below-threshold TPs red like the notebook's cell-26 coloring."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from PIL import Image

    from agenda_tpu.annotate.threshold import match_predictions

    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)

    per_img = []
    for r in records:
        scores_i, is_tp_i, n_gt_i = match_predictions([r], iou_thresh)
        keep = scores_i >= threshold
        tp = int(is_tp_i[keep].sum())
        per_img.append({
            "rec": r, "tp": tp, "fp": int(keep.sum()) - tp,
            "fn": n_gt_i - tp,
        })

    def draw(rec, path, title):
        img = None
        if rec.get("img_path") and os.path.exists(rec["img_path"]):
            img = np.asarray(Image.open(rec["img_path"]).convert("RGB"))
        fig, ax = plt.subplots(1, 1, figsize=(6, 6))
        if img is not None:
            ax.imshow(img)
        gt = rec.get("gt_instances") or {}
        for b in np.asarray(gt.get("bboxes", np.zeros((0, 4)))):
            x0, y0, x1, y1 = b
            ax.plot([x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0],
                    c="cyan", ls="--", lw=1)
            ax.scatter([(x0 + x1) / 2], [(y0 + y1) / 2], c="cyan", marker="x", lw=1)
        pred = rec.get("pred_instances") or {}
        boxes = np.asarray(pred.get("bboxes", np.zeros((0, 4))))
        scores = np.asarray(pred.get("scores", np.zeros((0,))))
        scores_i, is_tp_i, _ = match_predictions([rec], iou_thresh)
        # match_predictions sorts by score desc; re-sort boxes the same way
        order = np.argsort(-scores, kind="stable")
        for b, s, tp in zip(boxes[order], scores[order], is_tp_i):
            if s < threshold:
                continue
            color = "lime" if tp else "red"
            x0, y0, x1, y1 = b
            ax.plot([x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0], c=color, lw=1.2)
        ax.set_title(title, fontsize=10)
        ax.set_axis_off()
        fig.tight_layout()
        fig.savefig(path, dpi=110)
        plt.close(fig)
        print(f"wrote {path}")

    for cat in ("tp", "fn", "fp"):
        cands = [e for e in per_img if e[cat] > 0]
        if not cands:
            print(f"no {cat.upper()} sample at threshold {threshold:.3f}")
            continue
        e = cands[rng.randint(len(cands))]
        draw(e["rec"], os.path.join(out_dir, f"sample_{cat.upper()}.png"),
             f"{cat.upper()} sample @ thr={threshold:.3f} "
             f"(TP={e['tp']} FP={e['fp']} FN={e['fn']})")


def main(argv=None):
    args = parse_args(argv)
    records = load_predictions(args.prediction_pkl)

    result = {}
    has_gt = any(r.get("gt_instances") for r in records)
    if has_gt:
        scores, is_tp, n_gt = match_predictions(records, args.iou_thresh)
        table = pr_f1_table(scores, is_tp, n_gt)
        ap = average_precision_101(table["precision"], table["recall"])
        import numpy as np

        i = int(np.argmax(table["f1"]))
        result = {"ap": ap, "f1_max": float(table["f1"][i]),
                  "threshold": float(table["score"][i]), "n_gt": n_gt,
                  "n_pred": int(len(scores))}
        print(f"AP: {ap:.4}")
        print(f"F1_max: {result['f1_max']:.4f} | Score thresh.: {result['threshold']:.4f}")
        if args.table_out:
            with open(args.table_out, "w") as f:
                json.dump({k: v.tolist() for k, v in table.items()}, f)
        if args.result_out:
            with open(args.result_out, "w") as f:
                json.dump(result, f)
        if args.plot:
            _render_plots(args.plot, table, result, records, args.iou_thresh)
        if args.visualize_samples:
            _render_sample_overlays(args.visualize_samples, records,
                                    result["threshold"], args.iou_thresh,
                                    args.sample_seed)
    elif args.thresh_conf is None and args.emit_pseudo_coco:
        raise ValueError("No gt_instances in records: pass --thresh-conf explicitly.")

    if args.emit_pseudo_coco:
        thresh = args.thresh_conf if args.thresh_conf is not None else result["threshold"]
        coco = predictions_to_pseudo_coco(
            records, thresh, args.bboxes_size_px,
            (args.image_size, args.image_size),
        )
        out_dir = args.out_dir or os.path.dirname(os.path.abspath(args.prediction_pkl))
        name = pseudo_coco_filename(args.detector_tag, args.dataset_tag, thresh,
                                    args.bboxes_size_px, args.iou_thresh)
        path = os.path.join(out_dir, name)
        save_coco(coco, path)
        print(f"wrote {path} ({len(coco['annotations'])} annotations)")
    return result


if __name__ == "__main__":
    main()
