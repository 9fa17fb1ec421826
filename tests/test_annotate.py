"""Annotation-stage tests: edge-completion goldens vs scalar reference math,
IoU, greedy matching/AP/F1 threshold, COCO builders, refine bucketing."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from agenda_tpu.annotate.boxes import complete_edge_boxes, iou_matrix_xyxy, iou_xywh, iou_xyxy
from agenda_tpu.annotate.coco import (
    build_empty_annotation,
    convert_pseudo_annotations,
    evaluate_pseudo_annotations,
    predictions_to_pseudo_coco,
    pseudo_coco_filename,
)
from agenda_tpu.annotate.refine import (
    append_positive_test_annotations,
    construct_data,
    macro_f1_binary,
)
from agenda_tpu.annotate.threshold import (
    average_precision_101,
    match_predictions,
    pr_f1_table,
    select_f1_max_threshold,
)


def scalar_edge_complete(l, t, r, b, size=(112, 112), box=42.36, mode="extend"):
    """Literal transcription of the reference's per-box math
    (refine_label.py:58-111 for 'extend', ConvertPseudoAnn.py:36-63 for 'clamp')."""
    margin = box / 2 - 1
    xc, yc = (l + r) / 2, (t + b) / 2
    v = "left" if xc < margin else ("right" if xc > size[0] - margin else None)
    hh = "top" if yc < margin else ("bottom" if yc > size[1] - margin else None)
    if mode == "extend":
        if v == "left":
            r_f, l_f = r, r - box
        elif v == "right":
            l_f, r_f = l, l + box
        else:
            l_f, r_f = l, r
        if hh == "top":
            b_f, t_f = b, b - box
        elif hh == "bottom":
            t_f, b_f = t, t + box
        else:
            t_f, b_f = t, b
        hi_x, hi_y = size[0] - 1, size[1] - 1
    else:
        if v == "left":
            r_f, l_f = r, 0
        elif v == "right":
            l_f, r_f = l, size[0]
        else:
            l_f, r_f = l, r
        if hh == "top":
            b_f, t_f = b, 0
        elif hh == "bottom":
            t_f, b_f = t, size[1]
        else:
            t_f, b_f = t, b
        hi_x, hi_y = size[0], size[1]
    xcf, ycf = (l_f + r_f) / 2, (t_f + b_f) / 2
    return (
        max(0, xcf - box / 2),
        max(0, ycf - box / 2),
        min(xcf + box / 2, hi_x),
        min(ycf + box / 2, hi_y),
    )


CASES = [
    (50, 50, 90, 90),      # interior
    (0, 40, 20, 80),       # trimmed left
    (95, 40, 112, 80),     # trimmed right
    (40, 0, 80, 18),       # trimmed top
    (40, 100, 80, 112),    # trimmed bottom
    (0, 0, 15, 12),        # corner
    (100, 102, 112, 112),  # opposite corner
]


@pytest.mark.parametrize("mode", ["extend", "clamp"])
def test_edge_completion_golden(mode):
    boxes = np.array(CASES, np.float64)
    got = complete_edge_boxes(boxes, (112, 112), 42.36, mode=mode)
    for i, (l, t, r, b) in enumerate(CASES):
        want = scalar_edge_complete(l, t, r, b, mode=mode)
        np.testing.assert_allclose(got[i], want, atol=1e-9, err_msg=f"{mode} case {i}")


def test_iou_functions():
    a = [0, 0, 10, 10]
    b = [5, 5, 15, 15]
    assert abs(iou_xyxy(a, b) - 25 / 175) < 1e-9
    assert iou_xyxy(a, [20, 20, 30, 30]) == 0.0
    # xywh variant (EvaluatePseudoAnn math)
    assert abs(iou_xywh([0, 0, 10, 10], [5, 5, 10, 10]) - 25 / 175) < 1e-9
    m = iou_matrix_xyxy(np.array([a]), np.array([b, [20, 20, 30, 30]]))
    np.testing.assert_allclose(m, [[25 / 175, 0.0]], atol=1e-9)


def make_records():
    """2 images, known TP/FP structure."""
    return [
        {
            "img_path": "/x/0.png",
            "gt_instances": {"bboxes": np.array([[10, 10, 50, 50], [60, 60, 100, 100]]),
                             "labels": np.array([0, 0])},
            "pred_instances": {
                "bboxes": np.array([[12, 12, 52, 52], [0, 0, 20, 20], [61, 61, 99, 99]]),
                "scores": np.array([0.9, 0.8, 0.6]),
                "labels": np.array([0, 0, 0]),
            },
        },
        {
            "img_path": "/x/1.png",
            "gt_instances": {"bboxes": np.array([[30, 30, 70, 70]]), "labels": np.array([0])},
            "pred_instances": {
                "bboxes": np.array([[30, 30, 70, 70]]),
                "scores": np.array([0.7]),
                "labels": np.array([0]),
            },
        },
    ]


def test_match_and_threshold():
    records = make_records()
    scores, is_tp, n_gt = match_predictions(records)
    assert n_gt == 3
    assert len(scores) == 4
    # 0.9 TP, 0.8 FP, 0.6 TP, 0.7 TP
    by_score = dict(zip(scores.tolist(), is_tp.tolist()))
    assert by_score[0.9] and by_score[0.6] and by_score[0.7] and not by_score[0.8]

    table = pr_f1_table(scores, is_tp, n_gt)
    # sorted scores: .9 .8 .7 .6 -> tp 1,1,2,3; precision 1,.5,2/3,.75; recall 1/3,1/3,2/3,1
    np.testing.assert_allclose(table["precision"], [1, 0.5, 2 / 3, 0.75])
    np.testing.assert_allclose(table["recall"], [1 / 3, 1 / 3, 2 / 3, 1])

    sel = select_f1_max_threshold(records)
    # F1: .5, .4, 2/3, 6/7 -> max at score .6
    assert abs(sel["threshold"] - 0.6) < 1e-9
    assert abs(sel["f1_max"] - 6 / 7) < 1e-9

    # AP golden: p=0.75 available up to r=1 with higher p at low recall
    p = np.concatenate([table["precision"], [0]])
    r = np.concatenate([table["recall"], [1]])
    want = 0.0
    for rv in np.linspace(0, 1, 101):
        want += np.max(p[r >= rv]) / 101
    assert abs(sel["ap"] - want) < 1e-12


def test_predictions_to_pseudo_coco_and_filename():
    records = make_records()
    coco = predictions_to_pseudo_coco(records, thresh_conf=0.65)
    assert len(coco["images"]) == 2
    # kept: 0.9, 0.8 (image 0) and 0.7 (image 1)
    assert len(coco["annotations"]) == 3
    for ann in coco["annotations"]:
        w, h = ann["bbox"][2], ann["bbox"][3]
        assert w <= 42.36 + 1e-9 and h <= 42.36 + 1e-9
        assert ann["iscrowd"] == 0 and ann["category_id"] == 1
    name = pseudo_coco_filename("FasterRCNN", "SynLINZ-STACKDAAMHeatMaps", 0.6)
    assert name == ("annotations_coco_FakeBBoxes:42.36px_ForIoU:0.500_"
                    "Pseudo-FasterRCNN-SynLINZ-STACKDAAMHeatMaps-ConfThresh:0.60.json")


def test_convert_and_evaluate_pseudo(tmp_path):
    gt = {
        "categories": [{"id": 1, "name": "small"}],
        "images": [{"id": 0, "file_name": "0.png", "width": 112, "height": 112}],
        "annotations": [
            {"id": 0, "image_id": 0, "bbox": [10, 10, 42.36, 42.36], "category_id": 1},
            {"id": 1, "image_id": 0, "bbox": [60, 60, 42.36, 42.36], "category_id": 1},
        ],
    }
    pred = {
        "categories": gt["categories"],
        "images": gt["images"],
        "annotations": [
            {"id": 0, "image_id": 0, "bbox": [11, 11, 41, 41], "category_id": 1},
            {"id": 1, "image_id": 0, "bbox": [0, 0, 10, 10], "category_id": 1},
        ],
    }
    conv = convert_pseudo_annotations(pred)
    assert all(a["score"] == 1.0 for a in conv["annotations"])
    # first box interior -> recentered 42.36 square
    b0 = conv["annotations"][0]["bbox"]
    assert abs(b0[2] - 42.36) < 1e-9 and abs(b0[3] - 42.36) < 1e-9

    p, r = evaluate_pseudo_annotations(gt, conv)
    assert p == 0.5 and r == 0.5  # 1 TP of 2 preds; 1 of 2 GT found


def test_build_empty_annotation(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in (3, 0, 10):
        Image.new("RGB", (112, 112)).save(img_dir / f"{i}.png")
    template = {
        "categories": [{"id": 1, "name": "small"}],
        "images": [{"id": 99, "file_name": "z.png", "width": 5, "height": 5, "extra": 1}],
        "annotations": [{"id": 0}],
    }
    tpath = tmp_path / "template.json"
    with open(tpath, "w") as f:
        json.dump(template, f)
    coco = build_empty_annotation(str(img_dir), str(tpath))
    assert [im["file_name"] for im in coco["images"]] == ["0.png", "3.png", "10.png"]
    assert all(im["width"] == 112 and im["height"] == 112 for im in coco["images"])
    assert coco["images"][0]["extra"] == 1  # template keys carried over
    assert coco["annotations"] == []


def test_construct_data_bucketing(tmp_path):
    base = tmp_path / "rgb"
    base.mkdir()
    Image.new("RGB", (112, 112), (100, 100, 100)).save(base / "0.png")
    records = [{
        "img_path": "/whatever/0.png",
        "pred_instances": {
            # score-desc order like the pkl; 0.5 is top-1 -> positive despite < pos_thresh
            "scores": np.array([0.5, 0.4, 0.2, 0.01]),
            "labels": np.array([0, 0, 0, 0]),
            "bboxes": np.array([
                [10, 10, 50, 50],
                [60, 60, 100, 100],  # mid band -> unlabeled test
                [20, 60, 60, 100],   # < neg 0.35 -> negative
                [0, 0, 30, 30],      # < hard 0.05 -> dropped
            ]),
        },
    }]
    data = construct_data(records, pos_thresh=0.75, neg_thresh=0.35,
                          hard_neg_thresh=0.05, rgb_image_base_path=str(base))
    assert data.train_labels == [1, 0]
    assert len(data.test_anns) == 1 and data.test_anns[0]["label"] == -1
    # top-1 became a COCO annotation with label 1
    assert len(data.annotations_coco["annotations"]) == 1
    assert data.annotations_coco["annotations"][0]["label"] == 1

    coco = append_positive_test_annotations(data.annotations_coco, data.test_anns, [0])
    assert len(coco["annotations"]) == 2
    assert [a["id"] for a in coco["annotations"]] == [0, 1]
    assert sorted(a["label"] for a in coco["annotations"]) == [-1, 1]


def test_macro_f1():
    preds = np.array([1, 1, 0, 0, 1])
    labels = np.array([1, 0, 0, 0, 1])
    # class1: tp2 fp1 fn0 -> f1 = 4/5; class0: tp2 fp0 fn1 -> 4/5
    assert abs(macro_f1_binary(preds, labels) - 0.8) < 1e-9


def test_prediction_ious_alignment():
    """prediction_ious aligns with match_predictions' flattened per-image
    score-desc ordering and reports best IoU vs any same-image GT
    (VisualizeTestResults.ipynb cell 20's IoU column)."""
    from agenda_tpu.annotate.boxes import iou_matrix_xyxy
    from agenda_tpu.annotate.threshold import prediction_ious

    records = make_records()
    scores, is_tp, _ = match_predictions(records)
    ious = prediction_ious(records)
    assert ious.shape == scores.shape
    # every matched TP clears the gate; the 0.8-score FP box overlaps no GT
    assert (ious[is_tp] >= 0.5).all()
    exp0 = iou_matrix_xyxy(
        records[0]["gt_instances"]["bboxes"].astype(float),
        records[0]["pred_instances"]["bboxes"].astype(float),
    ).max(axis=0)
    np.testing.assert_allclose(ious[:3], exp0)  # img0 already score-desc
    assert ious[1] < 0.5  # the [0,0,20,20] FP sits under the IoU gate
    # exact-match pred in img1
    assert abs(ious[3] - 1.0) < 1e-12


def test_select_threshold_cli_plot(tmp_path):
    """--plot renders the notebook analysis figures headlessly
    (VisualizeTestResults.ipynb cells 18-32)."""
    from agenda_tpu.annotate.records import save_predictions
    from agenda_tpu.cli.select_threshold import main as st_main

    pkl = str(tmp_path / "pred.pkl")
    save_predictions(make_records(), pkl)
    png = str(tmp_path / "analysis.png")
    res = st_main(["--prediction_pkl", pkl, "--plot", png])
    assert os.path.exists(png) and os.path.getsize(png) > 5000
    assert abs(res["threshold"] - 0.6) < 1e-9


def test_select_threshold_cli_sample_overlays(tmp_path):
    """--visualize-samples writes the notebook's TP/FN/FP sample overlays
    (VisualizeTestResults.ipynb cells 26/29/32); works with real image files
    and degrades gracefully when img_path is missing."""
    from PIL import Image

    from agenda_tpu.annotate.records import save_predictions
    from agenda_tpu.cli.select_threshold import main as st_main

    records = make_records()
    # Give the first record a real image so the overlay draws on pixels.
    img = str(tmp_path / "img0.png")
    Image.fromarray(np.zeros((112, 112, 3), np.uint8)).save(img)
    records[0]["img_path"] = img
    pkl = str(tmp_path / "pred.pkl")
    save_predictions(records, pkl)
    out = str(tmp_path / "samples")
    st_main(["--prediction_pkl", pkl, "--visualize-samples", out])
    # records contain TPs and FPs at the F1-max threshold (0.6): both PNGs.
    assert os.path.getsize(os.path.join(out, "sample_TP.png")) > 3000
    assert os.path.getsize(os.path.join(out, "sample_FP.png")) > 3000
