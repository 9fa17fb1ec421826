from agenda_tpu.annotate.boxes import (
    complete_edge_boxes,
    iou_xyxy,
    iou_xywh,
    iou_matrix_xyxy,
)
from agenda_tpu.annotate.records import load_predictions, save_predictions
from agenda_tpu.annotate.threshold import (
    match_predictions,
    pr_f1_table,
    average_precision_101,
    select_f1_max_threshold,
)

__all__ = [
    "complete_edge_boxes",
    "iou_xyxy",
    "iou_xywh",
    "iou_matrix_xyxy",
    "load_predictions",
    "save_predictions",
    "match_predictions",
    "pr_f1_table",
    "average_precision_101",
    "select_f1_max_threshold",
]
