"""3D axis-aligned box detection AP (DCF fork evaluation).

Re-derivation of ``util/evaluation.py`` (``DetectionMAP`` :15-328): 3D-SIS
style matching — axis-aligned IoU (jaccard) between predicted and GT boxes,
greedy one-prediction-per-GT assignment above an overlap threshold, TP/FP/FN
accumulation, per-evaluation precision/recall, and running means (the
reference's ``evaluate`` appends precision/recall per scene :84-110).
"""

from __future__ import annotations

from typing import List

import numpy as np


def intersect_volume(box_a, box_b):
    """Pairwise intersection volume, boxes ``[x1,y1,z1,x2,y2,z2]``
    (reference ``intersect_area`` :111-127)."""
    a = box_a[:, None, :]
    b = box_b[None, :, :]
    max_xyz = np.minimum(a[:, :, 3:], b[:, :, 3:])
    min_xyz = np.maximum(a[:, :, :3], b[:, :, :3])
    inter = np.clip(max_xyz - min_xyz, 0, None)
    return inter[:, :, 0] * inter[:, :, 1] * inter[:, :, 2]


def box_iou(box_a, box_b):
    """Jaccard IoU matrix ``[n_pred, n_gt]`` (reference :129-152)."""
    if box_a.shape[0] == 0 or box_b.shape[0] == 0:
        return np.zeros((box_a.shape[0], box_b.shape[0]))
    inter = intersect_volume(box_a, box_b)
    vol = lambda b: np.prod(b[:, 3:] - b[:, :3], axis=1)  # noqa: E731
    union = vol(box_a)[:, None] + vol(box_b)[None, :] - inter
    return inter / np.maximum(union, 1e-12)


def match_boxes(iou, overlap_threshold=0.5):
    """Greedy one-prediction-per-GT matching (reference
    ``compute_TP_FP_FN`` :194-240): each prediction claims its best
    still-unclaimed GT above threshold.

    Returns (tp, fp, fn) counts.
    """
    iou = iou.copy()
    iou[iou < overlap_threshold] = 0.0
    n_pred, n_gt = iou.shape
    claimed = np.zeros(n_gt, bool)
    tp = 0
    for i in range(n_pred):
        row = np.where(claimed, 0.0, iou[i])
        j = int(np.argmax(row)) if n_gt else -1
        if n_gt and row[j] > 0:
            claimed[j] = True
            tp += 1
    fp = n_pred - tp
    fn = n_gt - tp
    return tp, fp, fn


class DetectionMAP:
    """Running detection metrics across scenes (reference :15-110)."""

    def __init__(self, overlap_threshold=0.5):
        self.overlap_threshold = overlap_threshold
        self.precision: List[float] = []
        self.recall: List[float] = []
        self.tp = 0
        self.fp = 0
        self.fn = 0

    def evaluate(self, pred_boxes, gt_boxes):
        iou = box_iou(np.asarray(pred_boxes, float).reshape(-1, 6),
                      np.asarray(gt_boxes, float).reshape(-1, 6))
        tp, fp, fn = match_boxes(iou, self.overlap_threshold)
        self.tp += tp
        self.fp += fp
        self.fn += fn
        self.precision.append(tp / max(tp + fp, 1))
        self.recall.append(tp / max(tp + fn, 1))
        return tp, fp, fn

    def summary(self):
        return {
            "mean_precision": float(np.mean(self.precision))
            if self.precision else 0.0,
            "mean_recall": float(np.mean(self.recall))
            if self.recall else 0.0,
            "micro_precision": self.tp / max(self.tp + self.fp, 1),
            "micro_recall": self.tp / max(self.tp + self.fn, 1),
            "tp": self.tp, "fp": self.fp, "fn": self.fn,
        }
