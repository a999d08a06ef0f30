"""COCO-style detection evaluation — counterpart of maskrcnn_benchmark's
coco_eval (reference src/thirdparty/mask_rcnn/maskrcnn_benchmark/data/
datasets/evaluation/coco/coco_eval.py, which defers to pycocotools) in
plain numpy: greedy per-category matching at IoU thresholds 0.5:0.95:0.05
and 101-point interpolated average precision, the COCOeval 'bbox' protocol
core (no crowd/area-range handling — annotations here are already
filtered the way the data pipeline loads them).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 0.955, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU (continuous convention, matching
    pycocotools for bbox given xyxy inputs)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-12)


def _ap_from_matches(scores, matched, n_gt) -> float:
    """101-point interpolated AP (COCOeval.accumulate semantics)."""
    if n_gt == 0:
        return np.nan
    order = np.argsort(-np.asarray(scores, np.float64), kind="mergesort")
    tp = np.asarray(matched, np.float64)[order]
    fp = 1.0 - tp
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    # precision envelope (monotone non-increasing from the right)
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    if len(precision) == 0:
        return 0.0
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(
        idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0
    )
    return float(np.mean(prec_at))


def coco_map(
    predictions: Sequence[Dict[str, np.ndarray]],
    ground_truth: Sequence[Dict[str, np.ndarray]],
) -> Dict[str, float]:
    """predictions / ground_truth: per image dicts with 'boxes' (N, 4 xyxy),
    'labels' (N,), and for predictions 'scores' (N,). Images are aligned by
    list position. Returns mAP (IoU 0.5:0.95), AP50, AP75 and per-category
    AP dict."""
    assert len(predictions) == len(ground_truth)
    cats = sorted(
        {int(c) for g in ground_truth for c in np.asarray(g["labels"]).ravel()}
    )
    ap_per_cat_thr: Dict[int, List[float]] = {}
    ap50_per_cat: Dict[int, float] = {}
    ap75_per_cat: Dict[int, float] = {}

    for cat in cats:
        aps = []
        for ti, thr in enumerate(IOU_THRESHOLDS):
            scores_all, matched_all, n_gt = [], [], 0
            for pred, gt in zip(predictions, ground_truth):
                g_sel = np.asarray(gt["labels"]) == cat
                g_boxes = np.asarray(gt["boxes"], np.float64)[g_sel]
                n_gt += len(g_boxes)
                p_sel = np.asarray(pred["labels"]) == cat
                p_boxes = np.asarray(pred["boxes"], np.float64)[p_sel]
                p_scores = np.asarray(pred["scores"], np.float64)[p_sel]
                if len(p_boxes) == 0:
                    continue
                order = np.argsort(-p_scores, kind="mergesort")
                p_boxes, p_scores = p_boxes[order], p_scores[order]
                ious = _iou_matrix(p_boxes, g_boxes)
                taken = np.zeros(len(g_boxes), bool)
                m = np.zeros(len(p_boxes), bool)
                for i in range(len(p_boxes)):
                    if len(g_boxes) == 0:
                        break
                    j = int(np.argmax(np.where(taken, -1.0, ious[i])))
                    if not taken[j] and ious[i, j] >= thr:
                        taken[j] = True
                        m[i] = True
                scores_all.extend(p_scores)
                matched_all.extend(m)
            ap = _ap_from_matches(scores_all, matched_all, n_gt)
            aps.append(ap)
            if ti == 0:
                ap50_per_cat[cat] = ap
            if abs(thr - 0.75) < 1e-9:
                ap75_per_cat[cat] = ap
        ap_per_cat_thr[cat] = aps

    def nanmean(vals):
        vals = [v for v in vals if not np.isnan(v)]
        return float(np.mean(vals)) if vals else float("nan")

    per_cat = {c: nanmean(v) for c, v in ap_per_cat_thr.items()}
    return {
        "mAP": nanmean(per_cat.values()),
        "AP50": nanmean(ap50_per_cat.values()),
        "AP75": nanmean(ap75_per_cat.values()),
        "per_category": per_cat,
    }
