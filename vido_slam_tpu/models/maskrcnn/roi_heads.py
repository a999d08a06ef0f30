"""ROI box + mask heads — maskrcnn_benchmark's FPN heads (reference
src/thirdparty/mask_rcnn/maskrcnn_benchmark/modeling/roi_heads/
{box_head,mask_head}, modeling/poolers.py) in fixed-shape JAX.

- Pooler/LevelMapper: each ROI goes to FPN level
  floor(4 + log2(sqrt(area)/224 + 1e-6)) clamped to [2, 5] (poolers.py:11-45);
  realised as: ROIAlign on ALL four levels, then a per-ROI select — four
  fixed-shape gathers beat data-dependent partitioning on TPU.
- Box head: FPN2MLPFeatureExtractor (7x7 pool -> fc6 -> fc7, 1024) +
  FPNPredictor (cls_score 81, bbox_pred 324).
- Post-processing (box_head/inference.py): softmax, per-class box decode
  with weights (10, 10, 5, 5), clip, score > 0.05, per-class NMS 0.5
  (vmapped over classes), top DETECTIONS_PER_IMG=100.
- Mask head: MaskRCNNFPNFeatureExtractor (14x14 pool, 4x conv3x3+relu) +
  MaskRCNNC4Predictor (deconv 2x + 1x1 -> 81), sigmoid, class-indexed.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from vido_slam_tpu.models.layers import Params, conv2d, relu
from vido_slam_tpu.ops.nms import box_area, clip_boxes, nms
from vido_slam_tpu.ops.roi_align import roi_align, roi_align_multilevel

NUM_CLASSES = 81
SCORE_THRESH = 0.05
NMS_THRESH = 0.5
DETECTIONS_PER_IMG = 100
BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
POOLER_SCALES = (0.25, 0.125, 0.0625, 0.03125)
CANDIDATES_PER_CLASS = 64


def assign_fpn_level(rois: jnp.ndarray) -> jnp.ndarray:
    """LevelMapper (poolers.py:11-44): k = floor(4 + log2(sqrt(area)/224)),
    clamped to [2, 5]; returned as index 0..3."""
    area = box_area(rois)
    s = jnp.sqrt(jnp.maximum(area, 1e-6))
    lvl = jnp.floor(4.0 + jnp.log2(s / 224.0 + 1e-6))
    return (jnp.clip(lvl, 2, 5) - 2).astype(jnp.int32)


def pooled_features(
    feats: List[jnp.ndarray],   # P2..P5, each (H, W, C) single image
    rois: jnp.ndarray,          # (R, 4)
    resolution: int,
) -> jnp.ndarray:
    """(R, res, res, C): one-pass banded multi-level ROIAlign (each ROI
    pooled only at its assigned level; see ops/roi_align.py)."""
    lvl = assign_fpn_level(rois)
    return roi_align_multilevel(
        tuple(feats), rois, lvl, POOLER_SCALES, resolution, 2
    )


def pooled_features_reference(
    feats: List[jnp.ndarray],
    rois: jnp.ndarray,
    resolution: int,
) -> jnp.ndarray:
    """All-levels-then-select realisation; kept as the equivalence oracle
    for `pooled_features` (tests/test_detection_ops.py)."""
    lvl = assign_fpn_level(rois)
    per_level = [
        roi_align(f, rois, s, resolution, 2)
        for f, s in zip(feats, POOLER_SCALES)
    ]
    stacked = jnp.stack(per_level)  # (4, R, res, res, C)
    return stacked[lvl, jnp.arange(rois.shape[0])]


def box_head_forward(p: Params, feats: List[jnp.ndarray], rois: jnp.ndarray):
    x = pooled_features(feats, rois, 7)
    R = x.shape[0]
    # torch flatten is NCHW -> (R, C*7*7); our NHWC needs a transpose first
    x = x.transpose(0, 3, 1, 2).reshape(R, -1)
    x = relu(x @ p["roi_heads.box.feature_extractor.fc6.weight"]
             + p["roi_heads.box.feature_extractor.fc6.bias"])
    x = relu(x @ p["roi_heads.box.feature_extractor.fc7.weight"]
             + p["roi_heads.box.feature_extractor.fc7.bias"])
    logits = x @ p["roi_heads.box.predictor.cls_score.weight"] \
        + p["roi_heads.box.predictor.cls_score.bias"]
    deltas = x @ p["roi_heads.box.predictor.bbox_pred.weight"] \
        + p["roi_heads.box.predictor.bbox_pred.bias"]
    return logits, deltas.reshape(R, NUM_CLASSES, 4)


def _decode_class_boxes(deltas, rois):
    """Per-class decode with weights (box_coder weights 10,10,5,5)."""
    wx, wy, ww, wh = BBOX_REG_WEIGHTS
    widths = rois[:, 2] - rois[:, 0] + 1
    heights = rois[:, 3] - rois[:, 1] + 1
    ctr_x = rois[:, 0] + 0.5 * widths
    ctr_y = rois[:, 1] + 0.5 * heights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    clip = 4.135166556742356
    dw = jnp.minimum(deltas[..., 2] / ww, clip)
    dh = jnp.minimum(deltas[..., 3] / wh, clip)
    px = dx * widths[:, None] + ctr_x[:, None]
    py = dy * heights[:, None] + ctr_y[:, None]
    pw = jnp.exp(dw) * widths[:, None]
    ph = jnp.exp(dh) * heights[:, None]
    return jnp.stack(
        [px - 0.5 * pw, py - 0.5 * ph, px + 0.5 * pw - 1, py + 0.5 * ph - 1],
        axis=-1,
    )


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (D, 4)
    scores: jnp.ndarray   # (D,)
    labels: jnp.ndarray   # (D,) int32, 1..80
    valid: jnp.ndarray    # (D,)


def postprocess_detections(
    logits: jnp.ndarray,       # (R, 81)
    deltas: jnp.ndarray,       # (R, 81, 4)
    rois: jnp.ndarray,         # (R, 4)
    roi_valid: jnp.ndarray,    # (R,)
    image_h: int,
    image_w: int,
) -> Detections:
    # decode in f32 regardless of head compute dtype: bf16 coordinates at
    # image scale ~800 have ~2-4 px resolution, which corrupts NMS IoUs
    logits = logits.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    rois = rois.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    boxes_all = clip_boxes(_decode_class_boxes(deltas, rois), image_h, image_w)

    def per_class(c_scores, c_boxes):
        s = jnp.where(roi_valid & (c_scores > SCORE_THRESH), c_scores, -jnp.inf)
        vals, idx = jax.lax.top_k(s, CANDIDATES_PER_CLASS)
        ok = jnp.isfinite(vals)
        kidx, kok = nms(c_boxes[idx], vals, ok, NMS_THRESH, CANDIDATES_PER_CLASS)
        return c_boxes[idx][kidx], vals[kidx], kok

    # classes 1..80 (skip background 0)
    cb, cs, cv = jax.vmap(per_class, in_axes=(1, 1))(
        probs[:, 1:], boxes_all[:, 1:]
    )  # (80, K, ...)
    labels = jnp.broadcast_to(
        jnp.arange(1, NUM_CLASSES, dtype=jnp.int32)[:, None], cv.shape
    )
    fb = cb.reshape(-1, 4)
    fs = jnp.where(cv.reshape(-1), cs.reshape(-1), -jnp.inf)
    fl = labels.reshape(-1)
    vals, idx = jax.lax.top_k(fs, DETECTIONS_PER_IMG)
    return Detections(
        boxes=fb[idx], scores=vals, labels=fl[idx], valid=jnp.isfinite(vals)
    )


def mask_head_forward(
    p: Params, feats: List[jnp.ndarray], det: Detections
) -> jnp.ndarray:
    """Returns per-detection (D, 28, 28) sigmoid masks for the predicted class."""
    x = pooled_features(feats, det.boxes, 14)
    for i in range(1, 5):
        w = p[f"roi_heads.mask.feature_extractor.mask_fcn{i}.weight"]
        b = p[f"roi_heads.mask.feature_extractor.mask_fcn{i}.bias"]
        x = relu(conv2d(x, w, b, padding=1))
    # ConvTranspose2d(256, 256, 2, 2, 0): dense (not grouped) transpose conv
    wt = p["roi_heads.mask.predictor.conv5_mask.weight"]  # (2, 2, 256out, 256in)?
    x = _dense_deconv2x(x, wt, p["roi_heads.mask.predictor.conv5_mask.bias"])
    x = relu(x)
    logits = conv2d(x, p["roi_heads.mask.predictor.mask_fcn_logits.weight"],
                    p["roi_heads.mask.predictor.mask_fcn_logits.bias"])
    probs = jax.nn.sigmoid(logits)  # (D, 28, 28, 81)
    D = probs.shape[0]
    return probs[jnp.arange(D), :, :, det.labels]


def _dense_deconv2x(x: jnp.ndarray, w_hwio: jnp.ndarray, b: jnp.ndarray):
    """ConvTranspose2d(cin, cout, k=2, stride=2, padding=0) for NHWC.

    Stored layout (convert_state_dict on torch (cin, cout, kh, kw)) is
    (kh, kw, cout, cin); conv_transpose needs flipped-kernel dilated conv:
    pad = k - 1 - 0 = 1."""
    w = w_hwio[::-1, ::-1]                       # flip spatial
    w = jnp.swapaxes(w, 2, 3)                    # (kh, kw, cin, cout)
    x = x.astype(w.dtype) if x.dtype != w.dtype else x
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b
