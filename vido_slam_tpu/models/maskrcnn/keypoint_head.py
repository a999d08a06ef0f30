"""Keypoint R-CNN head — the reference's third ROI head family
(maskrcnn_benchmark/modeling/roi_heads/keypoint_head/{roi_keypoint_feature_
extractors.py,roi_keypoint_predictors.py,inference.py,loss.py};
config defaults.py:246-256).

Structure: 14x14 ROIAlign pool -> 8x [conv3x3(512) + relu]
(KeypointRCNNFeatureExtractor) -> ConvTranspose2d(512, 17, k=4, s=2, p=1)
-> bilinear x2 (KeypointRCNNPredictor) = (R, 56, 56, 17) heatmap logits.

Inference (inference.py heatmaps_to_keypoints): the reference cv2-resizes
each heatmap to the box's pixel size before the argmax — a dynamic-shape
host loop.  The TPU version argmaxes the fixed 56x56 grid and maps the cell
center back with the same Heckbert half-pixel convention
(x = (x_int + 0.5) * w/56 + x0); identical up to sub-cell interpolation.

Loss (loss.py / structures/keypoint.py keypoints_to_heat_map): visible GT
keypoints are discretised into the 56x56 grid and trained with softmax
cross-entropy over the 3136 spatial positions.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vido_slam_tpu.models.layers import Params, conv2d, relu
from vido_slam_tpu.models.maskrcnn.roi_heads import pooled_features

NUM_KEYPOINTS = 17      # ROI_KEYPOINT_HEAD.NUM_CLASSES (COCO person)
CONV_LAYERS = 8         # CONV_LAYERS = (512,) * 8
CONV_DIM = 512
HEATMAP = 56


class KeypointOutput(NamedTuple):
    xy: jnp.ndarray      # (R, 17, 2) image-space keypoint positions
    logits: jnp.ndarray  # (R, 17) heatmap logit at the argmax
    probs: jnp.ndarray   # (R, 17) spatial-softmax probability mass there


def _deconv4x2(x: jnp.ndarray, w_hwio: jnp.ndarray, b: jnp.ndarray):
    """ConvTranspose2d(cin, cout, k=4, s=2, p=1) for NHWC: flipped-kernel
    conv with lhs_dilation 2 and padding k-1-p = 2; out = 2*in."""
    w = w_hwio[::-1, ::-1]
    w = jnp.swapaxes(w, 2, 3)  # (kh, kw, cin, cout)
    x = x.astype(w.dtype) if x.dtype != w.dtype else x
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def keypoint_head_forward(
    p: Params, feats: List[jnp.ndarray], boxes: jnp.ndarray
) -> jnp.ndarray:
    """(R, 4) boxes -> (R, 56, 56, 17) heatmap logits."""
    x = pooled_features(feats, boxes, 14)
    for i in range(1, CONV_LAYERS + 1):
        x = relu(conv2d(
            x,
            p[f"roi_heads.keypoint.feature_extractor.conv_fcn{i}.weight"],
            p[f"roi_heads.keypoint.feature_extractor.conv_fcn{i}.bias"],
            padding=1,
        ))
    x = _deconv4x2(
        x,
        p["roi_heads.keypoint.predictor.kps_score_lowres.weight"],
        p["roi_heads.keypoint.predictor.kps_score_lowres.bias"],
    )  # (R, 28, 28, 17)
    R = x.shape[0]
    return jax.image.resize(x, (R, HEATMAP, HEATMAP, NUM_KEYPOINTS), "linear")


def keypoints_from_heatmaps(
    logits: jnp.ndarray, boxes: jnp.ndarray
) -> KeypointOutput:
    """heatmaps_to_keypoints (inference.py:40-97), fixed-shape."""
    R = logits.shape[0]
    flat = logits.transpose(0, 3, 1, 2).reshape(R, NUM_KEYPOINTS, -1)
    pos = jnp.argmax(flat, axis=-1)                       # (R, 17)
    x_int = (pos % HEATMAP).astype(jnp.float32)
    y_int = (pos // HEATMAP).astype(jnp.float32)
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)[:, None]
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)[:, None]
    x = (x_int + 0.5) * w / HEATMAP + boxes[:, 0][:, None]
    y = (y_int + 0.5) * h / HEATMAP + boxes[:, 1][:, None]
    best = jnp.max(flat, axis=-1)
    prob = jnp.take_along_axis(
        jax.nn.softmax(flat, axis=-1), pos[..., None], axis=-1
    )[..., 0]
    return KeypointOutput(xy=jnp.stack([x, y], -1), logits=best, probs=prob)


def keypoints_to_heatmap(
    kp_xy: jnp.ndarray,   # (R, 17, 2) image-space GT keypoints
    kp_vis: jnp.ndarray,  # (R, 17) visibility > 0
    rois: jnp.ndarray,    # (R, 4)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """keypoints_to_heat_map (structures/keypoint.py:154-188): linear cell
    index per keypoint + validity."""
    x0, y0 = rois[:, 0][:, None], rois[:, 1][:, None]
    sx = HEATMAP / jnp.maximum(rois[:, 2][:, None] - x0, 1e-3)
    sy = HEATMAP / jnp.maximum(rois[:, 3][:, None] - y0, 1e-3)
    x = jnp.floor((kp_xy[..., 0] - x0) * sx)
    y = jnp.floor((kp_xy[..., 1] - y0) * sy)
    # keypoints exactly on the far edge land in the last cell
    x = jnp.where(kp_xy[..., 0] == rois[:, 2][:, None], HEATMAP - 1, x)
    y = jnp.where(kp_xy[..., 1] == rois[:, 3][:, None], HEATMAP - 1, y)
    in_map = (x >= 0) & (y >= 0) & (x < HEATMAP) & (y < HEATMAP)
    valid = in_map & kp_vis
    lin = (y * HEATMAP + x).astype(jnp.int32)
    return jnp.where(valid, lin, 0), valid


def keypoint_loss(
    logits: jnp.ndarray,  # (R, 56, 56, 17)
    kp_xy: jnp.ndarray,
    kp_vis: jnp.ndarray,
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,  # (R,)
) -> jnp.ndarray:
    """Softmax CE over the 3136 spatial cells for visible keypoints
    (loss.py:145-169 cross_entropy on valid indices)."""
    target, valid = keypoints_to_heatmap(kp_xy, kp_vis, rois)
    valid = valid & roi_valid[:, None]
    R = logits.shape[0]
    flat = logits.transpose(0, 3, 1, 2).reshape(R * NUM_KEYPOINTS, -1)
    lse = jax.nn.logsumexp(flat, axis=-1)
    picked = jnp.take_along_axis(flat, target.reshape(-1, 1), axis=-1)[:, 0]
    ce = lse - picked
    m = valid.reshape(-1).astype(jnp.float32)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def init_keypoint_params(key, in_channels: int = 256) -> Params:
    """Kaiming fan-out init, zero bias (roi_keypoint_feature_extractors.py:
    31-33, roi_keypoint_predictors.py:21-24)."""
    p: Params = {}
    keys = iter(jax.random.split(key, CONV_LAYERS + 2))
    cin = in_channels
    for i in range(1, CONV_LAYERS + 1):
        fan_out = 3 * 3 * CONV_DIM
        std = (2.0 / fan_out) ** 0.5
        p[f"roi_heads.keypoint.feature_extractor.conv_fcn{i}.weight"] = (
            jax.random.normal(next(keys), (3, 3, cin, CONV_DIM)) * std
        )
        p[f"roi_heads.keypoint.feature_extractor.conv_fcn{i}.bias"] = (
            jnp.zeros(CONV_DIM)
        )
        cin = CONV_DIM
    fan_out = 4 * 4 * NUM_KEYPOINTS
    std = (2.0 / fan_out) ** 0.5
    # stored layout matches convert_state_dict on torch ConvTranspose2d
    # (cin, cout, kh, kw) -> (kh, kw, cout, cin)
    p["roi_heads.keypoint.predictor.kps_score_lowres.weight"] = (
        jax.random.normal(next(keys), (4, 4, NUM_KEYPOINTS, CONV_DIM)) * std
    )
    p["roi_heads.keypoint.predictor.kps_score_lowres.bias"] = (
        jnp.zeros(NUM_KEYPOINTS)
    )
    return p
