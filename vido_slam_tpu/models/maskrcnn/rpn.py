"""Region Proposal Network — maskrcnn_benchmark's FPN RPN (reference
src/thirdparty/mask_rcnn/maskrcnn_benchmark/modeling/rpn/{rpn.py,
anchor_generator.py,inference.py}) in fixed-shape JAX.

Anchors use the Detectron rounding recipe (anchor_generator.generate_anchors:
ratio enumeration with rounded widths, scale enumeration, centered on
(stride-1)/2). Proposal selection per level: sigmoid objectness top-k
(PRE_NMS_TOP_N_TEST=1000), box decoding with unit weights, clip, NMS 0.7,
POST_NMS_TOP_N_TEST=1000; then a global top-k over the concatenated levels
(FPN_POST_NMS_TOP_N_TEST=1000) — all with static shapes and validity masks.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.models.layers import Params, conv2d, relu
from vido_slam_tpu.ops.nms import clip_boxes, decode_boxes, nms, remove_small_boxes

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_STRIDES = (4, 8, 16, 32, 64)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
PRE_NMS_TOP_N = 1000
POST_NMS_TOP_N = 1000
FPN_POST_NMS_TOP_N = 1000
NMS_THRESH = 0.7


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        [x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
         x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)]
    )


def generate_cell_anchors(stride: int, size: int, ratios=ASPECT_RATIOS) -> np.ndarray:
    """Detectron _generate_anchors: base [0,0,stride-1,stride-1], ratio enum
    with rounding, then scale enum by size/stride. Returns (A, 4)."""
    base = np.array([0, 0, stride - 1, stride - 1], np.float64)
    w, h, xc, yc = _whctrs(base)
    size_ratios = (w * h) / np.asarray(ratios, np.float64)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(ratios))
    ratio_anchors = _mkanchors(ws, hs, xc, yc)
    out = []
    scale = size / stride
    for a in ratio_anchors:
        w, h, xc, yc = _whctrs(a)
        out.append(_mkanchors(np.array([w * scale]), np.array([h * scale]), xc, yc))
    return np.vstack(out).astype(np.float32)


def grid_anchors(height: int, width: int, stride: int, cell: np.ndarray) -> np.ndarray:
    """(H*W*A, 4), location-major / anchor-minor (anchor_generator.grid_anchors)."""
    sx = np.arange(width) * stride
    sy = np.arange(height) * stride
    shifts = np.stack(
        [np.tile(sx, height), np.repeat(sy, width)] * 2, axis=1
    ).astype(np.float32)  # (H*W, 4) as (x, y, x, y)
    return (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)


def rpn_head(p: Params, feat: jnp.ndarray, num_anchors: int):
    """One FPN level -> (objectness (N,H,W,A), deltas (N,H,W,A,4))."""
    t = relu(conv2d(feat, p["rpn.head.conv.weight"], p["rpn.head.conv.bias"], padding=1))
    logits = conv2d(t, p["rpn.head.cls_logits.weight"], p["rpn.head.cls_logits.bias"])
    deltas = conv2d(t, p["rpn.head.bbox_pred.weight"], p["rpn.head.bbox_pred.bias"])
    N, H, W, _ = deltas.shape
    return logits, deltas.reshape(N, H, W, num_anchors, 4)


def rpn_head_concat(p: Params, feats, num_anchors: int):
    """RPN head over ALL pyramid levels in ONE pass: levels are stacked
    along rows (widths zero-padded to the max, one zero separator row
    between levels so the 3x3 conv cannot bleed across level boundaries —
    the zeros reproduce each level's own zero padding exactly), the three
    head convs run once on the concatenated map, and per-level slices are
    returned. Numerically identical to per-level `rpn_head`; replaces
    5x(conv+bias+relu+2 convs) with 3 ops — the per-level small-tensor
    launches and their unfused bias+relu epilogues were ~1.5 ms/frame on
    the device trace (RPNHead weight sharing across levels, reference
    modeling/rpn/rpn.py:109 — the same module is applied per level)."""
    N = feats[0].shape[0]
    Hs = [f.shape[1] for f in feats]
    Ws = [f.shape[2] for f in feats]
    Wmax = max(Ws)
    parts = []
    offs = []
    row = 0
    for i, f in enumerate(feats):
        offs.append(row)
        parts.append(jnp.pad(f, ((0, 0), (0, 1), (0, Wmax - Ws[i]), (0, 0))))
        row += Hs[i] + 1
    fcat = jnp.concatenate(parts, axis=1)        # (N, sum(H+1), Wmax, C)
    t = relu(conv2d(fcat, p["rpn.head.conv.weight"],
                    p["rpn.head.conv.bias"], padding=1))
    logits = conv2d(t, p["rpn.head.cls_logits.weight"],
                    p["rpn.head.cls_logits.bias"])
    deltas = conv2d(t, p["rpn.head.bbox_pred.weight"],
                    p["rpn.head.bbox_pred.bias"])
    out = []
    for i in range(len(feats)):
        lg = logits[:, offs[i]:offs[i] + Hs[i], :Ws[i], :]
        dl = deltas[:, offs[i]:offs[i] + Hs[i], :Ws[i], :]
        out.append((lg, dl.reshape(N, Hs[i], Ws[i], num_anchors, 4)))
    return out


def _topk_padded(scores: jnp.ndarray, k: int):
    n = scores.shape[0]
    if n < k:
        scores = jnp.pad(scores, (0, k - n), constant_values=-jnp.inf)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, jnp.minimum(idx, n - 1), jnp.isfinite(vals)


def select_proposals_level(
    objectness: jnp.ndarray,   # (H*W*A,) raw logits
    deltas: jnp.ndarray,       # (H*W*A, 4)
    anchors: jnp.ndarray,      # (H*W*A, 4)
    image_h: int,
    image_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One image, one level -> (boxes (POST,4), scores (POST,), valid)."""
    # decode in f32 regardless of head compute dtype (bf16 image-scale
    # coordinates are too coarse for NMS IoUs)
    objectness = objectness.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    scores = jax.nn.sigmoid(objectness)
    svals, sidx, svalid = _topk_padded(scores, PRE_NMS_TOP_N)
    boxes = decode_boxes(deltas[sidx], anchors[sidx])
    boxes = clip_boxes(boxes, image_h, image_w)
    ok = svalid & remove_small_boxes(boxes, 0)
    keep_idx, keep_ok = nms(boxes, svals, ok, NMS_THRESH, POST_NMS_TOP_N)
    return boxes[keep_idx], svals[keep_idx], keep_ok


def select_over_all_levels(
    boxes: List[jnp.ndarray], scores: List[jnp.ndarray], valids: List[jnp.ndarray]
):
    """Concat levels, global objectness top-k (inference.py:foreach image)."""
    b = jnp.concatenate(boxes)
    s = jnp.concatenate(scores)
    v = jnp.concatenate(valids)
    s = jnp.where(v, s, -jnp.inf)
    vals, idx = jax.lax.top_k(s, FPN_POST_NMS_TOP_N)
    return b[idx], vals, jnp.isfinite(vals)
