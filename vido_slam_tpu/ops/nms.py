"""Fixed-shape NMS and box utilities — TPU replacements for
maskrcnn_benchmark's CUDA nms / boxlist ops (reference
src/thirdparty/mask_rcnn/maskrcnn_benchmark/csrc/cuda/nms.cu and
structures/boxlist_ops.py).

The CUDA kernel's data-dependent output list becomes a boolean keep mask of
static length: boxes are pre-sorted by score, the full IoU matrix is computed
once (an (N, N) matmul-shaped op the TPU loves), and a `lax.fori_loop`
sweeps rows in score order suppressing everything a kept box overlaps.
Boxes are (x1, y1, x2, y2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """maskrcnn_benchmark BoxList.area for mode xyxy: (x2-x1+1)*(y2-y1+1)
    (TO_REMOVE=1 convention, structures/bounding_box.py)."""
    return (boxes[..., 2] - boxes[..., 0] + 1) * (boxes[..., 3] - boxes[..., 1] + 1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (N, M) with the +1 convention (boxlist_ops.boxlist_iou)."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt + 1, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


@partial(jax.jit, static_argnames=("max_out", "sweeps"))
def nms(
    boxes: jnp.ndarray,    # (N, 4)
    scores: jnp.ndarray,   # (N,)
    valid: jnp.ndarray,    # (N,) bool
    iou_threshold: float,
    max_out: int,
    sweeps: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (indices (max_out,), keep_valid (max_out,)): the kept boxes'
    original indices in score order, padded with the last index.

    Greedy NMS as a PARALLEL FIXPOINT instead of an N-step sequential loop
    (a 1000-iteration fori_loop with a tiny body is pure launch overhead on
    TPU): keep = valid & ~(Strict x keep) where Strict[i, j] marks a
    higher-scored overlapping j. Each sweep is one (N, N) x (N,) product on
    the MXU; after k sweeps every box whose suppression-chain depth <= k is
    final — real detection data has depths of a handful, and `sweeps`=16
    makes the result exact for any chain up to that depth."""
    N = boxes.shape[0]
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(valid, scores, neg)
    order = jnp.argsort(-s)
    b = boxes[order]
    v = valid[order]
    iou = box_iou(b, b)
    ii = jnp.arange(N)
    strict = (iou > iou_threshold) & (ii[:, None] < ii[None, :])  # j row sup i col
    strict_f = strict.astype(jnp.float32)

    def body(state):
        i, keep, _ = state
        sup = (
            jnp.einsum("ji,j->i", strict_f, keep.astype(jnp.float32),
                       precision=lax.Precision.DEFAULT)
            > 0.5
        )
        new = v & ~sup
        return i + 1, new, jnp.all(new == keep)

    def cond(state):
        i, _, converged = state
        return (i < sweeps) & ~converged

    # early exit once a sweep is a no-op: real chains are a few deep, so
    # this usually stops after 2-4 of the 16 worst-case sweeps
    _, keep, _ = lax.while_loop(cond, body, (jnp.int32(0), v, jnp.bool_(False)))
    # gather kept, in score order, to fixed size
    keep_s = jnp.where(keep, 1.0, 0.0)
    prio = keep_s * (N - jnp.arange(N, dtype=jnp.float32))  # earlier = higher
    _, sel = lax.top_k(prio, max_out)
    out_valid = keep[sel]
    return order[sel], out_valid


def clip_boxes(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """BoxList.clip_to_image (x in [0, W-1], y in [0, H-1])."""
    x1 = jnp.clip(boxes[..., 0], 0, width - 1)
    y1 = jnp.clip(boxes[..., 1], 0, height - 1)
    x2 = jnp.clip(boxes[..., 2], 0, width - 1)
    y2 = jnp.clip(boxes[..., 3], 0, height - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def remove_small_boxes(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Validity mask of boxes with both sides >= min_size (boxlist_ops)."""
    ws = boxes[..., 2] - boxes[..., 0] + 1
    hs = boxes[..., 3] - boxes[..., 1] + 1
    return (ws >= min_size) & (hs >= min_size)


def decode_boxes(
    deltas: jnp.ndarray,   # (N, 4) dx, dy, dw, dh
    anchors: jnp.ndarray,  # (N, 4) xyxy
    weights=(1.0, 1.0, 1.0, 1.0),
    bbox_xform_clip: float = 4.135166556742356,  # log(1000/16)
) -> jnp.ndarray:
    """maskrcnn_benchmark BoxCoder.decode (modeling/box_coder.py)."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0] + 1
    heights = anchors[:, 3] - anchors[:, 1] + 1
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.minimum(deltas[:, 2] / ww, bbox_xform_clip)
    dh = jnp.minimum(deltas[:, 3] / wh, bbox_xform_clip)
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    x1 = pred_ctr_x - 0.5 * pred_w
    y1 = pred_ctr_y - 0.5 * pred_h
    x2 = pred_ctr_x + 0.5 * pred_w - 1
    y2 = pred_ctr_y + 0.5 * pred_h - 1
    return jnp.stack([x1, y1, x2, y2], axis=-1)
