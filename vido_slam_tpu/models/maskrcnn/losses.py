"""Mask R-CNN training losses — the reference's training path
(src/thirdparty/mask_rcnn/maskrcnn_benchmark/modeling/rpn/loss.py,
roi_heads/box_head/loss.py, roi_heads/mask_head/loss.py, engine/trainer.py)
in fixed-shape JAX.

Semantics kept from the reference configs:
  - RPN: anchors matched to GT at IoU >= 0.7 (positive) / < 0.3 (negative),
    256 sampled per image at positive fraction 0.5; objectness BCE + smooth
    L1 on box deltas with unit weights (config/defaults.py:150-166).
  - Box head: proposals matched at IoU >= 0.5, 512 sampled at positive
    fraction 0.25; softmax CE over 81 classes + smooth L1 on the matched
    class's deltas, weights (10, 10, 5, 5) (defaults.py:200-218).
  - Mask head: per-pixel BCE on 28x28 crops of the matched GT mask for
    positive samples (mask_head/loss.py).

Fixed shapes throughout: GT objects pad to `G`; sampling uses noisy top-k
(the TPU replacement for random permutation subsampling).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vido_slam_tpu.models.layers import Params
from vido_slam_tpu.models.maskrcnn.backbone import fpn_forward, resnet_stages
from vido_slam_tpu.models.maskrcnn.roi_heads import (
    BBOX_REG_WEIGHTS,
    box_head_forward,
    pooled_features,
)
from vido_slam_tpu.models.maskrcnn.rpn import (
    ANCHOR_SIZES,
    ANCHOR_STRIDES,
    generate_cell_anchors,
    grid_anchors,
    rpn_head,
    select_proposals_level,
    select_over_all_levels,
)
from vido_slam_tpu.models.layers import conv2d, relu
from vido_slam_tpu.ops.nms import box_iou

RPN_POS_IOU = 0.7
RPN_NEG_IOU = 0.3
RPN_BATCH = 256
RPN_POS_FRAC = 0.5
ROI_POS_IOU = 0.5
ROI_BATCH = 512
ROI_POS_FRAC = 0.25


class DetectionTargets(NamedTuple):
    boxes: jnp.ndarray   # (G, 4) xyxy
    labels: jnp.ndarray  # (G,) int32 in 1..80
    masks: jnp.ndarray   # (G, Hm, Wm) binary, image-space (low-res ok)
    valid: jnp.ndarray   # (G,)


def _encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray, weights) -> jnp.ndarray:
    """BoxCoder.encode (modeling/box_coder.py). Degenerate anchors (clipped
    proposals can have non-positive extent) are floored at 1 px BEFORE the
    division/log — masked-out infinities would still produce NaN gradients
    through the 0-weight product."""
    wx, wy, ww, wh = weights
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0] + 1, 1.0)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1] + 1, 1.0)
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    gw = jnp.maximum(boxes[:, 2] - boxes[:, 0] + 1, 1.0)
    gh = jnp.maximum(boxes[:, 3] - boxes[:, 1] + 1, 1.0)
    gx = boxes[:, 0] + 0.5 * gw
    gy = boxes[:, 1] + 0.5 * gh
    return jnp.stack([
        wx * (gx - ax) / aw,
        wy * (gy - ay) / ah,
        ww * jnp.log(gw / aw),
        wh * jnp.log(gh / ah),
    ], axis=-1)


def _smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def _match(anchors, targets: DetectionTargets, pos_iou, neg_iou):
    """Returns (matched_gt_idx, is_pos, is_neg) per anchor, with the
    best-match-per-GT forcing (Matcher allow_low_quality_matches)."""
    iou = box_iou(anchors, targets.boxes)  # (A, G)
    iou = jnp.where(targets.valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    is_pos = best_iou >= pos_iou
    is_neg = (best_iou < neg_iou) & (best_iou >= 0)
    # every GT's best anchor is positive
    per_gt_best = jnp.argmax(iou, axis=0)  # (G,)
    force = jnp.zeros(anchors.shape[0], bool).at[per_gt_best].set(
        targets.valid, mode="drop"
    )
    is_pos = is_pos | force
    is_neg = is_neg & ~is_pos
    return best_gt, is_pos, is_neg


def _sample(key, is_pos, is_neg, batch, pos_frac):
    """Noisy top-k subsampling to fixed counts; returns weight per element
    (1 for sampled, 0 otherwise) and the pos mask."""
    n = is_pos.shape[0]
    n_pos = min(int(batch * pos_frac), n)
    n_neg = min(batch - n_pos, n)
    kp, kn = jax.random.split(key)
    rp = jnp.where(is_pos, jax.random.uniform(kp, is_pos.shape), -jnp.inf)
    rn = jnp.where(is_neg, jax.random.uniform(kn, is_neg.shape), -jnp.inf)
    _, pi = lax.top_k(rp, n_pos)
    _, ni = lax.top_k(rn, n_neg)
    w = jnp.zeros(is_pos.shape, jnp.float32)
    w = w.at[pi].add(jnp.where(jnp.isfinite(rp[pi]), 1.0, 0.0))
    w = w.at[ni].add(jnp.where(jnp.isfinite(rn[ni]), 1.0, 0.0))
    return jnp.minimum(w, 1.0)


def _crop_mask_to_box(mask: jnp.ndarray, box: jnp.ndarray, out: int = 28):
    """Bilinear crop of a (Hm, Wm) image-space mask to the box, out x out —
    separable matmuls again."""
    Hm, Wm = mask.shape
    x1, y1, x2, y2 = box
    xs = x1 + (jnp.arange(out) + 0.5) / out * jnp.maximum(x2 - x1, 1.0)
    ys = y1 + (jnp.arange(out) + 0.5) / out * jnp.maximum(y2 - y1, 1.0)
    kx = jnp.arange(Wm, dtype=jnp.float32)
    ky = jnp.arange(Hm, dtype=jnp.float32)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - kx))
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - ky))
    return Wy @ mask @ Wx.T


@partial(jax.jit, static_argnames=("cfg",))
def maskrcnn_loss(
    params: Params,
    image: jnp.ndarray,            # (1, H, W, 3)
    targets: DetectionTargets,
    key: jnp.ndarray,
    cfg,
) -> Dict[str, jnp.ndarray]:
    """Total training loss (reduce_loss_dict analog returns the parts)."""
    H, W = cfg.input_h, cfg.input_w
    stages = resnet_stages(params, image, cfg.resnet)
    feats = fpn_forward(params, stages)

    k_rpn, k_roi = jax.random.split(key)

    # ---- RPN ----
    rpn_cls_losses = []
    rpn_box_losses = []
    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    for li, f in enumerate(feats):
        stride = ANCHOR_STRIDES[li]
        cell = generate_cell_anchors(stride, ANCHOR_SIZES[li])
        anchors = jnp.asarray(grid_anchors(f.shape[1], f.shape[2], stride, cell))
        logits, deltas = rpn_head(params, f, cell.shape[0])
        obj = logits[0].reshape(-1)
        dl = deltas[0].reshape(-1, 4)

        gt_idx, is_pos, is_neg = _match(anchors, targets, RPN_POS_IOU, RPN_NEG_IOU)
        w = _sample(jax.random.fold_in(k_rpn, li), is_pos, is_neg,
                    RPN_BATCH, RPN_POS_FRAC)
        lab = is_pos.astype(jnp.float32)
        bce = jnp.maximum(obj, 0) - obj * lab + jnp.log1p(jnp.exp(-jnp.abs(obj)))
        rpn_cls_losses.append(jnp.sum(bce * w) / RPN_BATCH)
        tgt = _encode_boxes(targets.boxes[gt_idx], anchors, (1.0,) * 4)
        diff = jnp.where(is_pos[:, None], dl - tgt, 0.0)
        bl = jnp.sum(_smooth_l1(diff), axis=-1)
        rpn_box_losses.append(jnp.sum(bl * w) / RPN_BATCH)

        b, s, v = select_proposals_level(
            lax.stop_gradient(obj), lax.stop_gradient(dl), anchors, H, W
        )
        lvl_boxes.append(b)
        lvl_scores.append(s)
        lvl_valid.append(v)

    proposals, _, pvalid = select_over_all_levels(lvl_boxes, lvl_scores, lvl_valid)

    # ---- ROI box head ----
    gt_idx, is_pos, is_neg = _match(proposals, targets, ROI_POS_IOU, ROI_POS_IOU)
    is_pos = is_pos & pvalid
    is_neg = is_neg & pvalid
    w = _sample(k_roi, is_pos, is_neg, ROI_BATCH, ROI_POS_FRAC)
    logits, deltas = box_head_forward(params, [f[0] for f in feats[:4]], proposals)
    cls_target = jnp.where(is_pos, targets.labels[gt_idx], 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, cls_target[:, None], axis=1)[:, 0]
    cls_loss = jnp.sum(ce * w) / ROI_BATCH
    tgt = _encode_boxes(targets.boxes[gt_idx], proposals, BBOX_REG_WEIGHTS)
    dsel = jnp.take_along_axis(
        deltas, cls_target[:, None, None].repeat(4, axis=2), axis=1
    )[:, 0]
    bdiff = jnp.where(is_pos[:, None], dsel - tgt, 0.0)
    box_loss = jnp.sum(jnp.sum(_smooth_l1(bdiff), axis=-1) * w) / ROI_BATCH

    # ---- mask head (on sampled positives; reuse proposal boxes) ----
    n_mask = 64
    rp = jnp.where(is_pos & (w > 0), jax.random.uniform(k_roi, is_pos.shape), -jnp.inf)
    _, mi = lax.top_k(rp, n_mask)
    m_ok = jnp.isfinite(rp[mi])
    m_rois = proposals[mi]
    x = pooled_features([f[0] for f in feats[:4]], m_rois, 14)
    for i in range(1, 5):
        x = relu(conv2d(x, params[f"roi_heads.mask.feature_extractor.mask_fcn{i}.weight"],
                        params[f"roi_heads.mask.feature_extractor.mask_fcn{i}.bias"],
                        padding=1))
    from vido_slam_tpu.models.maskrcnn.roi_heads import _dense_deconv2x

    x = relu(_dense_deconv2x(
        x, params["roi_heads.mask.predictor.conv5_mask.weight"],
        params["roi_heads.mask.predictor.conv5_mask.bias"]))
    mlogits = conv2d(x, params["roi_heads.mask.predictor.mask_fcn_logits.weight"],
                     params["roi_heads.mask.predictor.mask_fcn_logits.bias"])
    m_cls = cls_target[mi]
    msel = jnp.take_along_axis(
        mlogits, m_cls[:, None, None, None].repeat(28, 1).repeat(28, 2), axis=3
    )[..., 0]
    m_gt = jax.vmap(
        lambda g, b: _crop_mask_to_box(targets.masks[g].astype(jnp.float32), b)
    )(gt_idx[mi], m_rois)
    m_gt = (m_gt > 0.5).astype(jnp.float32)
    mb = jnp.maximum(msel, 0) - msel * m_gt + jnp.log1p(jnp.exp(-jnp.abs(msel)))
    mask_loss = jnp.sum(jnp.mean(mb, axis=(1, 2)) * m_ok) / n_mask

    return {
        "loss_objectness": sum(rpn_cls_losses),
        "loss_rpn_box_reg": sum(rpn_box_losses),
        "loss_classifier": cls_loss,
        "loss_box_reg": box_loss,
        "loss_mask": mask_loss,
    }


def total_loss(params, image, targets, key, cfg):
    parts = maskrcnn_loss(params, image, targets, key, cfg)
    return sum(parts.values())
