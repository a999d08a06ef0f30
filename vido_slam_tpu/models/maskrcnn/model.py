"""Full Mask R-CNN inference — GeneralizedRCNN (reference
src/thirdparty/mask_rcnn/maskrcnn_benchmark/modeling/detector/
generalized_rcnn.py) plus the ROS wrapper's post-processing
(src/run_mask_rcnn.py:75-127, src/predictor.py:267-321):

  image -> backbone+FPN -> RPN proposals -> box head -> detections
        -> mask head -> paste masks -> semantic mask = sum(mask * label)

All stages are fixed-shape: 1000 proposals, 100 detections, validity masks
throughout; the whole pipeline jits into one XLA program per image size.
The ROS wrapper resizes input to (h=1088, w=800) and keeps raw RGB floats
(predictor.py:283-286) — preprocessing is configurable here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from vido_slam_tpu.models.layers import Params
from vido_slam_tpu.models.maskrcnn.backbone import (
    ResNetConfig,
    fpn_forward,
    init_resnet_fpn_params,
    resnet_stages,
)
from vido_slam_tpu.models.maskrcnn.roi_heads import (
    NUM_CLASSES,
    box_head_forward,
    mask_head_forward,
    postprocess_detections,
)
from vido_slam_tpu.models.maskrcnn.rpn import (
    ANCHOR_SIZES,
    ANCHOR_STRIDES,
    generate_cell_anchors,
    grid_anchors,
    rpn_head,
    rpn_head_concat,
    select_over_all_levels,
    select_proposals_level,
)


class MaskRCNNConfig(NamedTuple):
    resnet: ResNetConfig = ResNetConfig()
    input_h: int = 1088
    input_w: int = 800
    confidence_threshold: float = 0.8   # run_mask_rcnn.py:42
    mask_threshold: float = 0.5


RESNET50_FPN = MaskRCNNConfig()
RESNEXT101_FPN = MaskRCNNConfig(
    resnet=ResNetConfig(
        stage_blocks=(3, 4, 23, 3), num_groups=32, width_per_group=8,
        stride_in_1x1=False,
    )
)
# DCN variant (config/defaults.py:287-288 STAGE_WITH_DCN; the DCN model-zoo
# checkpoints enable it on stages 2-4 with modulated conv)
RESNEXT101_FPN_DCN = MaskRCNNConfig(
    resnet=ResNetConfig(
        stage_blocks=(3, 4, 23, 3), num_groups=32, width_per_group=8,
        stride_in_1x1=False, stage_with_dcn=(False, True, True, True),
        with_modulated_dcn=True,
    )
)


class MaskRCNNOutput(NamedTuple):
    boxes: jnp.ndarray      # (D, 4) in input-image coords
    scores: jnp.ndarray     # (D,)
    labels: jnp.ndarray     # (D,)
    valid: jnp.ndarray      # (D,)
    masks28: jnp.ndarray    # (D, 28, 28) sigmoid masks


@partial(jax.jit, static_argnames=("cfg",))
def maskrcnn_inference(
    params: Params, image: jnp.ndarray, cfg: MaskRCNNConfig
) -> MaskRCNNOutput:
    """image (1, H, W, 3) float32 (preprocessed) -> detections + masks."""
    H, W = cfg.input_h, cfg.input_w
    stages = resnet_stages(params, image, cfg.resnet)
    feats = fpn_forward(params, stages)  # P2..P6

    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    import os as _os
    _concat = _os.environ.get("VIDO_RPN_CONCAT", "0") == "1"
    head_out = (rpn_head_concat(
        params, feats, generate_cell_anchors(4, 32).shape[0])
        if _concat else None)
    for li, f in enumerate(feats):
        stride = ANCHOR_STRIDES[li]
        cell = generate_cell_anchors(stride, ANCHOR_SIZES[li])
        anchors = jnp.asarray(grid_anchors(f.shape[1], f.shape[2], stride, cell))
        if head_out is not None:
            logits, deltas = head_out[li]
        else:
            logits, deltas = rpn_head(params, f, cell.shape[0])
        obj = logits[0].reshape(-1)
        dl = deltas[0].reshape(-1, 4)
        b, s, v = select_proposals_level(obj, dl, anchors, H, W)
        lvl_boxes.append(b)
        lvl_scores.append(s)
        lvl_valid.append(v)
    proposals, pscores, pvalid = select_over_all_levels(lvl_boxes, lvl_scores, lvl_valid)

    p2_p5 = [f[0] for f in feats[:4]]
    logits, deltas = box_head_forward(params, p2_p5, proposals)
    det = postprocess_detections(logits, deltas, proposals, pvalid, H, W)
    det = det._replace(
        valid=det.valid & (det.scores > cfg.confidence_threshold)
    )
    masks = mask_head_forward(params, p2_p5, det)
    return MaskRCNNOutput(
        boxes=det.boxes, scores=det.scores, labels=det.labels,
        valid=det.valid, masks28=masks,
    )


@partial(jax.jit, static_argnames=("out_h", "out_w", "chunk"))
def paste_semantic_mask(
    out: MaskRCNNOutput,
    in_h: int, in_w: int,       # model input size the boxes live in
    out_h: int, out_w: int,     # original image size
    mask_threshold: float = 0.5,
    chunk: int = 10,
) -> jnp.ndarray:
    """Semantic mask (out_h, out_w) uint8: sum of (pasted mask * label) per
    detection (run_mask_rcnn.create_pixel_masks; Masker threshold .5 pad 1).

    Boxes are rescaled from model-input coords to output coords
    (BoxList.resize), each 28x28 mask is padded by 1, bilinearly resampled
    over its (expanded) box and thresholded, then masks*label are summed
    with uint8 wrap-around exactly like the reference's numpy += loop."""
    sx = out_w / in_w
    sy = out_h / in_h
    boxes = out.boxes * jnp.asarray([sx, sy, sx, sy])
    # Masker.expand_boxes: scale = (28 + 2) / 28 about the box center
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    cx, cy = (x0 + x1) * 0.5, (y0 + y1) * 0.5
    hw = (x1 - x0) * 0.5 * (30.0 / 28.0)
    hh = (y1 - y0) * 0.5 * (30.0 / 28.0)
    ex0, ex1 = cx - hw, cx + hw
    ey0, ey1 = cy - hh, cy + hh

    masks = jnp.pad(out.masks28, ((0, 0), (1, 1), (1, 1)))  # (D, 30, 30)

    xs = jax.lax.broadcasted_iota(jnp.float32, (out_w, 1), 0)[:, 0]  # (W,)
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, 1), 0)[:, 0]  # (H,)
    ks = jax.lax.broadcasted_iota(jnp.float32, (30, 1), 0)[:, 0]     # (30,)

    # Bilinear resampling of a 30x30 mask over an axis-aligned box is
    # SEPARABLE: val = Ry @ M @ Rx^T with hat-function weight matrices.
    # Two small matmuls per detection beat per-pixel gathers by ~100x on TPU
    # (generic gather is the slowest primitive on this hardware).
    def paste_chunk(acc, args):
        m, bx0, bx1, by0, by1, lab, ok = args  # chunked (C, ...)
        w = jnp.maximum(bx1 - bx0 + 1, 1.0)
        h = jnp.maximum(by1 - by0 + 1, 1.0)
        u = (xs[None, :] - bx0[:, None] + 0.5) / w[:, None] * 30.0 - 0.5
        v = (ys[None, :] - by0[:, None] + 0.5) / h[:, None] * 30.0 - 0.5
        u = jnp.clip(u, 0.0, 29.0)
        v = jnp.clip(v, 0.0, 29.0)
        Rx = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] - ks))  # (C, W, 30)
        Ry = jnp.maximum(0.0, 1.0 - jnp.abs(v[:, :, None] - ks))  # (C, H, 30)
        val = jnp.einsum(
            "chk,ckl,cwl->chw", Ry, m, Rx,
            precision=lax.Precision.DEFAULT,
        )
        row_in = (ys[None, :] >= by0[:, None]) & (ys[None, :] <= by1[:, None])
        col_in = (xs[None, :] >= bx0[:, None]) & (xs[None, :] <= bx1[:, None])
        binary = (
            (val > mask_threshold)
            & row_in[:, :, None]
            & col_in[:, None, :]
            & ok[:, None, None]
        )
        contrib = jnp.sum(
            binary.astype(jnp.int32) * lab[:, None, None].astype(jnp.int32),
            axis=0,
        )
        return acc + contrib, None

    D = masks.shape[0]
    C = chunk
    n_chunks = -(-D // C)
    pad_to = n_chunks * C

    def padc(x):
        return jnp.pad(x, [(0, pad_to - D)] + [(0, 0)] * (x.ndim - 1)).reshape(
            (n_chunks, C) + x.shape[1:]
        )

    args = (padc(masks), padc(ex0), padc(ex1), padc(ey0), padc(ey1),
            padc(out.labels), padc(out.valid))
    acc, _ = lax.scan(paste_chunk, jnp.zeros((out_h, out_w), jnp.int32), args)
    # uint8 wrap-around like the reference's numpy += loop
    return (acc % 256).astype(jnp.uint8)


def init_maskrcnn_params(key, cfg: MaskRCNNConfig = RESNET50_FPN) -> Params:
    k1, k2 = jax.random.split(key)
    p = init_resnet_fpn_params(k1, cfg.resnet)
    keys = iter(jax.random.split(k2, 50))

    def add_conv(name, cin, cout, k):
        fan = cin * k * k
        p[name + ".weight"] = (
            jax.random.normal(next(keys), (k, k, cin, cout)) / jnp.sqrt(fan)
        )
        p[name + ".bias"] = jnp.zeros(cout)

    def add_fc(name, cin, cout):
        p[name + ".weight"] = (
            jax.random.normal(next(keys), (cin, cout)) / jnp.sqrt(cin)
        )
        p[name + ".bias"] = jnp.zeros(cout)

    C = cfg.resnet.out_channels
    A = 3
    add_conv("rpn.head.conv", C, C, 3)
    add_conv("rpn.head.cls_logits", C, A, 1)
    add_conv("rpn.head.bbox_pred", C, A * 4, 1)
    add_fc("roi_heads.box.feature_extractor.fc6", C * 7 * 7, 1024)
    add_fc("roi_heads.box.feature_extractor.fc7", 1024, 1024)
    add_fc("roi_heads.box.predictor.cls_score", 1024, NUM_CLASSES)
    add_fc("roi_heads.box.predictor.bbox_pred", 1024, NUM_CLASSES * 4)
    for i in range(1, 5):
        add_conv(f"roi_heads.mask.feature_extractor.mask_fcn{i}", C, C, 3)
    # ConvTranspose2d stored as converted torch (cin, cout, 2, 2)->(2,2,cout,cin)
    p["roi_heads.mask.predictor.conv5_mask.weight"] = (
        jax.random.normal(next(keys), (2, 2, C, C)) / jnp.sqrt(C * 4)
    )
    p["roi_heads.mask.predictor.conv5_mask.bias"] = jnp.zeros(C)
    add_conv("roi_heads.mask.predictor.mask_fcn_logits", C, NUM_CLASSES, 1)
    return p
