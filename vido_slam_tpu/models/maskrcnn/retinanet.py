"""RetinaNet — the reference's alternative detector family
(src/thirdparty/mask_rcnn/maskrcnn_benchmark/modeling/rpn/retinanet/
{retinanet.py,inference.py,loss.py}; config defaults.py:295-350).

Shares the ResNet+FPN backbone with Mask R-CNN. Head: 4-conv class tower +
4-conv box tower per level, 9 anchors per location (3 aspect ratios x 3
scales per octave), sigmoid classification over 80 foreground classes.
Inference: per-level top-k (PRE_NMS_TOP_N=1000) above INFERENCE_TH=0.05,
box decode with the reference's regression weights (10, 10, 5, 5),
class-aware NMS at 0.4, 100 detections. Training:
sigmoid focal loss (alpha .25, gamma 2) + smooth L1 (beta 0.11).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vido_slam_tpu.models.layers import Params, conv2d, relu
from vido_slam_tpu.models.maskrcnn.backbone import (
    ResNetConfig,
    fpn_forward,
    init_resnet_fpn_params,
    resnet_stages,
)
from vido_slam_tpu.models.maskrcnn.rpn import generate_cell_anchors, grid_anchors
from vido_slam_tpu.ops.nms import clip_boxes, decode_boxes, nms

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_STRIDES = (8, 16, 32, 64, 128)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
SCALES_PER_OCTAVE = 3
NUM_CLASSES_FG = 80
PRE_NMS_TOP_N = 1000
INFERENCE_TH = 0.05
NMS_TH = 0.4
DETECTIONS = 100
LOSS_ALPHA = 0.25
LOSS_GAMMA = 2.0


def retina_cell_anchors(level: int) -> np.ndarray:
    """9 anchors: 3 ratios x 3 octave scales (anchor_generator for retinanet)."""
    stride = ANCHOR_STRIDES[level]
    base = ANCHOR_SIZES[level]
    cells = []
    for o in range(SCALES_PER_OCTAVE):
        size = base * (2.0 ** (o / SCALES_PER_OCTAVE))
        cells.append(generate_cell_anchors(stride, size, ASPECT_RATIOS))
    return np.concatenate(cells, axis=0)  # (9, 4)


def retinanet_head(p: Params, feat: jnp.ndarray, num_anchors: int = 9):
    """Shared towers applied to one level: (cls (N,H,W,A*80), box (N,H,W,A*4))."""
    c = feat
    b = feat
    for i in range(4):
        c = relu(conv2d(c, p[f"rpn.head.cls_tower.{2 * i}.weight"],
                        p[f"rpn.head.cls_tower.{2 * i}.bias"], padding=1))
        b = relu(conv2d(b, p[f"rpn.head.bbox_tower.{2 * i}.weight"],
                        p[f"rpn.head.bbox_tower.{2 * i}.bias"], padding=1))
    cls = conv2d(c, p["rpn.head.cls_logits.weight"],
                 p["rpn.head.cls_logits.bias"], padding=1)
    box = conv2d(b, p["rpn.head.bbox_pred.weight"],
                 p["rpn.head.bbox_pred.bias"], padding=1)
    return cls, box


class RetinaNetOutput(NamedTuple):
    boxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray


@partial(jax.jit, static_argnames=("resnet_cfg", "input_h", "input_w"))
def retinanet_inference(
    params: Params, image: jnp.ndarray, resnet_cfg: ResNetConfig,
    input_h: int, input_w: int,
) -> RetinaNetOutput:
    stages = resnet_stages(params, image, resnet_cfg)
    feats = fpn_forward(params, stages)  # P2..P6; retinanet uses P3..P7 —
    # we take the FPN's last five trailing levels (P3..P6 + extra pool)
    p7 = feats[4][:, ::2, ::2, :]
    levels = [feats[1], feats[2], feats[3], feats[4], p7]

    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for li, f in enumerate(levels):
        cell = retina_cell_anchors(li)  # numpy: anchors are static
        anchors = jnp.asarray(
            grid_anchors(f.shape[1], f.shape[2], ANCHOR_STRIDES[li], cell)
        )
        cls, box = retinanet_head(params, f)
        A = 9
        n = f.shape[1] * f.shape[2] * A
        scores = jax.nn.sigmoid(cls[0].reshape(n, NUM_CLASSES_FG))
        deltas = box[0].reshape(n, 4)
        best = jnp.max(scores, axis=-1)
        lab = jnp.argmax(scores, axis=-1) + 1
        k = min(PRE_NMS_TOP_N, n)
        v, idx = lax.top_k(jnp.where(best > INFERENCE_TH, best, -jnp.inf), k)
        ok = jnp.isfinite(v)
        bx = decode_boxes(deltas[idx], anchors[idx], weights=(10.0, 10.0, 5.0, 5.0))
        bx = clip_boxes(bx, input_h, input_w)
        if k < PRE_NMS_TOP_N:
            pad = PRE_NMS_TOP_N - k
            bx = jnp.pad(bx, ((0, pad), (0, 0)))
            v = jnp.pad(v, (0, pad), constant_values=-jnp.inf)
            ok = jnp.pad(ok, (0, pad))
            lab = jnp.pad(lab[idx], (0, pad))
        else:
            lab = lab[idx]
        all_boxes.append(bx)
        all_scores.append(jnp.where(ok, v, 0.0))
        all_labels.append(lab)
        all_valid.append(ok)

    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    labels = jnp.concatenate(all_labels)
    valid = jnp.concatenate(all_valid)
    # class-aware NMS via the coordinate-offset trick
    off = labels.astype(jnp.float32)[:, None] * 10000.0
    kidx, kok = nms(boxes + off, scores, valid, NMS_TH, DETECTIONS)
    return RetinaNetOutput(
        boxes=boxes[kidx], scores=scores[kidx], labels=labels[kidx],
        valid=kok,
    )


def sigmoid_focal_loss(logits, targets_onehot, alpha=LOSS_ALPHA, gamma=LOSS_GAMMA):
    """retinanet/loss.py SigmoidFocalLoss (csrc/SigmoidFocalLoss)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets_onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    a_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return a_t * ((1 - p_t) ** gamma) * ce


def init_retinanet_params(key, resnet_cfg: ResNetConfig = ResNetConfig()) -> Params:
    p = init_resnet_fpn_params(key, resnet_cfg)
    keys = iter(jax.random.split(jax.random.fold_in(key, 7), 40))
    C = resnet_cfg.out_channels

    def add_conv(name, cin, cout, k, bias_init=0.0):
        p[name + ".weight"] = (
            jax.random.normal(next(keys), (k, k, cin, cout)) * 0.01
        )
        p[name + ".bias"] = jnp.full(cout, bias_init)

    for i in range(4):
        add_conv(f"rpn.head.cls_tower.{2 * i}", C, C, 3)
        add_conv(f"rpn.head.bbox_tower.{2 * i}", C, C, 3)
    # prior-probability bias init (retinanet.py:66-77): -log((1-pi)/pi)
    import math

    bias = -math.log((1 - 0.01) / 0.01)
    add_conv("rpn.head.cls_logits", C, 9 * NUM_CLASSES_FG, 3, bias_init=bias)
    add_conv("rpn.head.bbox_pred", C, 9 * 4, 3)
    return p
