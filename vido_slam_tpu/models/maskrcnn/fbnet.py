"""FBNet mobile detector family — the reference's third backbone option
(maskrcnn_benchmark/modeling/backbone/{fbnet.py,fbnet_builder.py,
fbnet_modeldef.py}; 1081 LoC).  The "default" arch: MobileNetV2-style
inverted-residual (IRF) blocks `ir_k3` (fbnet_builder.py:445-560) arranged
per fbnet_modeldef.py:11-56 — first conv 32ch stride 2, backbone stages
[t,c,n,s] = [[1,16,1,1]], [[6,24,2,2]], [[6,32,3,2]],
[[6,64,4,2],[6,96,3,1]] (trunk output: 96 channels at stride 16), an RPN
feature stage [[6,96,3,1]] and a bbox-head stage
[[4,160,1,2],[6,160,2,1],[6,240,1,1]].

Detector shape: single-scale Faster R-CNN (no FPN) — RPN over the stride-16
trunk with the five Detectron anchor sizes at one level, ROIAlign on the
trunk, the bbox IRF stage + global average pool as the box head
(fbnet.py FBNetROIHead).  Reuses the framework's fixed-shape RPN / NMS /
ROIAlign machinery.

IRF block: pw 1x1 conv+BN+relu (expansion t) -> depthwise kxk stride s
+BN+relu -> pw-linear 1x1+BN, residual iff stride 1 and cin == cout.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.models.layers import Params, batch_norm, conv2d, relu
from vido_slam_tpu.models.maskrcnn.rpn import generate_cell_anchors, grid_anchors
from vido_slam_tpu.ops.nms import clip_boxes, decode_boxes, nms
from vido_slam_tpu.ops.roi_align import roi_align

# "default" arch (fbnet_modeldef.py:12-56): (expansion, channels, n, stride)
FIRST = (32, 2)
BACKBONE_STAGES: List[List[Tuple[int, int, int, int]]] = [
    [(1, 16, 1, 1)],
    [(6, 24, 2, 2)],
    [(6, 32, 3, 2)],
    [(6, 64, 4, 2), (6, 96, 3, 1)],
]
RPN_STAGE = [(6, 96, 3, 1)]
BBOX_STAGE = [(4, 160, 1, 2), (6, 160, 2, 1), (6, 240, 1, 1)]
TRUNK_STRIDE = 16
NUM_CLASSES = 81
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
PRE_NMS_TOP_N = 600
POST_NMS_TOP_N = 200
DETECTIONS = 100


def _cbr(p: Params, prefix: str, x, stride=1, groups=1, act=True):
    w = p[f"{prefix}.conv.weight"]
    k = w.shape[0]
    x = conv2d(x, w, stride=stride, padding=k // 2, groups=groups)
    x = batch_norm(
        x, p[f"{prefix}.bn.weight"], p[f"{prefix}.bn.bias"],
        p[f"{prefix}.bn.running_mean"], p[f"{prefix}.bn.running_var"],
    )
    return relu(x) if act else x


def irf_block(p: Params, prefix: str, x, cin: int, cout: int,
              expansion: int, stride: int) -> jnp.ndarray:
    """IRFBlock.forward (fbnet_builder.py:549-560)."""
    mid = cin * expansion
    y = _cbr(p, f"{prefix}.pw", x)
    y = _cbr(p, f"{prefix}.dw", y, stride=stride, groups=mid)
    y = _cbr(p, f"{prefix}.pwl", y, act=False)
    if stride == 1 and cin == cout:
        y = y + x
    return y


def _run_stage(p, prefix, x, cin, stage):
    i = 0
    for (t, c, n, s) in stage:
        for j in range(n):
            stride = s if j == 0 else 1
            x = irf_block(p, f"{prefix}.{i}", x, cin, c, t, stride)
            cin = c
            i += 1
    return x, cin


def fbnet_trunk(p: Params, image: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) -> (N, H/16, W/16, 96)."""
    x = _cbr(p, "backbone.first", image, stride=FIRST[1])
    cin = FIRST[0]
    for si, stage in enumerate(BACKBONE_STAGES):
        x, cin = _run_stage(p, f"backbone.stage{si}", x, cin, stage)
    return x


class FBNetDetections(NamedTuple):
    boxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray


@partial(jax.jit, static_argnames=("input_h", "input_w"))
def fbnet_inference(p: Params, image: jnp.ndarray,
                    input_h: int, input_w: int) -> FBNetDetections:
    trunk = fbnet_trunk(p, image)
    # --- RPN over the single stride-16 level ---
    rpn_feat, _ = _run_stage(p, "rpn.stage", trunk, 96, RPN_STAGE)
    rpn_feat = relu(conv2d(rpn_feat, p["rpn.head.conv.weight"],
                           p["rpn.head.conv.bias"], padding=1))
    A = len(ANCHOR_SIZES) * len(ASPECT_RATIOS)
    logits = conv2d(rpn_feat, p["rpn.head.cls_logits.weight"],
                    p["rpn.head.cls_logits.bias"])
    deltas = conv2d(rpn_feat, p["rpn.head.bbox_pred.weight"],
                    p["rpn.head.bbox_pred.bias"])
    fh, fw = trunk.shape[1], trunk.shape[2]
    cells = np.concatenate([
        generate_cell_anchors(TRUNK_STRIDE, s, ASPECT_RATIOS)
        for s in ANCHOR_SIZES
    ])
    anchors = jnp.asarray(grid_anchors(fh, fw, TRUNK_STRIDE, cells))
    n = fh * fw * A
    scores = jax.nn.sigmoid(logits[0].reshape(n))
    k = min(PRE_NMS_TOP_N, n)
    top, idx = jax.lax.top_k(scores, k)
    props = decode_boxes(deltas[0].reshape(n, 4)[idx], anchors[idx])
    props = clip_boxes(props, input_h, input_w)
    keep_idx, keep_ok = nms(props, top, jnp.ones(k, bool), 0.7,
                            POST_NMS_TOP_N)
    rois = props[keep_idx]

    # --- box head: ROIAlign 6x6 on the trunk -> bbox IRF stage -> GAP ---
    x = roi_align(trunk[0], rois, 1.0 / TRUNK_STRIDE, 6, 2)
    x, cfin = _run_stage(p, "bbox.stage", x, 96, BBOX_STAGE)
    x = jnp.mean(x, axis=(1, 2))  # (R, 240)
    cls = x @ p["bbox.cls_score.weight"] + p["bbox.cls_score.bias"]
    reg = x @ p["bbox.bbox_pred.weight"] + p["bbox.bbox_pred.bias"]
    probs = jax.nn.softmax(cls, axis=-1)
    best = jnp.argmax(probs[:, 1:], axis=-1) + 1
    score = jnp.take_along_axis(probs, best[:, None], axis=1)[:, 0]
    reg = reg.reshape(-1, NUM_CLASSES, 4)
    d_best = jnp.take_along_axis(
        reg, best[:, None, None].repeat(4, -1), axis=1)[:, 0]
    boxes = clip_boxes(
        decode_boxes(d_best, rois, weights=(10.0, 10.0, 5.0, 5.0)),
        input_h, input_w)
    ok = keep_ok & (score > 0.05)
    fidx, fok = nms(boxes, jnp.where(ok, score, 0.0), ok, 0.5, DETECTIONS)
    return FBNetDetections(boxes=boxes[fidx], scores=score[fidx],
                           labels=best[fidx].astype(jnp.int32), valid=fok)


def init_fbnet_params(key) -> Params:
    p: Params = {}
    cnt = [0]

    def nk():
        cnt[0] += 1
        return jax.random.fold_in(key, cnt[0])

    def add_cbr(prefix, cin, cout, k=1, groups=1):
        fan = k * k * cin // groups
        p[f"{prefix}.conv.weight"] = jax.random.normal(
            nk(), (k, k, cin // groups, cout)) * (2.0 / fan) ** 0.5
        p[f"{prefix}.bn.weight"] = jnp.ones(cout)
        p[f"{prefix}.bn.bias"] = jnp.zeros(cout)
        p[f"{prefix}.bn.running_mean"] = jnp.zeros(cout)
        p[f"{prefix}.bn.running_var"] = jnp.ones(cout)

    def add_stage(prefix, cin, stage):
        i = 0
        for (t, c, n, s) in stage:
            for _ in range(n):
                mid = cin * t
                add_cbr(f"{prefix}.{i}.pw", cin, mid)
                add_cbr(f"{prefix}.{i}.dw", mid, mid, k=3, groups=mid)
                add_cbr(f"{prefix}.{i}.pwl", mid, c)
                cin = c
                i += 1
        return cin

    add_cbr("backbone.first", 3, FIRST[0], k=3)
    cin = FIRST[0]
    for si, stage in enumerate(BACKBONE_STAGES):
        cin = add_stage(f"backbone.stage{si}", cin, stage)
    add_stage("rpn.stage", 96, RPN_STAGE)
    A = len(ANCHOR_SIZES) * len(ASPECT_RATIOS)
    p["rpn.head.conv.weight"] = jax.random.normal(nk(), (3, 3, 96, 96)) * 0.01
    p["rpn.head.conv.bias"] = jnp.zeros(96)
    p["rpn.head.cls_logits.weight"] = jax.random.normal(nk(), (1, 1, 96, A)) * 0.01
    p["rpn.head.cls_logits.bias"] = jnp.zeros(A)
    p["rpn.head.bbox_pred.weight"] = jax.random.normal(nk(), (1, 1, 96, A * 4)) * 0.01
    p["rpn.head.bbox_pred.bias"] = jnp.zeros(A * 4)
    cfin = add_stage("bbox.stage", 96, BBOX_STAGE)
    p["bbox.cls_score.weight"] = jax.random.normal(nk(), (cfin, NUM_CLASSES)) * 0.01
    p["bbox.cls_score.bias"] = jnp.zeros(NUM_CLASSES)
    p["bbox.bbox_pred.weight"] = jax.random.normal(
        nk(), (cfin, NUM_CLASSES * 4)) * 0.001
    p["bbox.bbox_pred.bias"] = jnp.zeros(NUM_CLASSES * 4)
    return p
