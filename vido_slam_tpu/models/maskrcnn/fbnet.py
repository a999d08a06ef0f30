"""FBNet mobile detector family — the reference's third backbone option
(maskrcnn_benchmark/modeling/backbone/{fbnet.py,fbnet_builder.py,
fbnet_modeldef.py}; 1081 LoC).

The full MODEL_ARCH registry is implemented (fbnet_modeldef.py:11-218 plus
MODEL_ARCH_CHAM): "default", "xirb16d_dsmask", "mobilenet_v2", "cham_v1a",
"cham_v2". Every arch is MobileNetV2-style inverted-residual (IRF) blocks
`ir_k{3,5,7}` (fbnet_builder.py:445-560 — the only op types any registered
arch uses) arranged per its block_cfg: a `first` conv, backbone stages of
[t, c, n, s] specs, an optional RPN feature stage and a bbox-head stage.

Detector shape: single-scale Faster R-CNN (no FPN) — RPN over the final
backbone stride with the five Detectron anchor sizes at one level,
ROIAlign on the trunk, the bbox IRF stage + global average pool as the box
head (fbnet.py FBNetROIHead). Reuses the framework's fixed-shape
RPN / NMS / ROIAlign machinery. Mask stages registered by "default" /
"xirb16d_dsmask" (negative-stride upsampling blocks) belong to the
reference's optional FBNet mask head, which this detector composition does
not instantiate — same as the reference's bbox-only FBNet configs.

IRF block: pw 1x1 conv+BN+relu (expansion t) -> depthwise kxk stride s
+BN+relu -> pw-linear 1x1+BN, residual iff stride 1 and cin == cout.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.models.layers import Params, batch_norm, conv2d, relu
from vido_slam_tpu.models.maskrcnn.rpn import generate_cell_anchors, grid_anchors
from vido_slam_tpu.ops.nms import clip_boxes, decode_boxes, nms
from vido_slam_tpu.ops.roi_align import roi_align

Stage = Tuple[Tuple[int, int, int, int], ...]   # ((t, c, n, s), ...)


class FBNetArch(NamedTuple):
    first: Tuple[int, int]          # (channels, stride)
    backbone: Tuple[Stage, ...]     # backbone stages
    rpn: Optional[Stage]            # RPN feature stage (None: trunk direct)
    bbox: Stage                     # bbox-head stage
    # depthwise kernel size per backbone block, flattened in block order;
    # None means all 3 (ir_k3). rpn/bbox stages are ir_k3 in every arch.
    backbone_k: Optional[Tuple[int, ...]] = None


def _expand(stage: Stage):
    """[t, c, n, s] specs -> per-block (t, c, stride) list."""
    out = []
    for (t, c, n, s) in stage:
        for j in range(n):
            out.append((t, c, s if j == 0 else 1))
    return out


# fbnet_modeldef.py MODEL_ARCH + MODEL_ARCH_CHAM, transcribed. Only the
# stages this detector composition consumes (backbone/rpn/bbox) appear.
MODEL_ARCH: Dict[str, FBNetArch] = {
    # fbnet_modeldef.py:12-56
    "default": FBNetArch(
        first=(32, 2),
        backbone=(((1, 16, 1, 1),), ((6, 24, 2, 2),), ((6, 32, 3, 2),),
                  ((6, 64, 4, 2), (6, 96, 3, 1))),
        rpn=((6, 96, 3, 1),),
        bbox=((4, 160, 1, 2), (6, 160, 2, 1), (6, 240, 1, 1)),
    ),
    # fbnet_modeldef.py:57-100 (16-ch first conv, narrower trunk)
    "xirb16d_dsmask": FBNetArch(
        first=(16, 2),
        backbone=(((1, 16, 1, 1),), ((6, 32, 2, 2),), ((6, 48, 3, 2),),
                  ((6, 96, 4, 2), (6, 128, 3, 1))),
        rpn=((6, 128, 3, 1),),
        bbox=((4, 128, 1, 2), (6, 128, 2, 1), (6, 160, 1, 1)),
    ),
    # fbnet_modeldef.py:101-135 (no dedicated rpn stage)
    "mobilenet_v2": FBNetArch(
        first=(32, 2),
        backbone=(((1, 16, 1, 1),), ((6, 24, 2, 2),), ((6, 32, 3, 2),),
                  ((6, 64, 4, 2), (6, 96, 3, 1))),
        rpn=None,
        bbox=((6, 160, 3, 1), (6, 320, 1, 1)),
    ),
    # fbnet_modeldef.py MODEL_ARCH_CHAM "cham_v1a" (ir_k7/ir_k5 mixes)
    "cham_v1a": FBNetArch(
        first=(32, 2),
        backbone=(((1, 24, 1, 1),), ((4, 48, 2, 2),), ((7, 64, 5, 2),),
                  ((12, 56, 7, 2), (8, 88, 5, 1))),
        rpn=((8, 88, 3, 1),),
        bbox=((7, 152, 4, 2), (10, 104, 1, 1)),
        backbone_k=(3,) + (7,) * 2 + (3,) * 5 + (5,) * 7 + (3,) * 5,
    ),
    # fbnet_modeldef.py MODEL_ARCH_CHAM "cham_v2"
    "cham_v2": FBNetArch(
        first=(32, 2),
        backbone=(((1, 24, 1, 1),), ((8, 32, 4, 2),), ((5, 48, 6, 2),),
                  ((9, 56, 3, 2), (6, 56, 6, 1))),
        rpn=((6, 56, 1, 1),),
        bbox=((2, 160, 6, 2), (6, 112, 1, 1)),
        backbone_k=(3,) + (5,) * 4 + (7,) * 6 + (5,) * 3 + (3,) * 6,
    ),
}

# back-compat aliases for the "default" arch layout
FIRST = MODEL_ARCH["default"].first
BACKBONE_STAGES: List[List[Tuple[int, int, int, int]]] = [
    list(s) for s in MODEL_ARCH["default"].backbone]
RPN_STAGE = list(MODEL_ARCH["default"].rpn)
BBOX_STAGE = list(MODEL_ARCH["default"].bbox)
TRUNK_STRIDE = 16
NUM_CLASSES = 81
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
PRE_NMS_TOP_N = 600
POST_NMS_TOP_N = 200
DETECTIONS = 100


def _trunk_channels(arch: FBNetArch) -> int:
    return arch.backbone[-1][-1][1]


def _stage_out_channels(stage: Stage) -> int:
    return stage[-1][1]


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
    """IRFBlock.forward (fbnet_builder.py:549-560). The depthwise kernel
    size rides in the stored weight shape (ir_k3/k5/k7)."""
    mid = cin * expansion
    y = _cbr(p, f"{prefix}.pw", x)
    y = _cbr(p, f"{prefix}.dw", y, stride=stride, groups=mid)
    y = _cbr(p, f"{prefix}.pwl", y, act=False)
    if stride == 1 and cin == cout:
        y = y + x
    return y


def _run_stage(p, prefix, x, cin, stage):
    for i, (t, c, stride) in enumerate(_expand(tuple(map(tuple, stage)))):
        x = irf_block(p, f"{prefix}.{i}", x, cin, c, t, stride)
        cin = c
    return x, cin


def fbnet_trunk(p: Params, image: jnp.ndarray,
                arch: str = "default") -> jnp.ndarray:
    """(N, H, W, 3) -> (N, H/16, W/16, C_trunk)."""
    a = MODEL_ARCH[arch]
    x = _cbr(p, "backbone.first", image, stride=a.first[1])
    cin = a.first[0]
    for si, stage in enumerate(a.backbone):
        x, cin = _run_stage(p, f"backbone.stage{si}", x, cin, stage)
    return x


class FBNetDetections(NamedTuple):
    boxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray


@partial(jax.jit, static_argnames=("input_h", "input_w", "arch"))
def fbnet_inference(p: Params, image: jnp.ndarray,
                    input_h: int, input_w: int,
                    arch: str = "default") -> FBNetDetections:
    a = MODEL_ARCH[arch]
    ct = _trunk_channels(a)
    trunk = fbnet_trunk(p, image, arch)
    # --- RPN over the single stride-16 level ---
    if a.rpn is not None:
        rpn_feat, cr = _run_stage(p, "rpn.stage", trunk, ct, a.rpn)
    else:
        rpn_feat, cr = trunk, ct
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
    x, cfin = _run_stage(p, "bbox.stage", x, ct, a.bbox)
    x = jnp.mean(x, axis=(1, 2))  # (R, C_bbox)
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


def init_fbnet_params(key, arch: str = "default") -> Params:
    a = MODEL_ARCH[arch]
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

    def add_stage(prefix, cin, stage, ks=None):
        for i, (t, c, stride) in enumerate(_expand(tuple(map(tuple, stage)))):
            mid = cin * t
            k = 3 if ks is None else ks[i]
            add_cbr(f"{prefix}.{i}.pw", cin, mid)
            add_cbr(f"{prefix}.{i}.dw", mid, mid, k=k, groups=mid)
            add_cbr(f"{prefix}.{i}.pwl", mid, c)
            cin = c
        return cin

    add_cbr("backbone.first", 3, a.first[0], k=3)
    cin = a.first[0]
    off = 0
    for si, stage in enumerate(a.backbone):
        n_blocks = len(_expand(tuple(map(tuple, stage))))
        ks = (a.backbone_k[off:off + n_blocks]
              if a.backbone_k is not None else None)
        cin = add_stage(f"backbone.stage{si}", cin, stage, ks)
        off += n_blocks
    ct = _trunk_channels(a)
    cr = add_stage("rpn.stage", ct, a.rpn) if a.rpn is not None else ct
    A = len(ANCHOR_SIZES) * len(ASPECT_RATIOS)
    p["rpn.head.conv.weight"] = jax.random.normal(nk(), (3, 3, cr, cr)) * 0.01
    p["rpn.head.conv.bias"] = jnp.zeros(cr)
    p["rpn.head.cls_logits.weight"] = jax.random.normal(nk(), (1, 1, cr, A)) * 0.01
    p["rpn.head.cls_logits.bias"] = jnp.zeros(A)
    p["rpn.head.bbox_pred.weight"] = jax.random.normal(nk(), (1, 1, cr, A * 4)) * 0.01
    p["rpn.head.bbox_pred.bias"] = jnp.zeros(A * 4)
    cfin = add_stage("bbox.stage", ct, a.bbox)
    p["bbox.cls_score.weight"] = jax.random.normal(nk(), (cfin, NUM_CLASSES)) * 0.01
    p["bbox.cls_score.bias"] = jnp.zeros(NUM_CLASSES)
    p["bbox.bbox_pred.weight"] = jax.random.normal(
        nk(), (cfin, NUM_CLASSES * 4)) * 0.001
    p["bbox.bbox_pred.bias"] = jnp.zeros(NUM_CLASSES * 4)
    return p
