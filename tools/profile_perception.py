#!/usr/bin/env python
"""Per-stage device timing of the perception graph: depth / flow /
mask-rcnn (backbone, rpn, box head, mask head, paste) each jitted alone and
timed with block_until_ready. Usage: python tools/profile_perception.py"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=30, warm=3):
    """Amortised device time: dispatch n calls back-to-back (async) and
    block once — hides the tunnel RTT (~32 ms/blocking call on this host)
    that would otherwise floor every measurement."""
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / n


def main():
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from vido_slam_tpu.models.liteflownet import (
        init_liteflownet_params, liteflownet_forward)
    from vido_slam_tpu.models.maskrcnn.model import (
        MaskRCNNConfig, init_maskrcnn_params, maskrcnn_inference,
        paste_semantic_mask)
    from vido_slam_tpu.models.maskrcnn.backbone import (
        fpn_forward, resnet_stages)
    from vido_slam_tpu.models.maskrcnn.rpn import (
        ANCHOR_SIZES, ANCHOR_STRIDES, generate_cell_anchors, grid_anchors,
        rpn_head, select_over_all_levels, select_proposals_level)
    from vido_slam_tpu.models.maskrcnn.roi_heads import (
        box_head_forward, mask_head_forward, postprocess_detections)
    from vido_slam_tpu.models.monodepth2 import (
        FEED_HEIGHT, FEED_WIDTH, disp_to_uint16_depth,
        init_monodepth2_params, monodepth2_disp)
    from vido_slam_tpu.models.perception import PerceptionModel

    H, W = 192, 640
    cfg = MaskRCNNConfig(input_h=544, input_w=800)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    dp = init_monodepth2_params(k1)
    fp = init_liteflownet_params(k2)
    mp = init_maskrcnn_params(k3, cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, cfg.input_h, cfg.input_w, 3).astype(np.float32))
    d_in = jnp.asarray(rng.rand(1, FEED_HEIGHT, FEED_WIDTH, 3).astype(np.float32))
    f_in1 = jnp.asarray(rng.rand(1, 192, 640, 3).astype(np.float32))
    f_in2 = jnp.asarray(rng.rand(1, 192, 640, 3).astype(np.float32))

    print(f"depth net ({FEED_HEIGHT}x{FEED_WIDTH}):",
          f"{bench(jax.jit(monodepth2_disp), dp, d_in):.2f} ms")
    flow_fn = jax.jit(partial(liteflownet_forward, use_pallas=True))
    print(f"flow net (192x640, pallas): {bench(flow_fn, fp, f_in1, f_in2):.2f} ms")
    flow_fn2 = jax.jit(partial(liteflownet_forward, use_pallas=False))
    print(f"flow net (192x640, XLA corr): {bench(flow_fn2, fp, f_in1, f_in2):.2f} ms")

    # --- mask r-cnn stages ---
    bb = jax.jit(lambda p, im: fpn_forward(p, resnet_stages(p, im, cfg.resnet)))
    feats = bb(mp, img)
    print(f"mask backbone+fpn ({cfg.input_h}x{cfg.input_w}): "
          f"{bench(bb, mp, img):.2f} ms")

    def rpn_all(p, feats):
        lb, ls, lv = [], [], []
        for li, f in enumerate(feats):
            stride = ANCHOR_STRIDES[li]
            cell = generate_cell_anchors(stride, ANCHOR_SIZES[li])
            anchors = jnp.asarray(grid_anchors(f.shape[1], f.shape[2], stride, cell))
            logits, deltas = rpn_head(p, f, cell.shape[0])
            b, s, v = select_proposals_level(
                logits[0].reshape(-1), deltas[0].reshape(-1, 4), anchors,
                cfg.input_h, cfg.input_w)
            lb.append(b); ls.append(s); lv.append(v)
        return select_over_all_levels(lb, ls, lv)

    rpn_fn = jax.jit(rpn_all)
    proposals, pscores, pvalid = rpn_fn(mp, feats)
    print(f"rpn (5 levels, nms): {bench(rpn_fn, mp, feats):.2f} ms")

    p2_p5 = [f[0] for f in feats[:4]]

    def boxh(p, feats4, rois, rv):
        logits, deltas = box_head_forward(p, feats4, rois)
        return postprocess_detections(logits, deltas, rois, rv,
                                      cfg.input_h, cfg.input_w)

    boxh_fn = jax.jit(boxh)
    det = boxh_fn(mp, p2_p5, proposals, pvalid)
    print(f"box head (1000 rois) + postprocess: "
          f"{bench(boxh_fn, mp, p2_p5, proposals, pvalid):.2f} ms")

    maskh_fn = jax.jit(mask_head_forward)
    masks = maskh_fn(mp, p2_p5, det)
    print(f"mask head (100 dets): {bench(maskh_fn, mp, p2_p5, det):.2f} ms")

    from vido_slam_tpu.models.maskrcnn.model import MaskRCNNOutput
    out = MaskRCNNOutput(boxes=det.boxes, scores=det.scores,
                         labels=det.labels, valid=det.valid, masks28=masks)
    paste_fn = jax.jit(partial(paste_semantic_mask,
                               in_h=cfg.input_h, in_w=cfg.input_w,
                               out_h=H, out_w=W))
    print(f"paste semantic mask: {bench(paste_fn, out):.2f} ms")

    full = jax.jit(partial(maskrcnn_inference, cfg=cfg))
    print(f"mask r-cnn full: {bench(full, mp, img):.2f} ms")

    model = PerceptionModel(H, W, cfg, seed=0, use_pallas=True)
    print(f"fused perception: {bench(model.__call__, f_in1[0]*255, f_in2[0]*255):.2f} ms")

    # the bench default: detector in bf16 (discrete outputs, f32 box decode)
    model16 = PerceptionModel(H, W, cfg, seed=0, use_pallas=True,
                              mask_dtype=jnp.bfloat16)
    print("fused perception (mask bf16): "
          f"{bench(model16.__call__, f_in1[0]*255, f_in2[0]*255):.2f} ms")


if __name__ == "__main__":
    main()
