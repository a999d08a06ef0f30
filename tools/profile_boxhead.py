#!/usr/bin/env python
"""Sub-part timing of the Mask R-CNN box head: pooling (per level), level
select, FCs, postprocess (decode / per-class NMS / final top-k)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=30, warm=3):
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
    from vido_slam_tpu.models.maskrcnn.model import (
        MaskRCNNConfig, init_maskrcnn_params)
    from vido_slam_tpu.models.maskrcnn.roi_heads import (
        box_head_forward, pooled_features, postprocess_detections,
        assign_fpn_level, _decode_class_boxes)
    from vido_slam_tpu.ops.roi_align import roi_align
    from vido_slam_tpu.ops.nms import nms, clip_boxes

    cfg = MaskRCNNConfig(input_h=544, input_w=800)
    p = init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    R = 1000
    H, W = cfg.input_h, cfg.input_w
    shapes = [(H // s, W // s, 256) for s in (4, 8, 16, 32)]
    feats = [jnp.asarray(rng.rand(*sh).astype(np.float32)) for sh in shapes]
    x1 = rng.rand(R) * (W - 64)
    y1 = rng.rand(R) * (H - 64)
    rois = np.stack([x1, y1,
                     x1 + 8 + rng.rand(R) * 256,
                     y1 + 8 + rng.rand(R) * 128], axis=1)
    rois = jnp.asarray(np.clip(rois, 0, [W, H, W, H]).astype(np.float32))
    valid = jnp.ones((R,), bool)

    scales = (0.25, 0.125, 0.0625, 0.03125)
    for i, (f, s) in enumerate(zip(feats, scales)):
        fn = jax.jit(lambda f, r, s=s: roi_align(f, r, s, 7, 2))
        print(f"roi_align P{i+2} {f.shape}: {bench(fn, f, rois):.2f} ms")

    pooled = jax.jit(lambda fs, r: pooled_features(fs, r, 7))
    print(f"pooled_features (4 levels + select): {bench(pooled, feats, rois):.2f} ms")

    bh = jax.jit(lambda p, fs, r: box_head_forward(p, fs, r))
    print(f"box_head_forward (pool + FCs): {bench(bh, p, feats, rois):.2f} ms")

    logits, deltas = bh(p, feats, rois)
    logits = jax.block_until_ready(logits)

    dec = jax.jit(lambda d, r: _decode_class_boxes(d, r))
    print(f"decode boxes: {bench(dec, deltas, rois):.2f} ms")

    pp = jax.jit(lambda l, d, r, v: postprocess_detections(l, d, r, v, H, W))
    print(f"postprocess (softmax+decode+80xNMS+topk): {bench(pp, logits, deltas, rois, valid):.2f} ms")

    # isolated per-class NMS cost
    probs = jax.nn.softmax(logits, -1)
    boxes_all = clip_boxes(_decode_class_boxes(deltas, rois), H, W)

    def perclass_only(probs, boxes_all):
        def per_class(c_scores, c_boxes):
            s = jnp.where(valid & (c_scores > 0.05), c_scores, -jnp.inf)
            vals, idx = jax.lax.top_k(s, 64)
            ok = jnp.isfinite(vals)
            kidx, kok = nms(c_boxes[idx], vals, ok, 0.5, 64)
            return c_boxes[idx][kidx], vals[kidx], kok

        return jax.vmap(per_class, in_axes=(1, 1))(probs[:, 1:], boxes_all[:, 1:])

    pc = jax.jit(perclass_only)
    print(f"per-class topk+NMS only: {bench(pc, probs, boxes_all):.2f} ms")


if __name__ == "__main__":
    main()
