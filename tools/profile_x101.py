#!/usr/bin/env python
"""Device timing of Mask R-CNN X-101-32x8d-FPN at the reference node's
actual input size (1088x800 HxW — predictor.py:282 resizes every frame to
cv2.resize(img, (800, 1088)); the min_size transform there is commented
out). Compares against R-50 at the bench's fast-row size 544x800.

Usage: python tools/profile_x101.py [--dtype bf16|f32] [--size HxW]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=20, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--size", default="1088x800")
    ap.add_argument("--arch", default="x101", choices=["x101", "r50"])
    ap.add_argument("--stages", action="store_true",
                    help="also time backbone/rpn/heads separately")
    args = ap.parse_args()

    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from vido_slam_tpu.models.maskrcnn.model import (
        MaskRCNNConfig, RESNEXT101_FPN, init_maskrcnn_params,
        maskrcnn_inference, paste_semantic_mask)

    h, w = (int(v) for v in args.size.split("x"))
    base = RESNEXT101_FPN if args.arch == "x101" else MaskRCNNConfig()
    cfg = base._replace(input_h=h, input_w=w)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    params = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda v: v.astype(dt),
        init_maskrcnn_params(k, cfg)))(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) * 255.0).astype(dt)

    def full(p, im):
        det = maskrcnn_inference(p, im, cfg)
        det = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, det)
        return paste_semantic_mask(det, h, w, 192, 640, cfg.mask_threshold)

    jfull = jax.jit(full)
    t = bench(jfull, params, img)
    print(f"{args.arch} {args.dtype} {h}x{w}: full inference+paste "
          f"{t:.2f} ms/im ({1000.0/t:.1f} im/s)")

    if args.stages:
        from vido_slam_tpu.models.maskrcnn.backbone import (
            fpn_forward, resnet_stages)
        jb = jax.jit(lambda p, im: fpn_forward(p, resnet_stages(p, im, cfg.resnet)))
        tb = bench(jb, params, img)
        print(f"  backbone+fpn: {tb:.2f} ms")


if __name__ == "__main__":
    main()
