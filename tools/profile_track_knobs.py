#!/usr/bin/env python
"""Isolate the fused tracking step's while-loop costs by toggling knobs:
window-BA iterations, pose/object LM caps, object budget. Times the jitted
step alone (dispatch-n, block-once) on bench-shaped synthetic inputs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_tracker(ba_iters=10, max_objects=8):
    from vido_slam_tpu.config import config_from_dict
    from vido_slam_tpu.tracking import Tracker

    H, W = 192, 640
    cfg = config_from_dict({
        "Camera.width": W, "Camera.height": H,
        "Camera.fx": 408.0, "Camera.fy": 408.0,
        "Camera.cx": W / 2, "Camera.cy": H / 2, "Camera.bf": 193.0,
        "ThDepthBG": 40.0, "ThDepthOBJ": 25.0, "WINDOW_SIZE": 20,
        "MaxTrackPointBG": 3000, "MaxTrackPointOBJ": 800,
    })
    return Tracker(cfg, n_bg=3000, n_obj=4000, max_objects=max_objects,
                   seed=0, local_ba=True, ba_max_points=1000,
                   ba_iters=ba_iters, fused_ba=True), H, W


def time_step(tracker, H, W, n=20):
    rng = np.random.RandomState(0)

    def frame(i):
        depth = 5.0 + 20.0 * rng.rand(H, W).astype(np.float32)
        flow = rng.randn(H, W, 2).astype(np.float32)
        mask = np.zeros((H, W), np.int32)
        mask[60:120, 200 + 2 * i:320 + 2 * i] = 3
        return (jnp.asarray(depth), jnp.asarray(flow), jnp.asarray(mask))

    fr = [frame(i) for i in range(4)]
    for i in range(4):
        tracker.track(*fr[i])
    jax.block_until_ready(tracker.state.Tcw)
    # time the raw jitted step only (no host record keeping)
    state = tracker.state
    gray = jnp.zeros((H, W), jnp.float32)
    key = jax.random.PRNGKey(1)
    d, f, m = fr[3]
    out = tracker._step(state, d, f, m, gray, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = tracker._step(state, d, f, m, gray, key)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / n


def main():
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import vido_slam_tpu.estimation.pose as pose_mod

    t, H, W = build_tracker()
    print(f"baseline (ba_iters=10, pose/obj cap 100, K=8): {time_step(t, H, W):.2f} ms")

    t, H, W = build_tracker(ba_iters=3)
    print(f"ba_iters=3: {time_step(t, H, W):.2f} ms")

    t, H, W = build_tracker(ba_iters=0)
    print(f"ba_iters=0 (no window BA): {time_step(t, H, W):.2f} ms")

    pose_mod.POSE_ITERS = 10
    t, H, W = build_tracker()
    print(f"pose cap 10: {time_step(t, H, W):.2f} ms")
    pose_mod.POSE_ITERS = 100

    pose_mod.OBJ_ITERS = 10
    t, H, W = build_tracker()
    print(f"obj cap 10: {time_step(t, H, W):.2f} ms")
    pose_mod.OBJ_ITERS = 100

    t, H, W = build_tracker(max_objects=2)
    print(f"max_objects=2: {time_step(t, H, W):.2f} ms")


if __name__ == "__main__":
    main()
