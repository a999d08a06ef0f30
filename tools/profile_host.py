#!/usr/bin/env python
"""Host-side breakdown of the bench loop: where do the ~45 ms of
tracker.track() go when device busy is only ~34 ms? cProfile over the
steady-state loop + a manual timeline of the track() phases."""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from vido_slam_tpu.config import config_from_dict
    from vido_slam_tpu.geometry.camera import convert_depth
    from vido_slam_tpu.models.maskrcnn.model import MaskRCNNConfig
    from vido_slam_tpu.models.perception import PerceptionModel
    from vido_slam_tpu.tracking import Tracker

    H, W = 192, 640
    cfg = config_from_dict({
        "Camera.width": W, "Camera.height": H,
        "Camera.fx": 408.201, "Camera.fy": 408.69,
        "Camera.cx": 304.1329, "Camera.cy": 133.344, "Camera.bf": 193.785,
        "ChooseData": 3, "DepthMapFactor": 500, "WINDOW_SIZE": 20,
        "MaxTrackPointBG": 3000, "MaxTrackPointOBJ": 800,
    })
    perception = PerceptionModel(H, W, MaskRCNNConfig(input_h=544, input_w=800),
                                 seed=0, use_pallas=True,
                                 mask_dtype=jnp.bfloat16)
    tracker = Tracker(cfg, n_bg=3000, n_obj=4000, max_objects=8, seed=0,
                      local_ba=True, ba_max_points=1000, ba_iters=10,
                      pipelined=True, fused_ba=True)
    rng = np.random.RandomState(0)
    n_warm, n_prof = 3, 25
    frames = [jnp.asarray((rng.rand(H, W, 3) * 255).astype(np.float32))
              for _ in range(n_warm + n_prof + 2)]
    convert = jax.jit(lambda d: convert_depth(
        d, "kaist", cfg.system.depth_map_factor, cfg.camera.bf, scale=1.0))

    def perceive(prev_img, cur_img):
        out = perception(prev_img, cur_img)
        return (convert(out.depth_u16), out.flow, out.mask.astype(jnp.int32))

    for i in range(n_warm):
        tracker.track(*perceive(frames[i], frames[i + 1]))
    jax.block_until_ready(tracker.state.Tcw)

    pr = cProfile.Profile()
    pending = perceive(frames[n_warm], frames[n_warm + 1])
    t0 = time.perf_counter()
    pr.enable()
    for i in range(n_warm, n_warm + n_prof):
        nxt = (perceive(frames[i + 1], frames[i + 2])
               if i + 1 < n_warm + n_prof else None)
        tracker.track(*pending)
        pending = nxt
    pr.disable()
    wall = (time.perf_counter() - t0) / n_prof * 1000
    print(f"steady-state wall: {wall:.1f} ms/frame over {n_prof} frames\n")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(30)
    for line in s.getvalue().splitlines():
        print(line[:160])


if __name__ == "__main__":
    main()
