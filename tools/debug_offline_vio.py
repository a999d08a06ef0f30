#!/usr/bin/env python
"""Reproduce bench.py's kaist_offline_1280x560_vio row in isolation with
per-attempt init-scale logging (debugging the wrong-scale init seen in the
r5 bench smoke)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import bench
    from vido_slam_tpu.system import ImuPoint
    from vido_slam_tpu.tracking import Tracker
    from vido_slam_tpu.io.synthetic import driving_imu
    import vido_slam_tpu.estimation.imu_init as ii

    scales = []
    orig_init = ii.initialize_imu

    def spy(*a, **k):
        r = orig_init(*a, **k)
        scales.append(float(jax.device_get(r.scale)))
        return r

    ii.initialize_imu = spy

    caps = []

    scene, seq = bench._offline_sequence(30)
    cfg = bench.make_offline_config()
    fps = 10.0
    tracker = Tracker(cfg, n_bg=3000, n_obj=4000, max_objects=8, seed=0,
                      local_ba=True, ba_max_points=1000, ba_iters=10,
                      pipelined=True, fused_ba=True, use_imu=True)

    orig_try = tracker._try_initialize_imu

    def spy_try(ts):
        Rwb, twb = tracker._body_poses()
        pre = tracker._preints[: len(tracker.map) - 1]
        caps.append((ts, len(tracker.map), twb.copy(),
                     [None if p is None else (float(p.dT),
                                              np.asarray(p.dP).copy())
                      for p in pre]))
        return orig_try(ts)

    tracker._try_initialize_imu = spy_try
    dev = [(jnp.asarray(f.depth), jnp.asarray(f.flow),
            jnp.asarray(f.mask, jnp.int32)) for f in seq.frames]
    imu_clock = [0.0]

    def feed(t_frame):
        dt = 1.0 / 200.0
        ts = np.arange(imu_clock[0] + dt, t_frame + 1e-9, dt)
        if len(ts):
            acc, gyro = driving_imu(ts)
            tracker.grab_imu_data([ImuPoint(a=acc[i], w=gyro[i], t=float(t))
                                   for i, t in enumerate(ts)])
            imu_clock[0] = float(ts[-1])

    for i in range(len(seq.frames)):
        t = i / fps
        feed(t)
        tracker.track(*dev[i], timestamp=t)
        if tracker.imu_initialized:
            print(f"initialized at frame {i}")
            break
    tracker.finish()
    print("attempt scales:", scales)
    print("final:", tracker.imu_scale, "attempts:", tracker.imu_init_attempts)
    # visual trajectory sanity at init time
    est = tracker.map.poses
    gt = np.stack([f.Tcw_gt for f in seq.frames[: len(est)]])
    c_est = np.linalg.inv(est)[:, :3, 3]
    c_gt = np.linalg.inv(gt)[:, :3, 3]
    print("est z:", np.round(c_est[:, 2], 3))
    print("gt  z:", np.round(c_gt[:, 2], 3))
    if caps:
        ts, nmap, twb, pre = caps[0]
        print(f"first attempt: ts={ts} n={nmap}")
        print("attempt twb z:", np.round(twb[:, 2], 3))
        print("attempt preints dT/dPz:",
              [(None if p is None else (round(p[0], 3), round(float(p[1][2]), 3)))
               for p in pre[:8]])


if __name__ == "__main__":
    main()
