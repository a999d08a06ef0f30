#!/usr/bin/env python
"""Profile the fused tracking step on TPU: runs bench-shaped synthetic
frames under jax.profiler, then aggregates device-track op times from the
trace. Usage: python tools/profile_step.py [n_warm] [n_prof]"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from vido_slam_tpu.config import config_from_dict
    from vido_slam_tpu.tracking import Tracker

    H, W = 192, 640
    cfg = config_from_dict({
        "Camera.width": W, "Camera.height": H,
        "Camera.fx": 408.0, "Camera.fy": 408.0,
        "Camera.cx": W / 2, "Camera.cy": H / 2, "Camera.bf": 193.0,
        "ThDepthBG": 40.0, "ThDepthOBJ": 25.0, "WINDOW_SIZE": 20,
    })
    tracker = Tracker(cfg, n_bg=3000, n_obj=4000, max_objects=8, seed=0,
                      local_ba=True, ba_max_points=1000, ba_iters=10,
                      fused_ba=True)
    rng = np.random.RandomState(0)

    def frame(i):
        depth = 5.0 + 20.0 * rng.rand(H, W).astype(np.float32)
        flow = rng.randn(H, W, 2).astype(np.float32)
        mask = np.zeros((H, W), np.int32)
        mask[60:120, 200 + 2 * i:320 + 2 * i] = 3
        return depth, flow, mask

    for i in range(4):
        tracker.track(*frame(i))
    jax.block_until_ready(tracker.state.Tcw)

    trace_dir = "/tmp/vido_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(4, 8):
            tracker.track(*frame(i))
        jax.block_until_ready(tracker.state.Tcw)

    # parse the trace
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(paths[0]))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    spans = []
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "?")
            agg[name] += e["dur"] / 1000.0
            total += e["dur"] / 1000.0
            spans.append((e["ts"], e["ts"] + e["dur"]))
    # true device-busy time: union of event intervals (nesting double-counts)
    spans.sort()
    busy, cur_s, cur_e = 0.0, None, None
    for s0, e0 in spans:
        if cur_e is None or s0 > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s0, e0
        else:
            cur_e = max(cur_e, e0)
    if cur_e is not None:
        busy += cur_e - cur_s
    busy /= 1000.0
    print(f"device BUSY ms over 4 frames: {busy:.1f} ({busy/4:.1f}/frame)")
    print(f"total device ms over 4 frames: {total:.1f} ({total/4:.1f}/frame)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms/4:9.3f} ms/frame  {name[:110]}")


if __name__ == "__main__":
    main()
