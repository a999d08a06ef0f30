#!/usr/bin/env python
"""Profile the FULL bench pipeline (fused perception + tracking) under
jax.profiler and aggregate device op times, attributing each op to the
XLA program (jit function) it belongs to. Usage: python tools/profile_e2e.py
[--pair] — with --pair, profiles the bench's actual configuration (ONE
fused perception+tracking program per frame, two frames per dispatch via
track_frames_pair) instead of the separate-programs path.
"""
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
    # match bench.py defaults: detector in bf16
    perception = PerceptionModel(H, W, MaskRCNNConfig(input_h=544, input_w=800),
                                 seed=0, use_pallas=True,
                                 mask_dtype=jnp.bfloat16)
    tracker = Tracker(cfg, n_bg=3000, n_obj=4000, max_objects=8, seed=0,
                      local_ba=True, ba_max_points=1000, ba_iters=10,
                      pipelined=True, fused_ba=True)
    rng = np.random.RandomState(0)
    n_warm, n_prof = 3, 4
    frames = [jnp.asarray((rng.rand(H, W, 3) * 255).astype(np.float32))
              for _ in range(2 * (n_warm + n_prof) + 3)]
    pair = "--pair" in sys.argv
    trace_dir = "/tmp/vido_trace_e2e"
    os.system(f"rm -rf {trace_dir}")
    if pair:
        # the bench path: ONE program per frame pair (fused perception +
        # tracking), wall-clock floor = device busy + per-dispatch tunnel
        tracker.attach_perception(perception, "kaist",
                                  cfg.system.depth_map_factor, cfg.camera.bf)
        tracker.track_frames_pair(frames[0], frames[1], frames[2])
        for i in range(1, 2 * n_warm, 2):
            tracker.track_frames_pair(frames[i], frames[i + 1], frames[i + 2])
        jax.block_until_ready(tracker.state.Tcw)
        start = 2 * n_warm + 1
        with jax.profiler.trace(trace_dir):
            for i in range(start, start + n_prof, 2):
                tracker.track_frames_pair(frames[i], frames[i + 1],
                                          frames[i + 2])
            jax.block_until_ready(tracker.state.Tcw)
    else:
        convert = jax.jit(lambda d: convert_depth(
            d, "kaist", cfg.system.depth_map_factor, cfg.camera.bf, scale=1.0))

        def perceive(prev_img, cur_img):
            out = perception(prev_img, cur_img)
            return (convert(out.depth_u16), out.flow,
                    out.mask.astype(jnp.int32))

        for i in range(n_warm):
            tracker.track(*perceive(frames[i], frames[i + 1]))
        jax.block_until_ready(tracker.state.Tcw)

        with jax.profiler.trace(trace_dir):
            pending = perceive(frames[n_warm], frames[n_warm + 1])
            for i in range(n_warm, n_warm + n_prof):
                nxt = perceive(frames[i + 1], frames[i + 2])
                tracker.track(*pending)
                pending = nxt
            jax.block_until_ready(tracker.state.Tcw)

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(paths[0]))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
    # tid -> thread name gives the XLA module grouping on some backends;
    # fall back to grouping by top-level run_id from event args
    prog = defaultdict(float)     # program (jit name) -> ms
    op = defaultdict(float)       # (program, op) -> ms
    spans = []
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "?")
            args = e.get("args", {}) or {}
            mod = args.get("tf_op", args.get("hlo_module", "")) or ""
            if not mod:
                mod = name.split(".")[0]
            # jit_<fn> prefix is the program
            key = mod.split("/")[0] if "/" in mod else mod
            prog[key] += e["dur"] / 1000.0
            op[(key, name)] += e["dur"] / 1000.0
            spans.append((e["ts"], e["ts"] + e["dur"]))
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
    print(f"device BUSY: {busy:.1f} ms over {n_prof} frames "
          f"({busy/n_prof:.1f} ms/frame)")
    if pair:
        # MFU = compiled-HLO FLOPs / device-busy time / chip peak
        # (utils/mfu.py; wall clock is unusable on the tunneled transport)
        from vido_slam_tpu.utils.mfu import compiled_flops, peak_flops
        args = (tracker._pp, tracker.state, frames[0], frames[1],
                frames[2], tracker._effective_scale())
        fl = compiled_flops(tracker._step_frames2, *args) / 2.0  # per frame
        peak = peak_flops()
        mfu = fl / (busy / n_prof / 1000.0) / peak if busy else 0.0
        print(f"MFU: {mfu:.4f}  ({fl/1e9:.1f} GFLOP/frame @ "
              f"{peak/1e12:.0f} TFLOP/s peak)")
    print("\n== by program ==")
    for k, ms in sorted(prog.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{ms/n_prof:9.3f} ms/frame  {k[:100]}")
    print("\n== top ops ==")
    for (k, name), ms in sorted(op.items(), key=lambda kv: -kv[1])[:50]:
        print(f"{ms/n_prof:9.3f} ms/frame  [{k[:40]}] {name[:90]}")


if __name__ == "__main__":
    main()
