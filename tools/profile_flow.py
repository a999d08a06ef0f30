#!/usr/bin/env python
"""Device-trace breakdown of the full jitted LiteFlowNet at bench
resolution: aggregates trace op times (the per-module separate-jit approach
is dispatch-bound through the tunnel and useless)."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vido_slam_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from vido_slam_tpu.models.liteflownet import (
        init_liteflownet_params, liteflownet_forward)

    fp = init_liteflownet_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    im_a = jnp.asarray(rng.rand(1, 192, 640, 3).astype(np.float32))
    im_b = jnp.asarray(rng.rand(1, 192, 640, 3).astype(np.float32))
    full = jax.jit(partial(liteflownet_forward, use_pallas=True))
    for _ in range(3):
        jax.block_until_ready(full(fp, im_a, im_b))

    trace_dir = "/tmp/vido_flow_trace"
    os.system(f"rm -rf {trace_dir}")
    N = 8
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(N):
            out = full(fp, im_a, im_b)
        jax.block_until_ready(out)

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(paths[0]))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("jit_"):
                continue
            agg[name] += e["dur"] / 1000.0
            total += e["dur"] / 1000.0
    print(f"device op-total over {N} runs: {total:.1f} ms ({total/N:.2f}/run)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms/N:9.3f} ms/run  {name[:110]}")


if __name__ == "__main__":
    main()
