#!/usr/bin/env python
"""Trace-profile ONE window-BA LM iteration body (bench shapes W=20,
P=1000): jit the normal-system build + Schur solve + cost pass standalone
and aggregate device op times, to see where the ~0.65 ms/iter goes."""
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
    import vido_slam_tpu.estimation.window_ba as wba

    W, P = 20, 1000
    rng = np.random.RandomState(0)
    pts = rng.uniform(-3, 3, (P, 3)) + [0, 0, 10.0]
    Twc = np.tile(np.eye(4), (W, 1, 1))
    Twc[:, :3, 3] = np.arange(W)[:, None] * [0.1, 0, 0]
    obs = pts[None] - Twc[:, None, :3, 3] + 0.05 * rng.randn(W, P, 3)
    odom = np.tile(np.eye(4), (W - 1, 1, 1))
    odom[:, 0, 3] = 0.1
    args = dict(
        Twc=jnp.asarray(Twc, jnp.float32),
        X=jnp.asarray(pts + 0.05 * rng.randn(P, 3), jnp.float32),
        obs=jnp.asarray(obs, jnp.float32),
        obs_valid=jnp.ones((W, P), bool),
        odom=jnp.asarray(odom, jnp.float32),
        odom_valid=jnp.ones(W - 1, bool),
    )

    # one full solve iteration == 10x body; easier: trace max_iters=10 solve
    f = jax.jit(lambda a: wba.solve_window_ba(
        a["Twc"], a["odom"], a["odom_valid"], a["X"], a["obs"],
        a["obs_valid"], jnp.ones(P, bool), jnp.ones(W, bool), max_iters=10))
    jax.block_until_ready(f(args))

    trace_dir = "/tmp/vido_ba_trace"
    os.system(f"rm -rf {trace_dir}")
    N = 20
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(N):
            out = f(args)
        jax.block_until_ready(out)
    it = int(out.num_iters)

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(paths[0]))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("jit_"):
                continue
            agg[name][0] += e["dur"] / 1000.0
            agg[name][1] += 1
            total += e["dur"] / 1000.0
    denom = N * max(it, 1)
    print(f"solve used {it} iters; device op-total {total/N:.3f} ms/solve, "
          f"{total/denom*1000:.1f} us/iter")
    for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:50]:
        print(f"{ms/denom*1000:8.1f} us/iter  x{cnt//N:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
