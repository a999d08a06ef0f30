#!/usr/bin/env python
"""MFU (model FLOP utilization) measurement helpers.

MFU = compiled-HLO FLOPs / device-busy-time / peak-FLOPs. FLOPs come from
XLA's own cost analysis of the compiled executable
(jit(f).lower(...).compile().cost_analysis()["flops"]), device-busy time
from a jax.profiler trace (the union of device-op spans — wall-clock
through the tunneled transport is NOT usable: block_until_ready returns at
dispatch-ack on this platform, and identical repeated programs are deduped;
measured 0.1 ms for a 1.1 TFLOP matmul).

Peak table: bf16 matmul peak per chip by device_kind. f32 convs on the MXU
run as 3-pass bf16 emulation, so an f32-heavy program's MFU is reported
against the bf16 peak — i.e. it counts the emulation overhead against the
program, which is the honest view for "how far from speed-of-light".
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
from collections import defaultdict

import jax

# bf16 peak matmul FLOP/s per chip (public spec sheets)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e (Trillium)
    "TPU v6e": 918e12,
    "cpu": 1e12,             # nominal; CPU runs are for correctness only
}


def peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if kind.lower().startswith(k.lower()):
            return v
    return 197e12


def compiled_flops(jitted, *args) -> float:
    """Total FLOPs XLA's cost analysis assigns to the compiled program."""
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def device_busy_ms(run, trace_dir: str = "/tmp/vido_mfu_trace") -> float:
    """Device-busy ms (union of device op spans) while `run()` executes.

    `run` must dispatch the work AND force completion with a real
    device->host fetch (jax.device_get of any output) — block_until_ready
    is a no-op on the tunneled transport.
    """
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        run()
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(paths[0]))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    spans = sorted(
        (e["ts"], e["ts"] + e["dur"]) for e in ev
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e)
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
    return busy / 1000.0


def measure_mfu(jitted, args, n: int = 8, fetch=None):
    """Run `jitted(*args)` n times under the profiler and report
    {flops_per_call, busy_ms_per_call, mfu, peak_flops}.

    fetch(out) -> a small leaf to device_get (defaults to the first leaf).
    """
    out0 = jitted(*args)
    leaves = jax.tree_util.tree_leaves(out0)
    pick = fetch if fetch is not None else (
        lambda o: jax.tree_util.tree_leaves(o)[0])
    jax.device_get(pick(out0))

    def run():
        out = None
        for _ in range(n):
            out = jitted(*args)
        jax.device_get(pick(out))

    busy = device_busy_ms(run)
    fl = compiled_flops(jitted, *args)
    peak = peak_flops()
    busy_per = busy / n
    mfu = fl / (busy_per / 1000.0) / peak if busy_per > 0 else 0.0
    return {
        "flops_per_call": fl,
        "busy_ms_per_call": round(busy_per, 3),
        "mfu": round(mfu, 4),
        "peak_flops": peak,
        "device": jax.devices()[0].device_kind,
    }


# CLI self-check lives in tools/mfu.py (big bf16 matmul near peak).
