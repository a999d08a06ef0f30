"""Fused LiteFlowNet regularization tail — Pallas TPU kernel.

The reference Regularization module (src/thirdparty/flow_net/src/layers.py:
207-272) ends in a distance-weighted local filter of the flow:

    d   = exp(-dist^2 - max)                    (softmax-style, K = k*k taps)
    sx  = Conv1x1(d * unfold(u), Wx, bx) / sum(d)
    sy  = Conv1x1(d * unfold(v), Wy, by) / sum(d)

As XLA ops this materialises two (N, H, W, K) unfold tensors plus their
products with d — at level 2 (96x320, K=49) that is ~36 MB of HBM traffic
per image for ~0.1 MFLOP of useful work, across ~12 dispatched ops. The
Pallas kernel below computes the whole tail from VMEM-resident tiles: the
dist logits and a 3-tile haloed flow strip stay on-chip, every tap is a
static slice, and only three (N, H, W) planes return to HBM.

Layout: the K tap axis rides on the LEADING (sublane-block) dim inside the
kernel — `e[ch]` is then a free plane index. Keeping K on the lane axis
instead makes every per-tap slice a cross-lane relayout: Mosaic materialises
each one on the scoped-vmem stack and the kernel OOMs at ~100 MB (measured).
The (N, H, W, K) -> (N, K, H, W) transpose happens once in XLA outside.

Row-tiled with the same clamped-index halo pattern as ops/correlation.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dist_weighted_flow(dc, u, v, wx, bx, wy, by, k: int):
    """Pure-XLA reference: dc (N, H, W, K) raw netDist output, u/v (N, H, W)
    flow components, wx/wy (K,) 1x1-conv weights, bx/by scalar biases.
    Returns (sx, sy) each (N, H, W). Channel (dy)*k+(dx) of the unfold
    holds x[y+dy-r, x+dx-r] (zero padded), r=(k-1)//2 — the
    models/layers.py::unfold_channels order."""
    r = (k - 1) // 2
    f32 = jnp.float32
    d1 = -(dc.astype(f32) * dc.astype(f32))
    e = jnp.exp(d1 - jnp.max(d1, axis=-1, keepdims=True))
    inv = 1.0 / jnp.sum(e, axis=-1)
    N, H, W, K = dc.shape
    up = jnp.pad(u.astype(f32), ((0, 0), (r, r), (r, r)))
    vp = jnp.pad(v.astype(f32), ((0, 0), (r, r), (r, r)))
    accx = jnp.zeros((N, H, W), f32)
    accy = jnp.zeros((N, H, W), f32)
    for dy in range(k):
        for dx in range(k):
            ch = dy * k + dx
            ut = lax.dynamic_slice(up, (0, dy, dx), (N, H, W))
            vt = lax.dynamic_slice(vp, (0, dy, dx), (N, H, W))
            accx = accx + wx[ch].astype(f32) * e[..., ch] * ut
            accy = accy + wy[ch].astype(f32) * e[..., ch] * vt
    sx = (accx + bx.astype(f32)) * inv
    sy = (accy + by.astype(f32)) * inv
    return sx.astype(dc.dtype), sy.astype(dc.dtype)


def _reg_kernel(wx_ref, wy_ref, dc_ref, um_ref, uc_ref, up_ref, vm_ref,
                vc_ref, vp_ref, accx_ref, accy_ref, inv_ref, *, k: int,
                row_tile_rows: int):
    """One (batch, row-tile) grid step. dc arrives (1, K, TH, W); the
    1x1-conv weights fold into the exp planes; biases are applied by the
    caller from the `inv` output (no scalar operands)."""
    r = (k - 1) // 2
    TH = row_tile_rows
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    H = n_tiles * TH
    f32 = jnp.float32

    dc = dc_ref[0].astype(f32)                    # (K, TH, W)
    W = dc.shape[2]
    d1 = -(dc * dc)
    m = jnp.max(d1, axis=0)                       # (TH, W)
    e = jnp.exp(d1 - m[None])                     # (K, TH, W)
    inv = 1.0 / jnp.sum(e, axis=0)
    ex = e * wx_ref[:].astype(f32)                # (K, 1, 1) broadcast
    ey = e * wy_ref[:].astype(f32)

    # haloed flow strips; border tiles read clamped duplicates through the
    # index map — zero them (the unfold is zero-padded)
    row_global = (
        jax.lax.broadcasted_iota(jnp.int32, (3 * TH, 1), 0)[:, 0]
        + (i - 1) * TH
    )
    row_ok = ((row_global >= 0) & (row_global < H)).astype(f32)[:, None]

    def haloed(m_ref, c_ref, p_ref):
        s = jnp.concatenate(
            [m_ref[0], c_ref[0], p_ref[0]], axis=0).astype(f32) * row_ok
        zx = jnp.zeros((3 * TH, r), f32)
        return jnp.concatenate([zx, s, zx], axis=1)  # (3TH, W + 2r)

    uall = haloed(um_ref, uc_ref, up_ref)
    vall = haloed(vm_ref, vc_ref, vp_ref)

    accx = jnp.zeros((TH, W), f32)
    accy = jnp.zeros((TH, W), f32)
    for dy in range(k):
        for dx in range(k):
            ch = dy * k + dx
            ut = jax.lax.slice(uall, (TH + dy - r, dx), (2 * TH + dy - r, dx + W))
            vt = jax.lax.slice(vall, (TH + dy - r, dx), (2 * TH + dy - r, dx + W))
            accx = accx + ex[ch] * ut
            accy = accy + ey[ch] * vt
    accx_ref[0] = accx
    accy_ref[0] = accy
    inv_ref[0] = inv


def _vmem_estimate(TH: int, W: int, K: int) -> int:
    """Rough VMEM bytes per grid step: the (K, TH, W) dc block (double-
    buffered) plus the d1/e/ex/ey planes (lane dim pads W to 128s), halo
    strips, accumulators and outputs."""
    Wl = -(-W // 128) * 128
    dc_block = 2 * K * TH * Wl * 4
    planes = 4 * K * TH * Wl * 4                         # d1, e, ex, ey
    strips = 2 * (2 + 1) * 3 * TH * Wl * 4               # concat + padded, u+v
    accs = 8 * TH * Wl * 4                               # acc + tap temps
    outs = 2 * 3 * TH * Wl * 4
    return dc_block + planes + strips + accs + outs


def _pick_row_tile(H: int, W: int, K: int, max_tile: int = 64,
                   budget: int = 10 * 1024 * 1024, min_tile: int = 1):
    """Largest row tile within the VMEM budget. `min_tile` must be >= the
    kernel halo radius (_reg_kernel reads one tile above/below, so slices
    like uall[TH + dy - r : ...] need TH >= r); shapes with no feasible
    tile return None and the caller falls back to the XLA path."""
    best = None
    for TH in range(max(1, min_tile), min(H, max_tile) + 1):
        if H % TH:
            continue
        if _vmem_estimate(TH, W, K) <= budget:
            best = TH
    return best


def dist_weighted_flow_pallas(dc, u, v, wx, bx, wy, by, k: int,
                              interpret: bool = False):
    """Fused Pallas version of `dist_weighted_flow`; falls back to XLA on
    awkward shapes (the caller gates on use_pallas for the backend)."""
    N, H, W, K = dc.shape
    assert K == k * k
    TH = _pick_row_tile(H, W, K, min_tile=(k - 1) // 2)
    if TH is None or H % TH:
        return dist_weighted_flow(dc, u, v, wx, bx, wy, by, k)
    n_tiles = H // TH
    dct = jnp.transpose(dc, (0, 3, 1, 2))          # (N, K, H, W), one op
    wxr = wx.astype(jnp.float32).reshape(K, 1, 1)
    wyr = wy.astype(jnp.float32).reshape(K, 1, 1)
    grid = (N, n_tiles)
    clamp = lambda vv, hi: jnp.clip(vv, 0, hi)  # noqa: E731
    flow_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, TH, W),
        lambda n, i, off=off: (n, clamp(i + off, n_tiles - 1), 0),
        memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((1, TH, W), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM)
    accx, accy, inv = pl.pallas_call(
        functools.partial(_reg_kernel, k=k, row_tile_rows=TH),
        out_shape=(jax.ShapeDtypeStruct((N, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((N, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((N, H, W), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, 1, 1), lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, 1), lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, TH, W), lambda n, i: (n, 0, i, 0),
                         memory_space=pltpu.VMEM),
            flow_spec(-1), flow_spec(0), flow_spec(1),
            flow_spec(-1), flow_spec(0), flow_spec(1),
        ],
        out_specs=(plane, plane, plane),
        interpret=interpret,
    )(wxr, wyr, dct, u, u, u, v, v, v)
    sx = (accx + bx.astype(jnp.float32)) * inv
    sy = (accy + by.astype(jnp.float32)) * inv
    return sx.astype(dc.dtype), sy.astype(dc.dtype)
