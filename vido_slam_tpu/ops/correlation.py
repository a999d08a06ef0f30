"""Cost-volume correlation — the LiteFlowNet CUDA kernel rebuilt for TPU.

Reference semantics (src/thirdparty/flow_net/src/correlation/correlation.py:
kernel_Correlation_updateOutput + _FunctionCorrelation.forward):
  input  f1, f2: (N, C, H, W), zero-padded by 3*stride;
  output: (N, 49, ceil(H/s), ceil(W/s)) with channel (p+3)*7+(o+3) holding
      mean_c f1[y, x, c] * f2[y + p*s, x + o*s, c]
  evaluated at strided positions (x, y) = (i*s, j*s).

Here in NHWC. Two implementations:
  - `correlation`: pure-XLA formulation as 49 shifted elementwise products —
    XLA fuses the shifts/multiplies/reductions into a tight loop over VMEM
    tiles, which is already near bandwidth-bound on TPU;
  - `correlation_pallas`: explicit Pallas kernel that keeps the f1 tile and
    the haloed f2 tile resident in VMEM across all 49 taps (one HBM read per
    input element instead of up to 49) — used on TPU for the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x (N, H, W, C) shifted so out[y, x] = x[y+dy, x+dx], zero-padded."""
    N, H, W, C = x.shape
    py0, py1 = max(0, -dy), max(0, dy)
    px0, px1 = max(0, -dx), max(0, dx)
    xp = jnp.pad(x, ((0, 0), (py0, py1), (px0, px1), (0, 0)))
    return lax.dynamic_slice(
        xp, (0, py0 + dy, px0 + dx, 0), (N, H, W, C)
    )


@functools.partial(jax.jit, static_argnames=("stride",))
def correlation(f1: jnp.ndarray, f2: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Cost volume (N, ceil(H/s), ceil(W/s), 49), NHWC, XLA formulation."""
    N, H, W, C = f1.shape
    f1s = f1[:, ::stride, ::stride, :]
    taps = []
    for p in range(-3, 4):
        for o in range(-3, 4):
            sh = _shift2d(f2, p * stride, o * stride)
            f2s = sh[:, ::stride, ::stride, :]
            taps.append(jnp.mean((f1s * f2s).astype(jnp.float32), axis=-1))
    return jnp.stack(taps, axis=-1).astype(f1.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------
#
# Row-tiled with the 3-tile halo pattern: each grid step sees its own f2 row
# tile plus the previous and next tiles (index maps clamp at the borders and
# out-of-image rows are zero-masked in-kernel, reproducing the CUDA kernel's
# zero padding). All 49 displacement products are computed from VMEM-resident
# tiles — one HBM read per f2 element instead of up to 49.

def _corr_kernel(f1_ref, f2m_ref, f2c_ref, f2p_ref, out_ref, *, stride: int,
                 row_tile_rows: int):
    s = stride
    TH = row_tile_rows
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    H = n_tiles * TH

    f1 = f1_ref[0]                                  # (TH, W, C)
    f2all = jnp.concatenate(
        [f2m_ref[0], f2c_ref[0], f2p_ref[0]], axis=0
    )                                               # (3*TH, W, C)
    W = f1.shape[1]

    # zero out rows that fall outside the image (border tiles read clamped
    # duplicates through the index map)
    row_global = (
        jax.lax.broadcasted_iota(jnp.int32, (3 * TH, 1), 0)[:, 0]
        + (i - 1) * TH
    )
    row_ok = (row_global >= 0) & (row_global < H)
    f2all = f2all * row_ok[:, None, None].astype(f1.dtype)

    # zero-pad x by 3s so x-shifts become static slices (explicit concat:
    # jnp.pad lowers poorly inside Mosaic)
    zx = jnp.zeros((3 * TH, 3 * s, f1.shape[-1]), f1.dtype)
    f2all = jnp.concatenate([zx, f2all, zx], axis=1)

    def strided(a, s0, s1):
        # stride-s subsampling via reshape+unit-slice (Mosaic supports
        # neither gather nor stride>1 slices)
        if s0 == 1 and s1 == 1:
            return a
        t, w, c = a.shape
        a = a.reshape(t // s0, s0, w // s1, s1, c)
        return a[:, 0, :, 0, :]

    # every tap's offsets (TH + p*s, 3s + o*s) are multiples of s, so a
    # single phase-0 subsample serves all 49 taps with unit-stride slices —
    # one temporary instead of three per tap, and 1/s^2 the VMEM at stride 2
    f1s = strided(f1, s, s)
    f2ph = strided(f2all, s, s)            # (3*TH/s, (W+6s)/s, C)
    THs = TH // s
    Ws = W // s
    inv_c = 1.0 / f1.shape[-1]
    for p in range(-3, 4):
        for o in range(-3, 4):
            f2s = jax.lax.slice(
                f2ph,
                (THs + p, 3 + o, 0),
                (THs + p + THs, 3 + o + Ws, f2ph.shape[-1]),
            )
            ch = (p + 3) * 7 + (o + 3)
            # write each tap straight to the output block so Mosaic can free
            # the slice buffers between taps (a 49-way stack OOMs VMEM).
            # Accumulate the C-length sum in f32: a bf16 sum over 192
            # channels loses ~2^-8*sqrt(C) relative accuracy.
            prod = (f1s * f2s).astype(jnp.float32)
            out_ref[0, :, :, ch] = (
                jnp.sum(prod, axis=-1) * inv_c
            ).astype(out_ref.dtype)


def _vmem_estimate(TH: int, W: int, C: int, s: int) -> int:
    """Conservative VMEM bytes for one grid step: 4 double-buffered input
    blocks, the concatenated+padded f2 scratch plus its phase subsample,
    per-tap temporaries (slice + product before reduction, a few alive at
    once), and the double-buffered output block."""
    blocks = 4 * 2 * TH * W * C * 4
    f2all = 2 * 3 * TH * (W + 6 * s) * C * 4  # concat + padded copy
    f2ph = 3 * (TH // s) * ((W + 6 * s) // s) * C * 4
    taps = 4 * (TH // s) * (W // s) * C * 4   # slice+product, ~2 live x2 slack
    out = 2 * (TH // s) * (W // s) * 49 * 4
    return blocks + f2all + f2ph + taps + out


def _pick_row_tile(H: int, W: int, C: int, s: int, max_tile: int,
                   budget: int = 10 * 1024 * 1024):
    """Largest TH that divides H, is a multiple of s, >= 3s (halo), and fits
    the VMEM budget. None if impossible."""
    best = None
    for TH in range(s, min(H, max_tile * s) + 1, s):
        if H % TH or TH < 3 * s:
            continue
        if _vmem_estimate(TH, W, C, s) <= budget:
            best = TH
    return best


def correlation_pallas(
    f1: jnp.ndarray, f2: jnp.ndarray, stride: int = 1, row_tile: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas cost volume; falls back to XLA on awkward shapes. `row_tile`
    caps the tile height; the actual tile is auto-sized to fit VMEM."""
    N, H, W, C = f1.shape
    s = stride
    if W % s != 0:
        return correlation(f1, f2, stride)
    TH = _pick_row_tile(H, W, C, s, row_tile)
    if TH is None:
        return correlation(f1, f2, stride)
    Ho, Wo = H // s, W // s
    n_tiles = H // TH

    grid = (N, n_tiles)
    clamp = lambda v, hi: jnp.clip(v, 0, hi)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_corr_kernel, stride=stride, row_tile_rows=TH),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, 49), f1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda n, i: (n, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, C),
                         lambda n, i: (n, clamp(i - 1, n_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, C), lambda n, i: (n, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, C),
                         lambda n, i: (n, clamp(i + 1, n_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH // s, Wo, 49), lambda n, i: (n, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(f1, f2, f2, f2)
    return out
