"""ROIAlign — TPU replacement for maskrcnn_benchmark's CUDA/CPU ROIAlign
(reference src/thirdparty/mask_rcnn/maskrcnn_benchmark/csrc/{cuda/
ROIAlign_cuda.cu, cpu/ROIAlign_cpu.cpp}).

Detectron-1 convention (no half-pixel shift): roi_start = roi * scale;
bin (ph, pw) samples a `sampling_ratio` x `sampling_ratio` grid at
  y = roi_start_h + ph*bin_h + (iy + 0.5) * bin_h / ratio
and averages; samples outside (-1, size-1) contribute zero, in-range
coordinates clamp (csrc bilinear_interpolate).

TPU formulation: bilinear interpolation over an axis-aligned grid is
SEPARABLE, so each ROI's pooled output is out = Ry @ F @ Rx^T with
per-ROI hat-function weight matrices Ry (r, H), Rx (r, W) that already fold
the sampling-grid average. Two batched matmuls on the MXU replace millions
of per-pixel gathers (XLA's generic gather is the slowest primitive on this
hardware — profiled at ~85% of the whole detector). ROIs are processed in
chunks to bound the (chunk, r, W, C) intermediate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _hat_weights(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """pos (..., S) float sample coordinates -> (..., S, size) bilinear
    weights with the csrc clamping/zeroing semantics."""
    ks = lax.broadcasted_iota(jnp.float32, (size, 1), 0)[:, 0]
    inside = (pos >= -1.0) & (pos <= size - 1.0)
    p = jnp.clip(pos, 0.0, size - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None] - ks))
    return w * inside[..., None]


@partial(jax.jit, static_argnames=("resolution", "sampling_ratio", "chunk"))
def roi_align(
    feat: jnp.ndarray,      # (H, W, C) one level's feature map (single image)
    rois: jnp.ndarray,      # (R, 4) xyxy in image coords
    spatial_scale: float,
    resolution: int = 7,
    sampling_ratio: int = 2,
    chunk: int = 128,
) -> jnp.ndarray:
    """Returns (R, resolution, resolution, C)."""
    H, W, C = feat.shape
    r = resolution
    s = sampling_ratio
    R = rois.shape[0]

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / r
    bin_h = jnp.maximum(y2 - y1, 1.0) / r

    ph = lax.broadcasted_iota(jnp.float32, (r, 1), 0)[:, 0]
    frac = (lax.broadcasted_iota(jnp.float32, (s, 1), 0)[:, 0] + 0.5) / s
    # sample positions (R, r, s)
    ys = y1[:, None, None] + (ph[None, :, None] + frac[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (ph[None, :, None] + frac[None, None, :]) * bin_w[:, None, None]
    # fold the s-sample average into the weight matrices: (R, r, H)/(R, r, W).
    # Weights follow feat's dtype: with f32 weights a bf16 feature map would
    # silently promote both einsums (and the huge t intermediate) to f32 —
    # the t HBM round-trip is the dominant cost of the box head.
    Ry = (jnp.sum(_hat_weights(ys, H), axis=2) / s).astype(feat.dtype)
    Rx = (jnp.sum(_hat_weights(xs, W), axis=2) / s).astype(feat.dtype)

    n_chunks = -(-R // chunk)
    pad_to = n_chunks * chunk

    def padc(a):
        return jnp.pad(a, [(0, pad_to - R)] + [(0, 0)] * (a.ndim - 1)).reshape(
            (n_chunks, chunk) + a.shape[1:]
        )

    Fy = feat.reshape(H, W * C)

    def one_chunk(_, rw):
        ry, rx = rw  # (chunk, r, H), (chunk, r, W)
        t = jnp.einsum(
            "bph,hx->bpx", ry, Fy, precision=lax.Precision.DEFAULT
        ).reshape(chunk, r, W, C)
        out = jnp.einsum(
            "bpwc,bqw->bpqc", t, rx, precision=lax.Precision.DEFAULT
        )
        return None, out

    _, outs = lax.scan(one_chunk, None, (padc(Ry), padc(Rx)))
    return outs.reshape(pad_to, r, r, C)[:R]


# ---------------------------------------------------------------------------
# Multi-level (FPN) ROIAlign in ONE pass. maskrcnn_benchmark's Pooler
# (modeling/poolers.py) routes each ROI to one pyramid level; the naive
# fixed-shape realisation runs ROIAlign on ALL levels and selects, doing 4x
# the work. Instead: concatenate the pyramid along rows (widths padded to
# the max), and build each ROI's y-weight matrix against the CONCATENATED
# row axis with its nonzeros confined to the assigned level's row band (the
# per-level clamp keeps hat supports inside the band, so levels never
# bleed). One chunked matmul pair replaces four + a (4,R,...) gather-select;
# the (chunk, r, Wmax, C) intermediate is ~2x smaller than the four
# per-level ones combined. Numerics equal the per-level path exactly.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("resolution", "sampling_ratio", "chunk"))
def roi_align_multilevel(
    feats: tuple,            # P2..P5, each (H_l, W_l, C), same C
    rois: jnp.ndarray,       # (R, 4) xyxy image coords
    levels: jnp.ndarray,     # (R,) int32 in [0, L)
    spatial_scales: tuple,   # per-level scale
    resolution: int = 7,
    sampling_ratio: int = 2,
    chunk: int = 128,
) -> jnp.ndarray:
    """Returns (R, resolution, resolution, C); each ROI pooled from its
    assigned level with csrc ROIAlign semantics."""
    L = len(feats)
    C = feats[0].shape[2]
    Hs = [f.shape[0] for f in feats]
    Ws = [f.shape[1] for f in feats]
    Wmax = max(Ws)
    offs = [0] * L
    for i in range(1, L):
        offs[i] = offs[i - 1] + Hs[i - 1]
    Htot = offs[-1] + Hs[-1]
    fcat = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, Wmax - f.shape[1]), (0, 0))) for f in feats],
        axis=0,
    )  # (Htot, Wmax, C)

    r = resolution
    s = sampling_ratio
    R = rois.shape[0]
    scale = jnp.asarray(spatial_scales, jnp.float32)[levels]        # (R,)
    Hl = jnp.asarray(Hs, jnp.float32)[levels]
    Wl = jnp.asarray(Ws, jnp.float32)[levels]
    off = jnp.asarray(offs, jnp.float32)[levels]

    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    x2 = rois[:, 2] * scale
    y2 = rois[:, 3] * scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / r
    bin_h = jnp.maximum(y2 - y1, 1.0) / r
    ph = lax.broadcasted_iota(jnp.float32, (r, 1), 0)[:, 0]
    frac = (lax.broadcasted_iota(jnp.float32, (s, 1), 0)[:, 0] + 0.5) / s
    ys = y1[:, None, None] + (ph[None, :, None] + frac[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (ph[None, :, None] + frac[None, None, :]) * bin_w[:, None, None]

    def hat_banded(pos, size_r, off_r, total):
        # csrc semantics against the ROI's own level (size size_r), then
        # shifted by the level's row offset into the concatenated axis
        ks = lax.broadcasted_iota(jnp.float32, (total, 1), 0)[:, 0]
        sz = size_r[:, None, None]
        inside = (pos >= -1.0) & (pos <= sz - 1.0)
        p = jnp.clip(pos, 0.0, sz - 1.0) + off_r[:, None, None]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None] - ks))
        return w * inside[..., None]

    Ry = (jnp.sum(hat_banded(ys, Hl, off, Htot), axis=2) / s).astype(fcat.dtype)
    Rx = (jnp.sum(hat_banded(xs, Wl, jnp.zeros_like(off), Wmax), axis=2) / s
          ).astype(fcat.dtype)

    import os as _os
    if (_os.environ.get("VIDO_ROI_PALLAS", "0") == "1"
            and jax.default_backend() == "tpu" and C % 64 == 0):
        return roi_align_fused_pallas(fcat, Ry, Rx, resolution)

    n_chunks = -(-R // chunk)
    pad_to = n_chunks * chunk

    def padc(a):
        return jnp.pad(a, [(0, pad_to - R)] + [(0, 0)] * (a.ndim - 1)).reshape(
            (n_chunks, chunk) + a.shape[1:]
        )

    Fy = fcat.reshape(Htot, Wmax * C)

    def one_chunk(_, rw):
        ry, rx = rw
        t = jnp.einsum(
            "bph,hx->bpx", ry, Fy, precision=lax.Precision.DEFAULT
        ).reshape(chunk, r, Wmax, C)
        out = jnp.einsum(
            "bpwc,bqw->bpqc", t, rx, precision=lax.Precision.DEFAULT
        )
        return None, out

    _, outs = lax.scan(one_chunk, None, (padc(Ry), padc(Rx)))
    return outs.reshape(pad_to, r, r, C)[:R]


# ---------------------------------------------------------------------------
# A VMEM-resident Pallas variant was explored and REMOVED (see git history):
# keeping the (chunk, r, W, C) intermediate in VMEM avoids its HBM
# round-trip, but the x-contraction then decomposes into per-ROI
# (M=7, K=W_tile, N=C) dots that underfill the 128x128 MXU ~18x — measured
# slower than the XLA path above except on the smallest pyramid level, and
# the banded/sorted-window redesign hits the same per-ROI-small-matmul wall
# (the separable structure fundamentally wants per-ROI weight matrices).
# The XLA formulation's y-contraction runs near MXU peak and the t
# round-trip is the residual cost; revisit only if Mosaic gains fused
# multi-dot support.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Fused Pallas variant, round 5. The earlier removed attempt kept per-ROI
# weight matmuls tiny (see note above); this one keeps the XLA path's LARGE
# y-contraction matmul shape but (a) holds the feature slab VMEM-RESIDENT
# across ROI chunks by making the channel tile the OUTER grid axis (the
# block index map repeats, so Pallas skips the re-fetch), and (b) applies
# the x-contraction in-kernel while `t` is still in VMEM — the
# (chunk, r, Wmax, C) t intermediate's HBM round-trip was the dominant
# non-MXU cost of the XLA formulation (~1.4 GB/frame at R=1000).
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl      # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _roi_fused_kernel(f_ref, ry_ref, rx_ref, out_ref, *, r: int, CH: int):
    Fc = f_ref[...]                            # (Hp, Wmax, CT)
    Hp, Wmax, CT = Fc.shape
    A = ry_ref[...].reshape(CH * r, Hp)        # (CH*r, Hp)
    t = jax.lax.dot_general(
        A, Fc.reshape(Hp, Wmax * CT), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # (CH*r, Wmax*CT) f32
    t = t.astype(f_ref.dtype)
    for b in range(CH):
        tb = t[b * r:(b + 1) * r].reshape(r, Wmax, CT)
        tb = jnp.swapaxes(tb, 0, 1)            # (Wmax, r, CT) sublane perm
        rx_b = rx_ref[b]                       # (r, Wmax)
        ob = jax.lax.dot_general(
            rx_b, tb.reshape(Wmax, r * CT), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # (q, p*CT): rows are q
        ob = jnp.swapaxes(ob.reshape(r, r, CT), 0, 1)   # -> (p, q, CT)
        out_ref[b] = ob.astype(out_ref.dtype)


def roi_align_fused_pallas(
    fcat: jnp.ndarray,     # (Htot, Wmax, C) concatenated pyramid
    Ry: jnp.ndarray,       # (R, r, Htot) y-weights (already averaged)
    Rx: jnp.ndarray,       # (R, r, Wmax) x-weights
    resolution: int,
    chunk: int = 8,
    c_tile: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """out (R, r, r, C) = per-ROI Ry @ F @ Rx^T with t kept in VMEM."""
    Htot, Wmax, C = fcat.shape
    r = resolution
    R = Ry.shape[0]
    CH = chunk
    CT = c_tile
    assert C % CT == 0
    Hp = -(-Htot // 8) * 8
    if Hp != Htot:
        fcat = jnp.pad(fcat, ((0, Hp - Htot), (0, 0), (0, 0)))
        Ry = jnp.pad(Ry, ((0, 0), (0, 0), (0, Hp - Htot)))
    Rp = -(-R // CH) * CH
    if Rp != R:
        Ry = jnp.pad(Ry, ((0, Rp - R), (0, 0), (0, 0)))
        Rx = jnp.pad(Rx, ((0, Rp - R), (0, 0), (0, 0)))

    out = pl.pallas_call(
        partial(_roi_fused_kernel, r=r, CH=CH),
        out_shape=jax.ShapeDtypeStruct((Rp, r, r, C), fcat.dtype),
        grid=(C // CT, Rp // CH),
        in_specs=[
            pl.BlockSpec((Hp, Wmax, CT), lambda c, b: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, r, Hp), lambda c, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, r, Wmax), lambda c, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CH, r, r, CT), lambda c, b: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(fcat, Ry.astype(fcat.dtype), Rx.astype(fcat.dtype))
    return out[:R]
