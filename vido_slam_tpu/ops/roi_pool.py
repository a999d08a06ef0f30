"""ROIPool (hard max pooling) — TPU replacement for the reference's
csrc ROIPool kernels (src/thirdparty/mask_rcnn/maskrcnn_benchmark/csrc/
cuda/ROIPool_cuda.cu:18-75, cpu counterpart).  Legacy pooling used by
non-FPN C4 configs (POOLER_TYPE 'ROIPool'); FPN models use ROIAlign.

Semantics (ROIPool_cuda.cu): roi corners are scaled by spatial_scale and
ROUNDED to integers; roi size = end - start + 1 floored at 1; output bin
(ph, pw) maxes over integer pixels [floor(ph*bh), ceil((ph+1)*bh)) offset
by the roi start, clamped to the image; empty bins output 0.

TPU formulation: bins are contiguous row/column INTERVALS, so the 2D bin
max is separable — a masked max over rows (r, H) then over columns (r, W).
Each ROI builds two {0,1} interval masks and reduces with -inf fill; no
per-pixel gathers and all shapes static.  ROIs are processed with lax.map
to bound the (res, H, W, C) broadcast intermediate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _interval_mask(start, size: int, res: int, scale_len):
    """(res, size) bool: index i belongs to bin p iff
    start + floor(p*bin) <= i < start + ceil((p+1)*bin), clamped.

    The roi extent is an integer (rounded corners), so floor/ceil of
    p*extent/res are computed in exact integer arithmetic — f32 roundoff in
    `p * (extent/res)` would shift bin edges by one pixel."""
    p = jnp.arange(res, dtype=jnp.int32)
    ext = scale_len.astype(jnp.int32)
    s = start.astype(jnp.int32)
    lo = jnp.clip(s + (p * ext) // res, 0, size)                   # (res,)
    hi = jnp.clip(s + -((-(p + 1) * ext) // res), 0, size)         # ceil div
    i = jnp.arange(size, dtype=jnp.int32)
    return (i[None, :] >= lo[:, None]) & (i[None, :] < hi[:, None])


@partial(jax.jit, static_argnames=("spatial_scale", "resolution"))
def roi_pool(
    feat: jnp.ndarray,   # (H, W, C) one image's feature map
    rois: jnp.ndarray,   # (R, 4) xyxy in input-image coords
    spatial_scale: float,
    resolution: int = 7,
) -> jnp.ndarray:
    """(R, resolution, resolution, C) hard-max pooled features."""
    H, W, C = feat.shape
    f = feat.astype(jnp.float32)

    def one(roi):
        x0 = jnp.round(roi[0] * spatial_scale)
        y0 = jnp.round(roi[1] * spatial_scale)
        x1 = jnp.round(roi[2] * spatial_scale)
        y1 = jnp.round(roi[3] * spatial_scale)
        rw = jnp.maximum(x1 - x0 + 1, 1.0)
        rh = jnp.maximum(y1 - y0 + 1, 1.0)
        my = _interval_mask(y0, H, resolution, rh)   # (r, H)
        mx = _interval_mask(x0, W, resolution, rw)   # (r, W)
        # masked max over rows: (r, H, 1, 1) with (H, W, C) -> (r, W, C)
        t = jnp.max(jnp.where(my[:, :, None, None], f[None], -jnp.inf), axis=1)
        # then over columns: (r, r', W) -> (r, r', C)
        out = jnp.max(
            jnp.where(mx[None, :, :, None], t[:, None], -jnp.inf), axis=2
        )
        return jnp.where(jnp.isfinite(out), out, 0.0)  # empty bins -> 0

    return lax.map(one, rois)
