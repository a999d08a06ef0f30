"""ROIAlign as vectorised bilinear gathers — TPU replacement for
maskrcnn_benchmark's CUDA/CPU ROIAlign (reference
src/thirdparty/mask_rcnn/maskrcnn_benchmark/csrc/{cuda/ROIAlign_cuda.cu,
cpu/ROIAlign_cpu.cpp}).

Detectron-1 convention (no half-pixel shift): roi_start = roi * scale;
bin (ph, pw) samples a `sampling_ratio` x `sampling_ratio` grid at
  y = roi_start_h + ph*bin_h + (iy + 0.5) * bin_h / ratio
and averages. Out-of-image samples clamp like the CUDA bilinear_interpolate
(which clamps -1 < y < 0 to 0 and returns 0 outside by masking).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C); y, x arbitrary same-shape index arrays -> (..., C).

    Matches csrc bilinear_interpolate: returns 0 when y < -1 or y > H-1
    (likewise x); clamps small negatives to 0."""
    H, W, C = feat.shape
    inside = (y >= -1.0) & (y <= H - 1.0) & (x >= -1.0) & (x <= W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    v = (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )
    return v * inside[..., None]


@partial(jax.jit, static_argnames=("resolution", "sampling_ratio"))
def roi_align(
    feat: jnp.ndarray,      # (H, W, C) one level's feature map (single image)
    rois: jnp.ndarray,      # (R, 4) xyxy in image coords
    spatial_scale: float,
    resolution: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Returns (R, resolution, resolution, C)."""
    r = resolution
    s = sampling_ratio
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / r
    bin_h = roi_h / r

    ph = jnp.arange(r, dtype=jnp.float32)
    # accumulate over the s*s sampling taps (keeps the live intermediate at
    # (R, r, r, C) instead of (R, r, s, r, s, C))
    acc = jnp.zeros((rois.shape[0], r, r, feat.shape[-1]), feat.dtype)
    for i in range(s):
        fy = (i + 0.5) / s
        ys = y1[:, None] + (ph[None, :] + fy) * bin_h[:, None]  # (R, r)
        for j in range(s):
            fx = (j + 0.5) / s
            xs = x1[:, None] + (ph[None, :] + fx) * bin_w[:, None]
            Y = jnp.broadcast_to(ys[:, :, None], ys.shape + (r,))
            X = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], r, r))
            acc = acc + _bilinear(feat, Y, X)
    return acc / (s * s)
