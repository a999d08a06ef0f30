"""Bilinear warping / grid sampling in NHWC, pure JAX.

Replaces torch grid_sample (align_corners=False, zeros padding) as used by
LiteFlowNet's backwarp (reference src/thirdparty/flow_net/src/layers.py:26-36)
and MonoDepth2. Gathers vectorise perfectly on TPU; zero padding is realised
by per-corner in-bounds masks instead of clamping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_nhwc(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img (N, H, W, C) at float pixel coords x, y (N, H', W').

    Bilinear, zeros outside the image (torch grid_sample padding_mode=zeros).

    ONE (2, 2, C)-slice gather per call on a zero-padded image instead of
    four per-corner point gathers: TPU gather cost is dominated by the
    per-op index-list overhead, and a padded-patch gather fetches all four
    taps for the price of one op (measured -25% per warp at LiteFlowNet's
    level-2 shapes, bit-exact). Out-of-range corners are zeroed by the
    per-corner in-bounds masks below; in-bounds gather starts are guaranteed
    solely by mode=GatherScatterMode.CLIP, which clamps each start index to
    [0, padded_dim - slice_size] = [0, H] / [0, W] (values a clamped start
    exposes are discarded by those same masks).
    """
    N, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Hp, Wp = x.shape[1], x.shape[2]
    P = Hp * Wp
    starts = jnp.stack([
        (y0i + 1).reshape(N, P),
        (x0i + 1).reshape(N, P),
    ], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def gather_one(one_pad, one_starts):
        return jax.lax.gather(one_pad, one_starts, dn, slice_sizes=(2, 2, C),
                              mode=jax.lax.GatherScatterMode.CLIP)

    patch = jax.vmap(gather_one)(pad, starts).reshape(N, Hp, Wp, 2, 2, C)

    def inb(xi, yi):
        return ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))[..., None]

    v00 = patch[..., 0, 0, :] * inb(x0i, y0i)
    v01 = patch[..., 0, 1, :] * inb(x0i + 1, y0i)
    v10 = patch[..., 1, 0, :] * inb(x0i, y0i + 1)
    v11 = patch[..., 1, 1, :] * inb(x0i + 1, y0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def backwarp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp x (N, H, W, C) backward by flow (N, H, W, 2) [fx, fy].

    Bit-matches the reference backwarp (layers.py:26-36): the normalised grid
    uses pixel centers (align_corners=False) and the flow is divided by
    (size-1)/2 before being added in normalised units — equivalent to a
    pixel-space displacement of f * size/(size-1).
    """
    N, H, W, _ = flow.shape
    ii = jax.lax.broadcasted_iota(jnp.float32, (N, H, W), 2)
    jj = jax.lax.broadcasted_iota(jnp.float32, (N, H, W), 1)
    sx = ii + flow[..., 0].astype(jnp.float32) * (W / (W - 1.0))
    sy = jj + flow[..., 1].astype(jnp.float32) * (H / (H - 1.0))
    # sample coords stay f32; the result follows the input dtype so a bf16
    # net stays bf16 through its warps
    return grid_sample_nhwc(x, sx, sy).astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """NHWC bilinear resize matching torch interpolate(align_corners=False)."""
    return jax.image.resize(
        x, (x.shape[0], height, width, x.shape[-1]), method="bilinear"
    )
