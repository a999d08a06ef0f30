"""Deformable convolution (DCN v1/v2) — TPU replacement for the reference's
CUDA kernels (src/thirdparty/mask_rcnn/maskrcnn_benchmark/csrc/cuda/
{deform_conv_kernel_cuda.cu, deform_conv_cuda.cu, deform_pool_*.cu},
exposed as layers.DCNv{1,2} and used by the ResNet `DeformableConvolutions`
stage option, modeling/backbone/resnet.py STAGE_WITH_DCN configs).

The CUDA implementation materialises an im2col buffer with one
bilinear-interpolated read per (output position x kernel tap x channel).
TPU formulation: one whole-image bilinear sample per kernel tap (K = kh*kw
fused gathers) followed by a (N*Ho*Wo, Cin) @ (Cin, Cout) matmul per tap —
the samples vectorise on the VPU, the contraction rides the MXU, and no
im2col buffer ever exists. Modulated (v2) masks fold into the sampled
values before the matmul.

Offset layout matches torch: (N, Ho, Wo, 2*K) channels ordered
(dy_0, dx_0, dy_1, dx_1, ...) over kernel taps in row-major (ki, kj); with
zero offsets the op reduces exactly to a standard convolution (tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from vido_slam_tpu.ops.warp import grid_sample_nhwc


@partial(jax.jit, static_argnames=("stride", "padding", "dilation", "groups"))
def deform_conv2d(
    x: jnp.ndarray,        # (N, H, W, Cin)
    offsets: jnp.ndarray,  # (N, Ho, Wo, 2*kh*kw) (dy, dx) per tap
    w: jnp.ndarray,        # (kh, kw, Cin/groups, Cout)
    b: jnp.ndarray = None,
    *,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask: jnp.ndarray = None,  # (N, Ho, Wo, kh*kw) v2 modulation, or None
    groups: int = 1,           # ResNeXt DCN stages: groups=32
) -> jnp.ndarray:
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    assert Cin % groups == 0 and Cout % groups == 0
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    oy = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    base_y = jnp.broadcast_to(oy[:, None], (Ho, Wo))
    base_x = jnp.broadcast_to(ox[None, :], (Ho, Wo))

    out = jnp.zeros((N, Ho, Wo, Cout), x.dtype)
    for ki in range(kh):
        for kj in range(kw):
            k = ki * kw + kj
            dy = offsets[..., 2 * k]
            dx = offsets[..., 2 * k + 1]
            sy = base_y[None] + ki * dilation + dy
            sx = base_x[None] + kj * dilation + dx
            v = grid_sample_nhwc(x, sx, sy)          # (N, Ho, Wo, Cin)
            if mask is not None:
                v = v * mask[..., k : k + 1]
            if groups == 1:
                out = out + jnp.einsum(
                    "nhwc,cd->nhwd", v, w[ki, kj],
                    precision=lax.Precision.HIGHEST,
                )
            else:
                vg = v.reshape(N, Ho, Wo, groups, Cin // groups)
                wg = w[ki, kj].reshape(Cin // groups, groups, Cout // groups)
                og = jnp.einsum("nhwgc,cgd->nhwgd", vg, wg,
                                precision=lax.Precision.HIGHEST)
                out = out + og.reshape(N, Ho, Wo, Cout)
    if b is not None:
        out = out + b
    return out


def init_dcn_offsets(shape) -> jnp.ndarray:
    """Zero offsets (the reference initialises the offset conv to zero so
    training starts from a plain convolution, dcn heads' conv_offset init)."""
    return jnp.zeros(shape, jnp.float32)
