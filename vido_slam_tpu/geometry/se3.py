"""SE(3) Lie-group operations, pure JAX, batched over leading dims.

Poses are 4x4 homogeneous matrices (..., 4, 4), matching the reference's
cv::Mat Tcw convention (world->camera), but all math here is convention-free.
Tangent vectors are (..., 6) ordered [rho(3), phi(3)] = [translation, rotation]
— the same ordering g2o::SE3Quat uses internally for exp/log
(reference vido_slam/3rdparty/g2o/g2o/types/se3quat.h).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _mm(a, b):
    """3x3/4x4 matmul at full f32 precision (TPU MXU defaults to bf16)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)

from vido_slam_tpu.geometry.so3 import (
    _sin_cos_coeffs,
    exp_so3,
    hat,
    log_so3,
    right_jacobian_inv_so3,
)


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from R (..., 3, 3) and t (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def inverse_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (reference Converter.h toInvMatrix)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=lax.Precision.HIGHEST))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return _mm(A, B)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim >= 2 and pts.shape[-2] != 3:
        # points stacked on an axis: (..., N, 3)
        return jnp.einsum("...ij,...nj->...ni", R, pts, precision=lax.Precision.HIGHEST) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, pts, precision=lax.Precision.HIGHEST) + t


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: (..., 6) [rho, phi] -> (..., 4, 4).

    t = V(phi) @ rho with V = I + B·ŵ + C·ŵ² (left Jacobian of SO(3)).
    """
    rho = xi[..., :3]
    phi = xi[..., 3:]
    R = exp_so3(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    _, B, C = _sin_cos_coeffs(theta2)
    W = hat(phi)
    W2 = _mm(W, W)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho, precision=lax.Precision.HIGHEST)
    return make_se3(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: (..., 4, 4) -> (..., 6) [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = log_so3(R)
    # V^{-1} = Jl^{-1}(phi) = Jr^{-1}(-phi)
    Vinv = right_jacobian_inv_so3(-phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t, precision=lax.Precision.HIGHEST)
    return jnp.concatenate([rho, phi], axis=-1)


def adjoint_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of SE(3): (..., 4, 4) -> (..., 6, 6) acting on [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = _mm(hat(t), R)
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
