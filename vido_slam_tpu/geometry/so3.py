"""SO(3) Lie-group operations, pure JAX, batched over leading dims.

Replaces the reference's scattered Rodrigues/exp-map code (ImuTypes.cc
`IntegratedRotation`, G2oTypes.cc `ExpSO3/LogSO3`, Tracking.cc Euler parsing)
with one vectorised module. All functions accept arrays with arbitrary leading
batch dimensions: rotation vectors ``(..., 3)``, matrices ``(..., 3, 3)``.

Numerics: small-angle branches are handled with `jnp.where` on the *operands*
(guarding the divisor before the division) so gradients stay finite under
`jax.grad` — the standard "double-where" trick.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _mm(a, b):
    """3x3/4x4 matmul at full f32 precision (TPU MXU defaults to bf16)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``w``: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sin_cos_coeffs(theta2: jnp.ndarray):
    """Return (A, B, C) with A=sin(t)/t, B=(1-cos t)/t^2, C=(1-A)/t^2.

    Taylor-guarded for small angles; inputs are theta^2 to avoid a sqrt of a
    possibly-zero value inside the derivative path.
    """
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2_safe)
    return A, B, C


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector (..., 3) -> rotation matrix (..., 3, 3).

    Rodrigues: R = I + A·ŵ + B·ŵ², mirroring ImuTypes.cc IntegratedRotation
    (reference vido_slam/src/ImuTypes.cc:200-230) but batched.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sin_cos_coeffs(theta2)
    W = hat(w)
    W2 = _mm(W, W)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: rotation matrix (..., 3, 3) -> rotation vector (..., 3).

    Differentiation-safe at theta -> 0 (needed because BA Jacobians are taken
    with jacfwd through pose-graph residuals whose value is ~0 at the
    linearisation point): theta comes from atan2(sin, cos) instead of arccos
    (whose derivative blows up at cos=1), and the theta/sin(theta) factor is
    Taylor-guarded with the double-where trick. Accurate away from theta=pi
    (the SLAM pipeline only sees incremental rotations).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_hat = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    s2 = jnp.sum(w_hat * w_hat, axis=-1)            # = sin(theta)^2
    small = s2 < 1e-12
    s2_safe = jnp.where(small, jnp.ones_like(s2), s2)
    sin_theta = jnp.sqrt(s2_safe)
    theta = jnp.arctan2(sin_theta, cos_theta)
    scale_exact = theta / sin_theta
    scale_taylor = 1.0 + s2 / 6.0  # theta/sin(theta) ~ 1 + theta^2/6
    scale = jnp.where(small, scale_taylor, scale_exact)
    return scale[..., None] * w_hat


def right_jacobian_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian Jr(w) of SO(3): (..., 3) -> (..., 3, 3).

    Jr = I - B·ŵ + C·ŵ² (reference ImuTypes.cc IntegratedRotation rightJ).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sin_cos_coeffs(theta2)
    W = hat(w)
    W2 = _mm(W, W)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - B[..., None, None] * W + C[..., None, None] * W2


def right_jacobian_inv_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian Jr^{-1}(w): (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    half = theta * 0.5
    # coefficient of W^2: 1/t^2 - (1+cos t)/(2 t sin t)
    cot_term = (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta))
    coeff = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, 1.0 / theta2_safe - cot_term)
    W = hat(w)
    W2 = _mm(W, W)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    del half
    return I + 0.5 * W + coeff[..., None, None] * W2


def normalize_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) back onto SO(3) via SVD (ORB-SLAM3 NormalizeRotation)."""
    u, _, vt = jnp.linalg.svd(R)
    Rn = _mm(u, vt)
    # guard against reflections
    det = jnp.linalg.det(Rn)
    u_fixed = u.at[..., :, 2].multiply(jnp.sign(det)[..., None])
    return _mm(u_fixed, vt)
