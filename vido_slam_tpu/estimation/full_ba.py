"""Full-batch dynamic-SLAM bundle adjustment — Optimizer::FullBatchOptimization
(reference vido_slam/src/Optimizer.cc:1235-2178, STATIC_ONLY=false).

Reference graph over the WHOLE sequence:
  - camera poses + odometry edges + static points      (as window BA);
  - object motion vertices H_{i,k} per frame per object with smoothness
    EdgeSE3 between consecutive motions of the same object
    (sigma2_obj_smo = 0.1, Optimizer.cc:1588-1620);
  - dynamic point vertices PER FRAME (points re-estimated each frame,
    Optimizer.cc:540-628) with camera-point edges (sigma2_3d_dyn = 16) and
    the LandmarkMotionTernaryEdge D_{i-1} - H^{-1} D_i
    (types_dyn_slam3d.cpp:52-60, sigma2_obj = 20);
  - Huber delta 0.01 everywhere, tracklet length >= 3.

TPU design: the dynamic points couple along per-track chains, so the point
block of the Hessian is block-TRIdiagonal — g2o hands this to CSparse. Here
the whole LM step is MATRIX-FREE: residuals are one fixed-shape function of
the parameter pytree, Gauss-Newton products H v = J^T W J v come from one
`jax.jvp` + `jax.vjp` pair (no Hessian materialisation), and a Jacobi-
preconditioned conjugate-gradient solves each damped step. Every CG
iteration is a handful of fused einsums over (F, N) arrays — exactly the
shape of compute TPUs like — and memory stays O(parameters).

Write-back goes to the refined slots (vmCameraPose_RF / vmRigidMotion_RF,
Optimizer.cc:2116-2133), matching the reference's initial-vs-refined output
separation.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vido_slam_tpu.estimation.lm import huber_weight
from vido_slam_tpu.estimation.window_ba import (
    DELTA_HUBER,
    SIGMA2_3D_DYN,
    SIGMA2_3D_STA,
    SIGMA2_CAM,
    SIGMA2_OBJ,
    SIGMA2_OBJ_SMO,
    _huber_rho,
)
from vido_slam_tpu.geometry.se3 import compose, exp_se3, inverse_se3, log_se3

_HI = lax.Precision.HIGHEST
SIGMA2_ALT = 1.0  # sigma2_alti (Optimizer.cc:196)


class FullBAProblem(NamedTuple):
    """Fixed-shape inputs. F frames, Ps static tracks, Nd dynamic slots,
    K object-motion slots per frame."""

    Twc0: jnp.ndarray          # (F, 4, 4)
    frame_valid: jnp.ndarray   # (F,)
    odom: jnp.ndarray          # (F-1, 4, 4)
    odom_valid: jnp.ndarray    # (F-1,)
    # static
    X0: jnp.ndarray            # (Ps, 3)
    sobs: jnp.ndarray          # (F, Ps, 3) camera-frame measurements
    sobs_valid: jnp.ndarray    # (F, Ps)
    spoint_valid: jnp.ndarray  # (Ps,)
    # dynamic points (slot-aligned per frame)
    D0: jnp.ndarray            # (F, Nd, 3) world initialisation
    dobs: jnp.ndarray          # (F, Nd, 3) camera-frame measurements
    dobs_valid: jnp.ndarray    # (F, Nd)
    # ternary: slot j at frame i links to slot j at frame i-1 under motion
    # slot midx[i, j] of frame i
    tern_valid: jnp.ndarray    # (F, Nd) (False at i=0)
    midx: jnp.ndarray          # (F, Nd) int32 in [0, K)
    # object motions
    H0: jnp.ndarray            # (F, K, 4, 4) world-frame motions
    motion_valid: jnp.ndarray  # (F, K)
    smooth_valid: jnp.ndarray  # (F, K) same-object link to frame i-1


class Params(NamedTuple):
    xi: jnp.ndarray    # (F, 6) pose chart deltas
    xs: jnp.ndarray    # (Ps, 3) static point deltas
    xd: jnp.ndarray    # (F, Nd, 3) dynamic point deltas
    xh: jnp.ndarray    # (F, K, 6) motion chart deltas


class FullBAResult(NamedTuple):
    Twc: jnp.ndarray
    H: jnp.ndarray
    X: jnp.ndarray
    D: jnp.ndarray
    cost: jnp.ndarray
    num_iters: jnp.ndarray


def _residuals(p: Params, prob: FullBAProblem, altitude: bool = False):
    """All residual blocks at Twc0*exp(xi) etc. Returns a pytree of
    (residual, weight, robustify) triples; weights already fold validity +
    information. `altitude` adds EdgeSE3Altitude (types_dyn_slam3d.h:44-60):
    a unary prior pulling each motion's y-translation to 0, sigma2_alti = 1
    (Optimizer.cc:196,450-459), no robust kernel — OFF by default exactly
    like the reference's ALTITUDE_CONSTRAINT flag (Optimizer.cc:212)."""
    Twc = compose(prob.Twc0, exp_se3(p.xi))
    Tcw = inverse_se3(Twc)
    X = prob.X0 + p.xs
    D = prob.D0 + p.xd
    H = compose(prob.H0, exp_se3(p.xh))

    # odometry
    rel = compose(inverse_se3(Twc[:-1]), Twc[1:])
    r_od = log_se3(compose(inverse_se3(prob.odom), rel))
    w_od = prob.odom_valid.astype(jnp.float32) / SIGMA2_CAM

    # static points
    pc_s = jnp.einsum("fij,pj->fpi", Tcw[:, :3, :3], X, precision=_HI) \
        + Tcw[:, None, :3, 3]
    r_sp = pc_s - prob.sobs
    w_sp = (prob.sobs_valid & prob.spoint_valid[None, :]).astype(jnp.float32) \
        / SIGMA2_3D_STA

    # dynamic points: camera-point edges
    pc_d = jnp.einsum("fij,fnj->fni", Tcw[:, :3, :3], D, precision=_HI) \
        + Tcw[:, None, :3, 3]
    r_dp = pc_d - prob.dobs
    w_dp = prob.dobs_valid.astype(jnp.float32) / SIGMA2_3D_DYN

    # ternary motion edges: D_{i-1,j} - H_{i,k}^{-1} D_{i,j}
    Hinv = inverse_se3(H)  # (F, K, 4, 4)
    K = H.shape[1]
    Hi = jnp.take_along_axis(
        Hinv, jnp.clip(prob.midx, 0, K - 1)[:, :, None, None], axis=1
    )  # (F, Nd, 4, 4)
    mapped = jnp.einsum("fnij,fnj->fni", Hi[:, :, :3, :3], D, precision=_HI) \
        + Hi[:, :, :3, 3]
    r_t = jnp.concatenate([D[:1] * 0.0, D[:-1]]) - mapped
    w_t = prob.tern_valid.astype(jnp.float32) / SIGMA2_OBJ

    # motion smoothness: log(H_{i-1,k}^-1 H_{i,k})
    r_sm = log_se3(compose(inverse_se3(H[:-1]), H[1:]))  # (F-1, K, 6)
    w_sm = prob.smooth_valid[1:].astype(jnp.float32) / SIGMA2_OBJ_SMO

    blocks = [(r_od, w_od, True), (r_sp, w_sp, True), (r_dp, w_dp, True),
              (r_t, w_t, True), (r_sm, w_sm, True)]
    if altitude:
        r_alt = H[:, :, 1, 3:4]                     # (F, K, 1) y translation
        w_alt = prob.motion_valid.astype(jnp.float32) / SIGMA2_ALT
        blocks.append((r_alt, w_alt, False))
    return tuple(blocks)


def _robust_weights(blocks):
    """Huber IRLS factors per block (evaluated at current estimate)."""
    out = []
    for r, w, robust in blocks:
        chi2 = jnp.sum(r * r, axis=-1) * w
        out.append((huber_weight(chi2, DELTA_HUBER) if robust else 1.0) * w)
    return tuple(out)


def _cost(blocks):
    c = 0.0
    for r, w, robust in blocks:
        chi2 = jnp.sum(r * r, axis=-1) * w
        # rho with the information already inside chi2
        rho = _huber_rho(chi2) if robust else chi2
        c = c + jnp.sum(jnp.where(w > 0, rho, 0.0))
    return c


def _flatten_res(blocks):
    return tuple(r for r, _, _ in blocks)


def _dot(a: Params, b: Params):
    return sum(jnp.vdot(x, y) for x, y in zip(a, b))


def _axpy(alpha, x: Params, y: Params) -> Params:
    return jax.tree.map(lambda a, b: b + alpha * a, x, y)


def _scale(alpha, x: Params) -> Params:
    return jax.tree.map(lambda a: alpha * a, x)


@partial(jax.jit, static_argnames=("max_iters", "cg_iters", "altitude"))
def solve_full_ba(
    prob: FullBAProblem,
    *,
    max_iters: int = 15,
    cg_iters: int = 60,
    altitude: bool = False,
) -> FullBAResult:
    F, K = prob.H0.shape[0], prob.H0.shape[1]
    Ps = prob.X0.shape[0]
    Nd = prob.D0.shape[1]

    zero = Params(
        xi=jnp.zeros((F, 6)),
        xs=jnp.zeros((Ps, 3)),
        xd=jnp.zeros((F, Nd, 3)),
        xh=jnp.zeros((F, K, 6)),
    )

    # gauge: first valid frame's pose fixed (plus pads). Pinning is EXACT
    # (projection onto the free subspace, g2o setFixed semantics): a large
    # soft diagonal (the earlier design) gives the CG operator a ~1e10
    # eigenvalue cluster whose f32 rounding leaks ~1e3x noise into the
    # Krylov basis — the same conditioning failure measured in the window
    # BA's dense Cholesky. `free` is 1.0 on optimizable coordinates.
    first_real = jnp.argmax(prob.frame_valid)
    gauge_pose = (~prob.frame_valid) | (jnp.arange(F) == first_real)
    free = Params(
        xi=jnp.broadcast_to((~gauge_pose)[:, None].astype(jnp.float32),
                            (F, 6)),
        xs=jnp.broadcast_to(prob.spoint_valid[:, None].astype(jnp.float32),
                            (Ps, 3)),
        xd=jnp.broadcast_to(
            (prob.dobs_valid | prob.tern_valid)[:, :, None].astype(jnp.float32),
            (F, Nd, 3)),
        xh=jnp.broadcast_to(prob.motion_valid[:, :, None].astype(jnp.float32),
                            (F, K, 6)),
    )

    def project_free(v: Params) -> Params:
        return jax.tree.map(lambda a, m: a * m, v, free)

    def res_fn(p: Params):
        return _flatten_res(_residuals(p, prob, altitude))

    def step(carry):
        it, p, lam, nu, cost, done = carry
        blocks = _residuals(p, prob, altitude)
        w_rob = _robust_weights(blocks)
        r_list = _flatten_res(blocks)

        # gradient g = J^T W r via vjp
        _, vjp = jax.vjp(res_fn, p)
        wr = tuple(r * w[..., None] for r, w in zip(r_list, w_rob))
        (g,) = vjp(wr)

        # H restricted to the free subspace: P H P v + (I - P) v keeps the
        # operator SPD and the pinned coordinates exactly at zero
        def Hv(v: Params) -> Params:
            vf = project_free(v)
            _, Jv = jax.jvp(res_fn, (p,), (vf,))
            wJv = tuple(jv * w[..., None] for jv, w in zip(Jv, w_rob))
            (JtWJv,) = vjp(wJv)
            return jax.tree.map(
                lambda h, vv, m: m * (h + lam * vv) + (1.0 - m) * vv,
                JtWJv, v, free,
            )

        # PCG solve Hv(d) = -g on the free subspace
        b = project_free(_scale(-1.0, g))

        def cg_body(i, st):
            d, r, z, rz = st
            Hd = Hv(z)
            zHz = _dot(z, Hd)
            alpha = rz / jnp.maximum(zHz, 1e-20)
            d = _axpy(alpha, z, d)
            r = _axpy(-alpha, Hd, r)
            rz_new = _dot(r, r)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            z = _axpy(beta, z, r)
            return (d, r, z, rz_new)

        r0 = b
        st0 = (zero, r0, r0, _dot(r0, r0))
        d, _, _, _ = lax.fori_loop(0, cg_iters, cg_body, st0)

        p_new = jax.tree.map(lambda a, b_: a + b_, p, d)
        cost_new = _cost(_residuals(p_new, prob, altitude))
        accept = cost_new < cost
        lam_new = jnp.where(accept, lam * 0.5, lam * nu)
        nu_new = jnp.where(accept, 2.0, nu * 2.0)
        p_next = jax.tree.map(
            lambda a, b_: jnp.where(accept, b_, a), p, p_new
        )
        cost_next = jnp.where(accept, cost_new, cost)
        rel = (cost - cost_next) / jnp.maximum(cost, 1e-20)
        done_new = accept & (rel < 1e-6)
        return (it + 1, p_next, lam_new, nu_new, cost_next, done_new)

    def cond(carry):
        it, _, _, _, _, done = carry
        return (it < max_iters) & ~done

    cost0 = _cost(_residuals(zero, prob, altitude))
    init = (jnp.int32(0), zero, jnp.float32(1e-4), jnp.float32(2.0), cost0,
            jnp.bool_(False))
    it, p, lam, nu, cost, done = lax.while_loop(cond, step, init)

    return FullBAResult(
        Twc=compose(prob.Twc0, exp_se3(p.xi)),
        H=compose(prob.H0, exp_se3(p.xh)),
        X=prob.X0 + p.xs,
        D=prob.D0 + p.xd,
        cost=cost,
        num_iters=it,
    )
