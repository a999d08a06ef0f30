"""Sliding-window bundle adjustment — the TPU replacement for
Optimizer::PartialBatchOptimization (reference vido_slam/src/Optimizer.cc:43-1228).

Reference graph (STATIC_ONLY=true, the per-frame window BA):
  - pose vertices Twc_i for the W window frames (g2o VertexSE3, estimates are
    camera->world, Optimizer.cc:223-229 with vmCameraPose = inv(mTcw));
  - odometry EdgeSE3 between consecutive poses, measurement = the camera
    motion measured at tracking time (vmRigidMotion[i-1][0] =
    inv(mVelocity)); information I/sigma2_cam, sigma2_cam = 1e-4; Huber 0.01
    (Optimizer.cc:190, 214, 248-260);
  - static point vertices X_k (world) for tracklets of length >= 3
    (FeaLengthThresSta=3, Optimizer.cc:211,295) with EdgeSE3PointXYZ
    measurement = camera-frame backprojection Xc; information I/16
    (sigma2_3d_sta), Huber 0.01 (Optimizer.cc:291-354).

TPU design: fixed shapes (W poses, P point tracks, (W, P) observation mask);
Levenberg-Marquardt with re-linearisation each iteration; the point blocks
are eliminated with a batched sparse Schur complement (3x3 block-diagonal
H_pp inverted in closed form, reduced camera system solved dense — a 6W x 6W
Cholesky is tiny and MXU-friendly, replacing g2o's CSparse). Per-edge
Jacobians come from vmapped `jax.jacfwd` of the local 6/3-dim perturbations,
so the analytic structure is exact by construction. Gauge: the first window
pose is frozen by exact pinning of its rows/cols in the reduced system
(g2o setFixed semantics; the reference relies on an EdgeSE3Prior for the
first window only, Optimizer.cc:230-238).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vido_slam_tpu.estimation.lm import huber_weight
from vido_slam_tpu.geometry.se3 import (
    compose,
    exp_se3,
    inverse_se3,
    log_se3,
)

_HI = lax.Precision.HIGHEST

# Reference constants (Optimizer.cc:190-196, 214)
SIGMA2_CAM = 1e-4
SIGMA2_3D_STA = 16.0
SIGMA2_OBJ_SMO = 0.1
SIGMA2_OBJ = 20.0
SIGMA2_3D_DYN = 16.0
DELTA_HUBER = 0.01


class WindowBAResult(NamedTuple):
    Twc: jnp.ndarray      # (W, 4, 4) optimized poses (camera->world)
    points: jnp.ndarray   # (P, 3) optimized world points
    cost: jnp.ndarray
    num_iters: jnp.ndarray


def _point_edge_residual(delta_pose, delta_pt, Twc, X, meas):
    """r = (Twc exp(dp))^-1 (X + dx) - meas, 3-dim."""
    T = compose(Twc, exp_se3(delta_pose))
    Tcw = inverse_se3(T)
    return Tcw[:3, :3] @ (X + delta_pt) + Tcw[:3, 3] - meas


def _odom_edge_residual(delta_prev, delta_cur, T_prev, T_cur, M):
    """r = log(M^-1 (T_prev exp(dp))^-1 (T_cur exp(dc))), 6-dim."""
    A = compose(T_prev, exp_se3(delta_prev))
    B = compose(T_cur, exp_se3(delta_cur))
    return log_se3(compose(inverse_se3(M), compose(inverse_se3(A), B)))


_point_jac = jax.jacfwd(_point_edge_residual, argnums=(0, 1))
_odom_jac = jax.jacfwd(_odom_edge_residual, argnums=(0, 1))

_Z6 = jnp.zeros(6)
_Z3 = jnp.zeros(3)


def _linearize(Twc, X, obs, obs_valid, odom, odom_valid):
    """Residuals, robust weights and per-edge Jacobians at current estimate."""
    # --- point observation edges, vmapped over (W, P) ---
    r_pt, Jc_pt, Jp_pt = _vmap_pt(Twc, X, obs)

    w_info_pt = 1.0 / SIGMA2_3D_STA
    chi2_pt = jnp.sum(r_pt * r_pt, axis=-1) * w_info_pt
    w_pt = huber_weight(chi2_pt, DELTA_HUBER) * w_info_pt
    w_pt = jnp.where(obs_valid, w_pt, 0.0)

    # --- odometry edges, vmapped over (W-1,) ---
    def od_edge(Tp, Tc, M):
        r = _odom_edge_residual(_Z6, _Z6, Tp, Tc, M)
        Ja, Jb = _odom_jac(_Z6, _Z6, Tp, Tc, M)
        return r, Ja, Jb

    r_od, Ja_od, Jb_od = jax.vmap(od_edge)(Twc[:-1], Twc[1:], odom)
    w_info_od = 1.0 / SIGMA2_CAM
    chi2_od = jnp.sum(r_od * r_od, axis=-1) * w_info_od
    w_od = huber_weight(chi2_od, DELTA_HUBER) * w_info_od
    w_od = jnp.where(odom_valid, w_od, 0.0)

    cost = jnp.sum(_huber_rho(chi2_pt) * obs_valid) + jnp.sum(
        _huber_rho(chi2_od) * odom_valid
    )
    return (r_pt, Jc_pt, Jp_pt, w_pt), (r_od, Ja_od, Jb_od, w_od), cost


def _vmap_pt(Twc, X, obs):
    """Residuals + ANALYTIC Jacobians of the point edges.

    r(dp, dx) = (Twc exp(dp))^-1 (X + dx) - meas = exp(-dp)(Xc + Rcw dx) - m
    with Xc = Tcw X. First order (xi = [rho, phi], right perturbation):
      dr/drho = -I,  dr/dphi = hat(Xc),  dr/dx = Rcw.
    Closed form replaces a 9-pass jacfwd through exp_se3/compose per edge —
    the window has W*P = 20k edges re-linearised every LM iteration, and the
    while-loop body time is a per-frame floor (profiled: the BA loop was the
    single largest tracking-step item)."""
    from vido_slam_tpu.geometry.so3 import hat

    Tcw = inverse_se3(Twc)                    # (W, 4, 4)
    Rcw = Tcw[:, :3, :3]
    Xc = jnp.einsum("wij,pj->wpi", Rcw, X, precision=_HI) + Tcw[:, None, :3, 3]
    r = Xc - obs                              # (W, P, 3)
    Wn, Pn = r.shape[0], r.shape[1]
    negI = jnp.broadcast_to(-jnp.eye(3, dtype=r.dtype), (Wn, Pn, 3, 3))
    Jc = jnp.concatenate([negI, hat(Xc)], axis=-1)        # (W, P, 3, 6)
    Jp = jnp.broadcast_to(Rcw[:, None], (Wn, Pn, 3, 3))   # (W, P, 3, 3)
    return r, Jc, Jp


def _huber_rho(chi2):
    d2 = DELTA_HUBER * DELTA_HUBER
    return jnp.where(
        chi2 <= d2, chi2, 2.0 * DELTA_HUBER * jnp.sqrt(jnp.maximum(chi2, 1e-20)) - d2
    )


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate/det). `jnp.linalg.inv` on a
    (P, 3, 3) batch lowers to a LAPACK-style custom call — profiled at ~8 ms
    per frame on TPU; the adjugate is a handful of fused VPU ops."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2)
    return adj * inv_det[..., None, None]


def _cost_only(Twc, X, obs, obs_valid, odom, odom_valid):
    Tcw = inverse_se3(Twc)
    pc = jnp.einsum("wij,pj->wpi", Tcw[:, :3, :3], X, precision=_HI) + Tcw[:, None, :3, 3]
    r_pt = pc - obs
    chi2_pt = jnp.sum(r_pt * r_pt, axis=-1) / SIGMA2_3D_STA
    rel = compose(inverse_se3(Twc[:-1]), Twc[1:])
    r_od = log_se3(compose(inverse_se3(odom), rel))
    chi2_od = jnp.sum(r_od * r_od, axis=-1) / SIGMA2_CAM
    return jnp.sum(_huber_rho(chi2_pt) * obs_valid) + jnp.sum(
        _huber_rho(chi2_od) * odom_valid
    )


@partial(jax.jit, static_argnames=("max_iters", "gain_tol"))
def solve_window_ba(
    Twc0: jnp.ndarray,       # (W, 4, 4) initial poses (camera->world)
    odom: jnp.ndarray,       # (W-1, 4, 4) measured relative motions
    odom_valid: jnp.ndarray,  # (W-1,) bool
    X0: jnp.ndarray,         # (P, 3) initial world points
    obs: jnp.ndarray,        # (W, P, 3) camera-frame measurements
    obs_valid: jnp.ndarray,  # (W, P) bool
    point_valid: jnp.ndarray,  # (P,) bool — track participates
    frame_valid: jnp.ndarray = None,  # (W,) bool — False for front padding
    *,
    max_iters: int = 20,
    gain_tol: float = 1e-3,
) -> WindowBAResult:
    W = Twc0.shape[0]
    P = X0.shape[0]
    D = 6 * W
    obs_valid = obs_valid & point_valid[None, :]
    if frame_valid is None:
        frame_valid = jnp.ones(W, bool)
    # gauge: freeze every pad pose plus the first real pose. Pinning is
    # EXACT (g2o setFixed semantics): the gauge rows/cols of the reduced
    # camera system are zeroed and identity-pinned so dc=0 there. A large
    # soft diagonal prior (the earlier design) leaves the 6Wx6W Cholesky
    # with a ~1e10 condition-number floor, which costs ~3 significant
    # digits of the step in f32 — measurable as fused-vs-host per-step
    # rotation disagreement on CPU backends.
    first_real = jnp.argmax(frame_valid)
    gauge_frames = ~frame_valid | (jnp.arange(W) == first_real)
    free_d = jnp.repeat((~gauge_frames).astype(jnp.float32), 6)  # (D,)

    def linearize(Twc, X):
        # Structure-exploiting normal equations (see module docstring):
        # Jc = [-I | hat(Xc)], Jp = Rcw  =>  Hpp = (sum_w w) I is DIAGONAL,
        # and with E = Jc^T Rcw (6,3 per edge) both the Schur term
        # sum_p B Hpp^-1 B^T and the pose diagonal sum_p w Jc^T Jc reduce to
        # (W*6, P*3)-shaped MXU matmuls (E E^T == Jc^T Jc since R R^T = I).
        # Everything here is lambda-INDEPENDENT and cached across while-loop
        # iterations; `assemble` below applies the damping (lm.py pattern:
        # one linearisation per iteration — it doubles as the trial-point
        # cost evaluation, so the separate _cost_only pass is gone).
        Tcw = inverse_se3(Twc)
        Rcw = Tcw[:, :3, :3]                                    # (W, 3, 3)
        Xc = jnp.einsum("wij,pj->wpi", Rcw, X, precision=_HI) + Tcw[:, None, :3, 3]
        r_pt = Xc - obs                                          # (W, P, 3)
        w_info_pt = 1.0 / SIGMA2_3D_STA
        chi2_pt = jnp.sum(r_pt * r_pt, axis=-1) * w_info_pt
        w_pt = huber_weight(chi2_pt, DELTA_HUBER) * w_info_pt
        w_pt = jnp.where(obs_valid, w_pt, 0.0)                   # (W, P)

        # E[w,p] = [[-Rcw],[-hat(Xc) Rcw]] : rows 0..2 = -Rcw, rows 3..5 =
        # -(Xc x Rcw columns) = cross(Rcw_cols, Xc) per column
        top = jnp.broadcast_to(-Rcw[:, None], (W, P, 3, 3))
        cols = Rcw.swapaxes(-1, -2)                              # row j = col j of Rcw
        bot = jnp.cross(
            cols[:, None, :, :],                                 # (W,1,3cols,3)
            Xc[:, :, None, :],                                   # (W,P,1,3)
            axis=-1,
        ).swapaxes(-1, -2)                                       # (W,P,3comp,3cols)
        # bot[w,p,i,j] = (Rcw_col_j x Xc)_i = -(hat(Xc) Rcw)[i,j]
        E = jnp.concatenate([top, bot], axis=2)                  # (W, P, 6, 3)

        Ef = E.transpose(0, 2, 1, 3)                             # (W, 6, P, 3)
        sq_w = jnp.sqrt(w_pt)
        G1 = (Ef * sq_w[:, None, :, None]).reshape(W, 6, P * 3)
        # Gw = w-weighted E rows; per-lambda row scalings derive from it
        Gw = (Ef * w_pt[:, None, :, None]).reshape(D, P * 3)
        # pose-diagonal blocks sum_p w Jc^T Jc = sum_p w E E^T
        JtJ_c = jnp.einsum("wik,wjk->wij", G1, G1, precision=_HI)  # (W, 6, 6)

        # --- odometry edges ---
        def od_edge(Tp, Tc, M):
            r = _odom_edge_residual(_Z6, _Z6, Tp, Tc, M)
            Ja, Jb = _odom_jac(_Z6, _Z6, Tp, Tc, M)
            return r, Ja, Jb

        r_od, Ja_od, Jb_od = jax.vmap(od_edge)(Twc[:-1], Twc[1:], odom)
        w_info_od = 1.0 / SIGMA2_CAM
        chi2_od = jnp.sum(r_od * r_od, axis=-1) * w_info_od
        w_od = huber_weight(chi2_od, DELTA_HUBER) * w_info_od
        w_od = jnp.where(odom_valid, w_od, 0.0)

        cost = jnp.sum(_huber_rho(chi2_pt) * obs_valid) + jnp.sum(
            _huber_rho(chi2_od) * odom_valid
        )

        Hcc = jnp.zeros((W, W, 6, 6))
        ii = jnp.arange(W)
        Hcc = Hcc.at[ii, ii].add(JtJ_c)
        Haa = jnp.einsum("eij,e,eik->ejk", Ja_od, w_od, Ja_od, precision=_HI)
        Hab = jnp.einsum("eij,e,eik->ejk", Ja_od, w_od, Jb_od, precision=_HI)
        Hbb = jnp.einsum("eij,e,eik->ejk", Jb_od, w_od, Jb_od, precision=_HI)
        e0 = jnp.arange(W - 1)
        Hcc = Hcc.at[e0, e0].add(Haa)
        Hcc = Hcc.at[e0, e0 + 1].add(Hab)
        Hcc = Hcc.at[e0 + 1, e0].add(jnp.swapaxes(Hab, -1, -2))
        Hcc = Hcc.at[e0 + 1, e0 + 1].add(Hbb)
        Hcc_base = Hcc.transpose(0, 2, 1, 3).reshape(D, D)       # no damping

        # ---- gradients ----
        wr = w_pt[..., None] * r_pt                              # (W, P, 3)
        g_pt_t = -jnp.sum(wr, axis=1)                            # translation rows
        g_pt_r = -jnp.sum(jnp.cross(Xc, wr), axis=1)             # rotation rows
        g_c = jnp.concatenate([g_pt_t, g_pt_r], axis=1)          # (W, 6)
        g_c = g_c.at[:-1].add(
            jnp.einsum("eij,e,ei->ej", Ja_od, w_od, r_od, precision=_HI)
        )
        g_c = g_c.at[1:].add(
            jnp.einsum("eij,e,ei->ej", Jb_od, w_od, r_od, precision=_HI)
        )
        g_c = g_c.reshape(D)
        g_p = jnp.einsum("wij,wpi->pj", Rcw, wr, precision=_HI)  # (P, 3)
        w_sum = jnp.sum(w_pt, axis=0)                            # (P,)
        cache = (Gw, Hcc_base, g_c, g_p, w_sum)
        return cache, cost

    def assemble(cache, lam):
        """Apply the damping to the cached linearisation: Schur complement
        and reduced system for this lambda (cheap: one (D, 3P) matmul)."""
        Gw, Hcc_base, g_c, g_p, w_sum = cache
        s_p = jnp.maximum(w_sum + lam, 1e-20)                    # Hpp diag
        inv_s3 = (1.0 / s_p)[None].repeat(3, 1).reshape(1, -1)   # (1, 3P)
        inv_sq3 = (1.0 / jnp.sqrt(s_p))[None].repeat(3, 1).reshape(1, -1)
        Gv = Gw * inv_sq3
        Schur = Gv @ Gv.T                                        # (D, D)
        S = Hcc_base + lam * jnp.eye(D) - Schur
        Gs = Gw * inv_s3
        rhs = g_c - Gs @ g_p.reshape(P * 3)
        # exact gauge pinning: eliminate the fixed pose variables
        S = S * (free_d[:, None] * free_d[None, :]) + jnp.diag(1.0 - free_d)
        rhs = rhs * free_d
        return S, rhs, s_p, Gs

    def body(state):
        it, Twc, X, lam, nu, cost, done, cache = state
        S, rhs, s_p, Gs = assemble(cache, lam)
        L = jnp.linalg.cholesky(S)
        y = jax.scipy.linalg.solve_triangular(L, -rhs, lower=True)
        dc = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        bad = jnp.any(jnp.isnan(dc))
        dc = jnp.where(bad, jnp.zeros_like(dc), dc)
        # dp = Hpp^-1 (-g_p - B^T dc); B^T dc = sqrt(s) * Gs^T dc
        g_p = cache[3]
        Bt_dc = (Gs.T @ dc).reshape(P, 3) * jnp.sqrt(s_p)[:, None]
        dp = -(g_p + Bt_dc) / s_p[:, None]
        dp = jnp.where(point_valid[:, None], dp, 0.0)
        Twc_new = compose(Twc, exp_se3(dc.reshape(W, 6)))
        X_new = X + dp
        cache_new, cost_new = linearize(Twc_new, X_new)
        accept = (cost_new < cost) & ~bad
        lam_new = jnp.where(accept, lam * (1.0 / 3.0), lam * nu)
        nu_new = jnp.where(accept, 2.0, nu * 2.0)
        Twc_next = jnp.where(accept, Twc_new, Twc)
        X_next = jnp.where(accept, X_new, X)
        cost_next = jnp.where(accept, cost_new, cost)
        cache_next = jax.tree.map(
            lambda a, b: jnp.where(accept, b, a), cache, cache_new)
        rel_impr = (cost - cost_next) / jnp.maximum(cost, 1e-20)
        # SparseOptimizerTerminateAction gain threshold 1e-3
        # (Optimizer.cc:182-184): stop when the relative chi2 gain drops
        done_new = accept & (rel_impr < gain_tol)
        return (it + 1, Twc_next, X_next, lam_new, nu_new, cost_next,
                done_new, cache_next)

    def cond(state):
        it = state[0]
        done = state[6]
        return (it < max_iters) & ~done

    cache0, cost0 = linearize(Twc0, X0)
    init = (jnp.int32(0), Twc0, X0, jnp.float32(1e-4), jnp.float32(2.0),
            cost0, jnp.bool_(False), cache0)
    it, Twc, X, lam, nu, cost, done, _ = lax.while_loop(cond, body, init)
    return WindowBAResult(Twc=Twc, points=X, cost=cost, num_iters=it)


# ---------------------------------------------------------------------------
# Packed single-buffer entry point.
#
# On a tunneled TPU transport every host->device transfer is a serialized
# RPC (~14 ms each, measured); the window problem has 8 tensors, so feeding
# solve_window_ba leaf-by-leaf costs ~100 ms of pure transfer latency per
# frame. Packing the whole problem into ONE contiguous float32 vector makes
# it one RPC; the unpack (slice + reshape) is free inside the jit.
# ---------------------------------------------------------------------------

def _packed_layout(W: int, P: int):
    sizes = [W * 16, (W - 1) * 16, W - 1, P * 3, W * P * 3, W * P, P, W]
    offs = np.cumsum([0] + sizes)
    return offs, int(offs[-1])


def pack_window_problem(prob, frame_valid: np.ndarray) -> np.ndarray:
    """WindowProblem (+ frame_valid) -> one (K,) float32 host buffer."""
    W = prob.Twc0.shape[0]
    P = prob.X0.shape[0]
    offs, total = _packed_layout(W, P)
    buf = np.empty(total, np.float32)
    parts = [prob.Twc0, prob.odom, prob.odom_valid, prob.X0, prob.obs,
             prob.obs_valid, prob.point_valid, frame_valid]
    for part, o0, o1 in zip(parts, offs[:-1], offs[1:]):
        buf[o0:o1] = np.asarray(part, np.float32).reshape(-1)
    return buf


@partial(jax.jit, static_argnames=("W", "P", "max_iters"))
def solve_window_ba_packed(buf: jnp.ndarray, W: int, P: int,
                           max_iters: int = 20) -> WindowBAResult:
    offs, _ = _packed_layout(W, P)

    def take(i, shape, dtype=jnp.float32):
        x = lax.dynamic_slice(buf, (int(offs[i]),), (int(offs[i + 1] - offs[i]),))
        x = x.reshape(shape)
        return x.astype(dtype) if dtype != jnp.float32 else x

    return solve_window_ba(
        take(0, (W, 4, 4)),
        take(1, (W - 1, 4, 4)),
        take(2, (W - 1,), bool),
        take(3, (P, 3)),
        take(4, (W, P, 3)),
        take(5, (W, P), bool),
        take(6, (P,), bool),
        take(7, (W,), bool),
        max_iters=max_iters,
    )


@partial(jax.jit, static_argnames=("W", "P"))
def packed_Twc0_last(buf: jnp.ndarray, W: int, P: int) -> jnp.ndarray:
    """Last initial pose Twc0[-1] out of the packed buffer (device-side)."""
    del P  # layout puts Twc0 first; P only fixes the total length
    return lax.dynamic_slice(buf, ((W - 1) * 16,), (16,)).reshape(4, 4)
