"""Inertial-only optimization — Optimizer::InertialOptimization
(reference vido_slam/src/Optimizer.cc:2336-2620) and the gravity/scale/bias
initialization flow of Tracking::InitializeIMU (Tracking.cc:937-1044).

Variables (the EdgeInertialGS vertex set, G2oTypes.h:339-424): per-frame
body velocities, shared gyro/acc biases, a 2-DoF gravity direction and a
scale; camera poses stay fixed. Residuals per consecutive frame pair are the
9-dim preintegration errors (G2oTypes.cc EdgeInertialGS::computeError):

  r_R = Log( dR(bg)^T R1^T R2 )
  r_V = R1^T (s (V2 - V1) - g dt) - dV(bg, ba)
  r_P = R1^T (s (P2 - P1 - V1 dt) - 0.5 g dt^2) - dP(bg, ba)

whitened by the preintegration covariance, plus bias priors (priorG=1e2,
priorA=1e9 at first init, Tracking.cc:937,1000). Solved with the generic
batched LM on a flat chart (velocities, biases, 2 gravity angles,
log-scale). Fixed shapes: pad to `max_frames` with pair validity masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vido_slam_tpu.estimation.lm import lm_solve
from vido_slam_tpu.geometry.so3 import exp_so3, log_so3
from vido_slam_tpu.imu.preintegration import (
    GRAVITY_VALUE,
    )

_HI = lax.Precision.HIGHEST


class InertialInitResult(NamedTuple):
    scale: jnp.ndarray       # scalar
    Rwg: jnp.ndarray         # (3, 3) gravity-direction rotation
    bg: jnp.ndarray          # (3,)
    ba: jnp.ndarray          # (3,)
    velocities: jnp.ndarray  # (N, 3) velocities (mono/scaled frame)
    cost: jnp.ndarray
    num_iters: jnp.ndarray


def estimate_gravity_direction(Rwb: jnp.ndarray, dV: jnp.ndarray,
                               pair_valid: jnp.ndarray) -> jnp.ndarray:
    """Initial Rwg from the mean preintegrated velocity direction
    (Tracking.cc:955-988): dirG = -sum(Rwb_i dV_i); Rwg rotates gI=(0,0,-1)
    onto it."""
    dirG = -jnp.sum(
        jnp.einsum("nij,nj->ni", Rwb[:-1], dV, precision=_HI)
        * pair_valid[:, None],
        axis=0,
    )
    dirG = dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
    gI = jnp.array([0.0, 0.0, -1.0])
    v = jnp.cross(gI, dirG)
    cos = jnp.dot(gI, dirG)
    ang = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    vn = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)
    return exp_so3(vn * ang)


def initialize_imu(
    Rwb: jnp.ndarray,
    twb: jnp.ndarray,
    dts: jnp.ndarray,
    dR: jnp.ndarray,
    dV: jnp.ndarray,
    dP: jnp.ndarray,
    JRg: jnp.ndarray,
    JVg: jnp.ndarray,
    JVa: jnp.ndarray,
    JPg: jnp.ndarray,
    JPa: jnp.ndarray,
    C9: jnp.ndarray,
    pair_valid: jnp.ndarray,
    prior_g: float = 1e2,
    prior_a: float = 1e9,
    refine_iters: int = 100,
) -> InertialInitResult:
    """Full IMU initialization: staged, so every stage starts near its
    optimum (replaces the reference's single joint LM, Tracking.cc:937-1044,
    whose landscape has spurious minima when started cold):

      A. gyro bias from rotation-only residuals (estimate_gyro_bias);
      B. closed-form linear alignment for velocities/gravity/scale
         (linear_alignment — exact global optimum of the linearised system);
      C. joint LM polish with the full whitened 9-dim residuals and bias
         priors (inertial_optimization).
    """
    # cheapest-first gate: one closed-form stage-B pass at zero gyro bias.
    # The tracker retries init EVERY frame while uninitialized
    # (Tracking.cc:1452 semantics); on sequences whose visual trajectory
    # cannot support initialization every attempt would otherwise pay
    # stage A's 20-iteration LM before being rejected. The gyro bias only
    # perturbs dV/dP to first order, so a hopeless attempt (scale below
    # the reference's 0.1 abort gate at the GLOBAL optimum of the
    # linearised problem) is hopeless at bg=0 too.
    Rwg_g = estimate_gravity_direction(Rwb, dV, pair_valid)
    _, s_gate, Rwg_gate, _ = linear_alignment(
        Rwb, twb, dts, dV, dP, pair_valid, Rwg_g)
    if float(jax.device_get(s_gate)) < 0.08:
        N = Rwb.shape[0]
        return InertialInitResult(
            scale=jnp.minimum(s_gate, 0.05), Rwg=Rwg_gate,
            bg=jnp.zeros(3), ba=jnp.zeros(3),
            velocities=jnp.zeros((N, 3)), cost=jnp.float32(jnp.inf),
            num_iters=jnp.int32(0))

    bg_A = estimate_gyro_bias(Rwb, dR, JRg, pair_valid)
    # correct the preintegrated deltas to bias bg_A (first-order Jacobians,
    # ImuTypes.cc:347-368); stage C then estimates a small residual bias
    dR_b = jax.vmap(lambda R, J: R @ exp_so3(J @ bg_A))(dR, JRg)
    dV_b = dV + jnp.einsum("nij,j->ni", JVg, bg_A)
    dP_b = dP + jnp.einsum("nij,j->ni", JPg, bg_A)

    Rwg0 = estimate_gravity_direction(Rwb, dV_b, pair_valid)
    # re-centre the gravity tangent twice: each pass is closed-form, and the
    # second removes the first-order linearisation error of the first
    U, s, Rwg1, _ = linear_alignment(Rwb, twb, dts, dV_b, dP_b, pair_valid, Rwg0)
    U, s, Rwg1, _ = linear_alignment(Rwb, twb, dts, dV_b, dP_b, pair_valid, Rwg1)
    # cheap reject: when even the closed-form global optimum of stage B is
    # degenerate (scale below the reference's abort gate, Tracking.cc:1008)
    # the caller will reject the attempt anyway — skip the expensive LM
    # polish. Matters when the tracker retries init EVERY frame on a
    # sequence whose visual trajectory cannot support it.
    if float(jax.device_get(s)) < 0.1:
        N = Rwb.shape[0]
        return InertialInitResult(
            scale=s, Rwg=Rwg1, bg=bg_A, ba=jnp.zeros(3),
            velocities=jnp.zeros((N, 3)), cost=jnp.float32(jnp.inf),
            num_iters=jnp.int32(0))
    s_safe = jnp.maximum(s, 0.1)  # reference aborts on tiny scale (:1008)

    res = inertial_optimization(
        Rwb, twb, dts, dR_b, dV_b, dP_b, JRg, JVg, JVa, JPg, JPa, C9,
        pair_valid, Rwg1, prior_g, prior_a,
        v_init=U / s_safe, log_s_init=jnp.log(s_safe),
        max_iters=refine_iters,
    )
    return res._replace(bg=res.bg + bg_A)


@partial(jax.jit, static_argnames=("max_iters",))
def estimate_gyro_bias(
    Rwb: jnp.ndarray,        # (N, 3, 3)
    dR: jnp.ndarray,         # (N-1, 3, 3)
    JRg: jnp.ndarray,        # (N-1, 3, 3)
    pair_valid: jnp.ndarray,
    *,
    max_iters: int = 20,
) -> jnp.ndarray:
    """Stage A: gyro bias from rotation-only residuals
    r(bg) = Log((dR Exp(JRg bg))^T R1^T R2) — 3 unknowns, near-linear."""

    def residual(bg):
        dR_b = jax.vmap(lambda R, J: R @ exp_so3(J @ bg))(dR, JRg)
        r = log_so3(jnp.einsum("nai,nba,nbl->nil", dR_b, Rwb[:-1], Rwb[1:],
                               precision=_HI))
        return r * pair_valid[:, None]

    res = lm_solve(residual, jnp.zeros(3), max_iters=max_iters)
    return res.x


@jax.jit
def linear_alignment(
    Rwb: jnp.ndarray,         # (N, 3, 3)
    twb: jnp.ndarray,         # (N, 3) mono-scale positions
    dts: jnp.ndarray,         # (N-1,)
    dV_b: jnp.ndarray,        # (N-1, 3) bias-corrected preintegrated deltas
    dP_b: jnp.ndarray,        # (N-1, 3)
    pair_valid: jnp.ndarray,
    Rwg0: jnp.ndarray,
):
    """Stage B: closed-form visual-inertial alignment.

    Substituting U_i = s V_i makes both preintegration constraints LINEAR in
    the unknowns x = [U_1..U_N, dg(2), s]:
        R1^T (U2 - U1 - (g0 + B dg) dt)                    = dV
        R1^T (s (P2 - P1) - U1 dt - 0.5 (g0 + B dg) dt^2)  = dP
    so the global optimum is one least-squares solve — no LM, no local
    minima (the VINS-Mono-style aligner, replacing the reference's fragile
    joint initialization)."""
    N = Rwb.shape[0]
    gI = jnp.array([0.0, 0.0, -1.0]) * GRAVITY_VALUE
    g0 = Rwg0 @ gI
    # tangent basis of the gravity sphere at g0: columns Rwg0 @ e1, e2 x |g|
    B = Rwg0 @ jnp.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]) * GRAVITY_VALUE

    P = 3 * N + 3  # unknowns: U (3N), dg (2), s (1)
    M = (N - 1) * 6
    R1 = Rwb[:-1]
    R1t = jnp.swapaxes(R1, -1, -2)
    dt = dts[:, None]

    def rows_for_pair(i):
        A = jnp.zeros((6, P))
        Rt = R1t[i]
        d = dts[i]
        # rV rows (dynamic column offsets need dynamic_update_slice)
        A = lax.dynamic_update_slice(A, -Rt, (0, 3 * i))
        A = lax.dynamic_update_slice(A, Rt, (0, 3 * (i + 1)))
        A = A.at[:3, 3 * N: 3 * N + 2].set(-d * Rt @ B)
        bV = dV_b[i] + d * Rt @ g0
        # rP rows
        A = lax.dynamic_update_slice(A, -d * Rt, (3, 3 * i))
        A = A.at[3:, 3 * N: 3 * N + 2].set(-0.5 * d * d * Rt @ B)
        A = A.at[3:, 3 * N + 2].set(Rt @ (twb[i + 1] - twb[i]))
        bP = dP_b[i] + 0.5 * d * d * Rt @ g0
        return A, jnp.concatenate([bV, bP])

    A_all, b_all = jax.vmap(rows_for_pair)(jnp.arange(N - 1))
    w = pair_valid.astype(A_all.dtype)[:, None, None]
    A_all = (A_all * w).reshape(M, P)
    b_all = (b_all * w[:, :, 0]).reshape(M)
    # normal equations with light Tikhonov on dg (keeps the gravity tangent
    # well-posed when excitation is low)
    AtA = A_all.T @ A_all + 1e-8 * jnp.eye(P)
    Atb = A_all.T @ b_all
    x = jnp.linalg.solve(AtA, Atb)
    U = x[: 3 * N].reshape(N, 3)
    dg = x[3 * N: 3 * N + 2]
    s = x[3 * N + 2]
    # rebuild Rwg from the refined gravity direction (avoids tangent-sign
    # bookkeeping): Rwg maps gI = (0,0,-1) onto unit(g0 + B dg)
    g_new = g0 + B @ dg
    gn = g_new / jnp.maximum(jnp.linalg.norm(g_new), 1e-9)
    gI_u = jnp.array([0.0, 0.0, -1.0])
    v = jnp.cross(gI_u, gn)
    ang = jnp.arccos(jnp.clip(jnp.dot(gI_u, gn), -1.0, 1.0))
    vn = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)
    Rwg = exp_so3(vn * ang)
    return U, s, Rwg, dg


@partial(jax.jit, static_argnames=("max_iters", "fix_biases"))
def inertial_optimization(
    Rwb: jnp.ndarray,          # (N, 3, 3) body rotations (fixed)
    twb: jnp.ndarray,          # (N, 3) body positions (fixed)
    dts: jnp.ndarray,          # (N-1,) preintegration time per pair
    dR: jnp.ndarray,           # (N-1, 3, 3) preintegrated deltas at bias 0
    dV: jnp.ndarray,           # (N-1, 3)
    dP: jnp.ndarray,           # (N-1, 3)
    JRg: jnp.ndarray,          # (N-1, 3, 3) bias Jacobians
    JVg: jnp.ndarray,
    JVa: jnp.ndarray,
    JPg: jnp.ndarray,
    JPa: jnp.ndarray,
    C9: jnp.ndarray,           # (N-1, 9, 9) preintegration covariance
    pair_valid: jnp.ndarray,   # (N-1,) bool
    Rwg0: jnp.ndarray,         # (3, 3) initial gravity rotation
    prior_g: float = 1e2,
    prior_a: float = 1e9,
    v_init: jnp.ndarray = None,       # (N, 3) optional velocity init
    log_s_init: jnp.ndarray = None,   # optional scale init (log)
    *,
    max_iters: int = 200,
    fix_biases: bool = False,
) -> InertialInitResult:
    N = Rwb.shape[0]
    gI = jnp.array([0.0, 0.0, -1.0]) * GRAVITY_VALUE

    # whitening: W = C9^-1 = L L^T; whitened r = L^T r (g2o sets the edge
    # information to the preintegration covariance inverse). A small relative
    # jitter keeps the inverse well-posed for near-singular covariances.
    # Whitening. The full 9x9 covariance is near-singular (rotation, velocity
    # and position errors are strongly correlated over short intervals) and
    # its f32 inverse produces a noise-dominated metric whose spurious minima
    # trade gyro bias against position misfit. Block-diagonal whitening
    # (independent 3x3 inverses for the rot/vel/pos blocks) keeps the
    # relative rot-vs-vel-vs-pos weighting while staying well-conditioned —
    # the standard robust simplification.
    def block_L(Cb):
        d = jnp.mean(jnp.diag(Cb))
        Wb = jnp.linalg.inv(Cb + jnp.eye(3) * 1e-4 * jnp.maximum(d, 1e-14))
        return jnp.linalg.cholesky(0.5 * (Wb + Wb.T))

    L_r = jax.vmap(lambda C: block_L(C[0:3, 0:3]))(C9)
    L_v = jax.vmap(lambda C: block_L(C[3:6, 3:6]))(C9)
    L_p = jax.vmap(lambda C: block_L(C[6:9, 6:9]))(C9)

    # initial velocities from finite differences (mono-scale convention:
    # vertex velocities live in the same scaled frame as the positions)
    if v_init is None:
        v0 = jnp.zeros((N, 3))
        dts_safe = jnp.maximum(dts, 1e-3)
        vel_fd = (twb[1:] - twb[:-1]) / dts_safe[:, None]
        v0 = v0.at[:-1].set(vel_fd)
        v0 = v0.at[-1].set(vel_fd[-1])
    else:
        v0 = v_init

    def unpack(x):
        vel = x[: 3 * N].reshape(N, 3)
        bg = x[3 * N: 3 * N + 3]
        ba = x[3 * N + 3: 3 * N + 6]
        dg = x[3 * N + 6: 3 * N + 8]
        log_s = x[3 * N + 8]
        if fix_biases:
            bg = jnp.zeros(3)
            ba = jnp.zeros(3)
        return vel, bg, ba, dg, log_s

    def residual(x):
        vel, bg, ba, dg, log_s = unpack(x)
        s = jnp.exp(log_s)
        Rwg = Rwg0 @ exp_so3(jnp.array([dg[0], dg[1], 0.0]))
        g = Rwg @ gI

        dbg, dba = bg, ba
        # NOTE: no SVD re-orthonormalisation here — jacfwd through SVD is
        # NaN at the repeated singular values of a rotation; the product of
        # two rotations is orthonormal to f32 precision anyway
        dR_b = jax.vmap(lambda R, J: R @ exp_so3(J @ dbg))(dR, JRg)
        dV_b = dV + jnp.einsum("nij,j->ni", JVg, dbg) + jnp.einsum("nij,j->ni", JVa, dba)
        dP_b = dP + jnp.einsum("nij,j->ni", JPg, dbg) + jnp.einsum("nij,j->ni", JPa, dba)

        R1 = Rwb[:-1]
        R2 = Rwb[1:]
        P1, P2 = twb[:-1], twb[1:]
        V1, V2 = vel[:-1], vel[1:]
        dt = dts[:, None]

        rR = log_so3(
            jnp.einsum("nai,nba,nbl->nil", dR_b, R1, R2, precision=_HI)
        )
        rV = jnp.einsum(
            "nji,nj->ni", R1, s * (V2 - V1) - g * dt, precision=_HI
        ) - dV_b
        rP = jnp.einsum(
            "nji,nj->ni",
            R1, s * (P2 - P1 - V1 * dt) - 0.5 * g * dt * dt, precision=_HI,
        ) - dP_b
        rRw = jnp.einsum("nji,nj->ni", L_r, rR, precision=_HI)
        rVw = jnp.einsum("nji,nj->ni", L_v, rV, precision=_HI)
        rPw = jnp.einsum("nji,nj->ni", L_p, rP, precision=_HI)
        r_white = jnp.concatenate([rRw, rVw, rPw], axis=-1)  # (N-1, 9)
        r_white = r_white * pair_valid[:, None]

        # bias priors (EdgePriorGyro/Acc with info prior*I)
        pg = jnp.sqrt(prior_g) * bg
        pa = jnp.sqrt(prior_a) * ba
        extra = jnp.concatenate([pg, pa]).reshape(2, 3)
        # pad extra rows to 9 columns to share one residual array
        extra9 = jnp.concatenate([extra, jnp.zeros((2, 6))], axis=-1)
        return jnp.concatenate([r_white, extra9], axis=0)

    ls0 = jnp.zeros(1) if log_s_init is None else jnp.reshape(log_s_init, (1,))
    x0 = jnp.concatenate([v0.reshape(-1), jnp.zeros(8), ls0])
    res = lm_solve(residual, x0, max_iters=max_iters)
    vel, bg, ba, dg, log_s = unpack(res.x)
    Rwg = Rwg0 @ exp_so3(jnp.array([dg[0], dg[1], 0.0]))
    return InertialInitResult(
        scale=jnp.exp(log_s), Rwg=Rwg, bg=bg, ba=ba,
        velocities=vel, cost=res.cost, num_iters=res.num_iters,
    )
