"""Fused Pallas TPU kernel for the joint flow+pose LM solver.

The XLA formulation of `flow_joint_optimization` (estimation/flow_joint.py,
the counterpart of Optimizer::PoseOptimizationFlow2Cam / ...Flow2,
Optimizer.cc:2622-2824 / 3037-3253) runs 4 rounds x a while_loop whose body
is ~40 small ops (projection, jacobian planes, 6x6 normal equations,
scalar Cholesky, flow update, trial-cost pass). On the device trace each
round-iteration costs ~100 us of dispatch-bound time — the per-frame pose
and object-motion loops were profiled at ~1.2 ms/frame combined (BENCH_r04
VERDICT weak item 1). This kernel runs the ENTIRE 4-round solve as ONE
Pallas program per problem: all point planes stay VMEM-resident, every LM
iteration is elementwise VPU work over (S, 128) tiles plus ~30 scalar
reductions, and the 6x6 solve is an unrolled scalar Cholesky.

Semantics replicate flow_joint.py exactly (same constants, same
accept/reject, gates and round structure); tests/test_flow_joint.py
asserts parity against the XLA path.

Layout: each per-point quantity is an (S, 128) f32 plane (N padded to
S*128); the 9 input planes ride one (B, 9, S, 128) stack, grid = (B,) — one
grid step per problem (camera: B=1; the per-frame object batch: B=K).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vido_slam_tpu.estimation.flow_joint import (
    CHI2_LATER,
    MIN_EDGES,
    RP_THRES_JOINT,
    HUBER_DELTA,
    ROUND_ITERS,
    SIGMA_PRIOR,
    SIGMA_PROJ,
)


class FlowJointBatch(NamedTuple):
    T: jnp.ndarray          # (B, 4, 4)
    flow: jnp.ndarray       # (B, N, 2)
    inliers: jnp.ndarray    # (B, N) bool
    num_inliers: jnp.ndarray  # (B,)
    chi2: jnp.ndarray       # (B, N)


def _chol_solve6(S, b):
    """Unrolled scalar Cholesky solve; S is a 6x6 list-of-lists of rank-0
    arrays, b a 6-list (mirrors estimation/lm._solve_spd for P<=8)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = S[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = Ljj
        for i in range(j + 1, n):
            s2 = S[i][j]
            for k in range(j):
                s2 = s2 - L[i][k] * L[j][k]
            L[i][j] = s2 / Ljj
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _gram(rows, n_rows: int):
    """MXU Gram matrix of (S, 128) planes: G[j, k] = sum_{s,l} rows[j]*rows[k],
    computed as S small (R, 128) @ (128, R) dots instead of R*(R+1)/2 full-
    plane scalar reductions — the reductions dominated the first kernel
    version's runtime (~27 VPU passes per LM iteration; this is ~S MXU ops).
    `rows` may contain None entries (zero placeholder to pad R to a
    sublane-friendly multiple of 8)."""
    S = None
    for r in rows:
        if r is not None:
            S = r.shape[0]
            break
    zero = None
    mats = []
    for r in rows:
        if r is None:
            if zero is None:
                zero = jnp.zeros((S, 128), jnp.float32)
            mats.append(zero)
        else:
            mats.append(r.astype(jnp.float32))
    A = jnp.stack(mats)                      # (R, S, 128)
    acc = jnp.zeros((n_rows, n_rows), jnp.float32)
    for s in range(S):
        As = A[:, s, :]                      # (R, 128)
        acc = acc + jax.lax.dot_general(
            As, As, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _exp_se3_compose(dxi, T):
    """T_new = exp(dxi) o T on scalar tuples. dxi: 6-list [rho, phi];
    T: 12-tuple (R00..R22, t0, t1, t2). Same series switch as
    geometry/se3.exp_se3."""
    r0, r1, r2, w0, w1, w2 = dxi
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    th = jnp.sqrt(jnp.maximum(th2, 1e-24))
    small = th2 < 1e-12
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-24))
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / jnp.maximum(th2 * th, 1e-24))
    # hat(w) and hat(w)^2 entries
    # R_d = I + A*hat + B*hat2 ; V = I + B*hat + C*hat2
    h = [[0.0, -w2, w1], [w2, 0.0, -w0], [-w1, w0, 0.0]]
    h2 = [[-(w1 * w1 + w2 * w2), w0 * w1, w0 * w2],
          [w0 * w1, -(w0 * w0 + w2 * w2), w1 * w2],
          [w0 * w2, w1 * w2, -(w0 * w0 + w1 * w1)]]
    I3 = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    Rd = [[I3[i][j] + A * h[i][j] + B * h2[i][j] for j in range(3)]
          for i in range(3)]
    V = [[I3[i][j] + B * h[i][j] + C * h2[i][j] for j in range(3)]
         for i in range(3)]
    rho = [r0, r1, r2]
    td = [sum(V[i][j] * rho[j] for j in range(3)) for i in range(3)]
    R = [[T[0], T[1], T[2]], [T[3], T[4], T[5]], [T[6], T[7], T[8]]]
    t = [T[9], T[10], T[11]]
    Rn = [[sum(Rd[i][k] * R[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]
    tn = [sum(Rd[i][k] * t[k] for k in range(3)) + td[i] for i in range(3)]
    return (Rn[0][0], Rn[0][1], Rn[0][2], Rn[1][0], Rn[1][1], Rn[1][2],
            Rn[2][0], Rn[2][1], Rn[2][2], tn[0], tn[1], tn[2])


def _fj_kernel(cam_ref, data_ref, Tinit_ref, Tout_ref, fout_ref, chi2_ref,
               act_ref, *, iters: int):
    f32 = jnp.float32
    d = data_ref[0]
    px, py, pz = d[0], d[1], d[2]
    ou, ov = d[3], d[4]
    fmu, fmv = d[5], d[6]
    act0, val = d[7], d[8]                       # 0/1 f32 planes
    fx = cam_ref[0, 0]
    fy = cam_ref[0, 1]
    cx = cam_ref[0, 2]
    cy = cam_ref[0, 3]
    T0 = (Tinit_ref[0, 0, 0], Tinit_ref[0, 0, 1], Tinit_ref[0, 0, 2],
          Tinit_ref[0, 1, 0], Tinit_ref[0, 1, 1], Tinit_ref[0, 1, 2],
          Tinit_ref[0, 2, 0], Tinit_ref[0, 2, 1], Tinit_ref[0, 2, 2],
          Tinit_ref[0, 0, 3], Tinit_ref[0, 1, 3], Tinit_ref[0, 2, 3])

    s_pr = SIGMA_PRIOR * val                    # flow-prior information

    def project(T):
        pcx = T[0] * px + T[1] * py + T[2] * pz + T[9]
        pcy = T[3] * px + T[4] * py + T[5] * pz + T[10]
        pcz = T[6] * px + T[7] * py + T[8] * pz + T[11]
        return pcx, pcy, pcz

    def resid(T, fu, fv):
        pcx, pcy, pcz = project(T)
        iz = 1.0 / jnp.where(jnp.abs(pcz) < 1e-6, f32(1e-6), pcz)
        r1u = ou + fu - (fx * pcx * iz + cx)
        r1v = ov + fv - (fy * pcy * iz + cy)
        return pcx, pcy, pcz, iz, r1u, r1v

    def cost_fn(T, fu, fv, active, use_huber):
        _, _, pcz, _, r1u, r1v = resid(T, fu, fv)
        c1 = SIGMA_PROJ * (r1u * r1u + r1v * r1v)
        if use_huber:
            d2 = HUBER_DELTA * HUBER_DELTA
            rho = jnp.where(
                c1 <= d2, c1,
                2.0 * HUBER_DELTA * jnp.sqrt(jnp.maximum(c1, 1e-12)) - d2)
        else:
            rho = c1
        gate = active * (pcz > 1e-3).astype(f32)
        r2u = fu - fmu
        r2v = fv - fmv
        c2 = s_pr * (r2u * r2u + r2v * r2v)
        return jnp.sum(rho * gate) + jnp.sum(c2)

    fu = fmu * val
    fv = fmv * val
    active = act0

    for rnd in range(4):
        use_huber = rnd < 3
        enough = jnp.sum(active) >= MIN_EDGES

        def body(state, use_huber=use_huber, enough=enough, active=active):
            T, fu_, fv_, lam, c_prev, it, done = state
            pcx, pcy, pcz, iz, r1u, r1v = resid(T, fu_, fv_)
            chi2 = SIGMA_PROJ * (r1u * r1u + r1v * r1v)
            if use_huber:
                d2 = HUBER_DELTA * HUBER_DELTA
                w = jnp.where(chi2 <= d2, f32(1.0),
                              HUBER_DELTA / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
            else:
                w = jnp.ones_like(chi2)
            a = active * (pcz > 1e-3).astype(f32) * (SIGMA_PROJ * w)
            v = a + s_pr + 1e-12

            # J = d proj / d xi (left perturbation); D = -J
            az = fx * iz
            cz = -fx * pcx * iz * iz
            ez = fy * iz
            fz = -fy * pcy * iz * iz
            zr = jnp.zeros_like(pz)
            Ju = (az, zr, cz, cz * pcy, az * pcz - cz * pcx, -az * pcy)
            Jv = (zr, ez, fz, fz * pcy - ez * pcz, -fz * pcx, ez * pcx)

            r2u = fu_ - fmu
            r2v = fv_ - fmv
            b_fu = a * r1u + s_pr * r2u
            b_fv = a * r1v + s_pr * r2v
            coef = a * s_pr / v
            ru = a * r1u - (a / v) * b_fu
            rv = a * r1v - (a / v) * b_fv
            # Schur system + rhs in TWO MXU grams (16 rows each) instead of
            # 21 + 6 scalar plane reductions: rows 0-5 carry sqrt(coef)*J
            # (Gram block [0:6, 0:6] = S), rows 6-11 carry raw J and row 12
            # the reduced residual (cross block [6+j, 12] = rhs_j)
            sc = jnp.sqrt(jnp.maximum(coef, 0.0))
            Gu = _gram([sc * Ju[j] for j in range(6)]
                       + [Ju[j] for j in range(6)] + [ru, None, None, None],
                       16)
            Gv = _gram([sc * Jv[j] for j in range(6)]
                       + [Jv[j] for j in range(6)] + [rv, None, None, None],
                       16)
            G = Gu + Gv
            S = [[G[j, k] for k in range(6)] for j in range(6)]
            rhs = [G[6 + j, 12] for j in range(6)]
            Sd = [[S[j][k] if k != j
                   else S[j][j] + lam * jnp.maximum(S[j][j], 1e-6)
                   for k in range(6)] for j in range(6)]
            dxi = _chol_solve6(Sd, rhs)

            Jdx_u = sum(Ju[j] * dxi[j] for j in range(6))
            Jdx_v = sum(Jv[j] * dxi[j] for j in range(6))
            dfu = -(b_fu - a * Jdx_u) / v
            dfv = -(b_fv - a * Jdx_v) / v
            T_new = _exp_se3_compose(dxi, T)
            fu_n = fu_ + dfu
            fv_n = fv_ + dfv
            c_new = cost_fn(T_new, fu_n, fv_n, active, use_huber)
            finite = jnp.isfinite(sum(dxi))
            ok = (c_new < c_prev) & finite & enough
            T = tuple(jnp.where(ok, tn, tc) for tn, tc in zip(T_new, T))
            fu_ = jnp.where(ok, fu_n, fu_)
            fv_ = jnp.where(ok, fv_n, fv_)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            c = jnp.where(ok, c_new, c_prev)
            done = ok & (c_prev - c_new < 1e-8 * jnp.maximum(c_prev, 1.0))
            return T, fu_, fv_, lam, c, it + 1, done

        def cond(state):
            _, _, _, lam, _, it, done = state
            return (it < iters) & ~done & (lam < 1e6)

        c0 = cost_fn(T0, fu, fv, active, use_huber)
        state = (T0, fu, fv, f32(1e-3), c0, jnp.int32(0), jnp.bool_(False))
        T, fu, fv, _, _, _, _ = lax.while_loop(cond, body, state)

        # round-end chi2 gate (pose resets to T0 next round; flows persist)
        _, _, pcz, _, r1u, r1v = resid(T, fu, fv)
        chi2 = SIGMA_PROJ * (r1u * r1u + r1v * r1v)
        thr = RP_THRES_JOINT if rnd == 0 else CHI2_LATER
        active = val * (chi2 <= thr).astype(f32) * (pcz > 1e-3).astype(f32)

    Tout_ref[0, 0, 0] = T[0]
    Tout_ref[0, 0, 1] = T[1]
    Tout_ref[0, 0, 2] = T[2]
    Tout_ref[0, 1, 0] = T[3]
    Tout_ref[0, 1, 1] = T[4]
    Tout_ref[0, 1, 2] = T[5]
    Tout_ref[0, 2, 0] = T[6]
    Tout_ref[0, 2, 1] = T[7]
    Tout_ref[0, 2, 2] = T[8]
    Tout_ref[0, 0, 3] = T[9]
    Tout_ref[0, 1, 3] = T[10]
    Tout_ref[0, 2, 3] = T[11]
    Tout_ref[0, 3, 0] = f32(0.0)
    Tout_ref[0, 3, 1] = f32(0.0)
    Tout_ref[0, 3, 2] = f32(0.0)
    Tout_ref[0, 3, 3] = f32(1.0)
    fout_ref[0, 0] = fu
    fout_ref[0, 1] = fv
    chi2_ref[0] = chi2
    act_ref[0] = active


def flow_joint_batched_pallas(
    T_init: jnp.ndarray,       # (B, 4, 4)
    pts3d: jnp.ndarray,        # (B, N, 3) or (N, 3) shared
    obs_last: jnp.ndarray,     # (B, N, 2) or (N, 2)
    flow_meas: jnp.ndarray,    # (B, N, 2) or (N, 2)
    valid: jnp.ndarray,        # (B, N) bool — init edge set per problem
    cam,
    iters: int = ROUND_ITERS,
    interpret: bool = False,
) -> FlowJointBatch:
    """Batched fused 4-round joint solve; one grid step per problem."""
    B, N = valid.shape
    f32 = jnp.float32
    S = -(-N // 128)
    Np = S * 128

    def bcast(x):
        x = jnp.asarray(x, f32)
        if x.ndim == 2:                    # (N, C) shared across problems
            x = jnp.broadcast_to(x[None], (B,) + x.shape)
        return x

    pts3d = bcast(pts3d)
    obs_last = bcast(obs_last)
    flow_meas = bcast(flow_meas)
    act = valid.astype(f32)

    def plane(x):
        return jnp.pad(x, ((0, 0), (0, Np - N))).reshape(B, S, 128)

    data = jnp.stack([
        plane(pts3d[..., 0]), plane(pts3d[..., 1]), plane(pts3d[..., 2]),
        plane(obs_last[..., 0]), plane(obs_last[..., 1]),
        plane(flow_meas[..., 0]), plane(flow_meas[..., 1]),
        plane(act), plane(act),
    ], axis=1)                                    # (B, 9, S, 128)
    cam_params = jnp.asarray(
        [[cam.fx, cam.fy, cam.cx, cam.cy]], f32)  # (1, 4)

    Tout, fout, chi2, actf = pl.pallas_call(
        functools.partial(_fj_kernel, iters=iters),
        out_shape=(
            jax.ShapeDtypeStruct((B, 4, 4), f32),
            jax.ShapeDtypeStruct((B, 2, S, 128), f32),
            jax.ShapeDtypeStruct((B, S, 128), f32),
            jax.ShapeDtypeStruct((B, S, 128), f32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9, S, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, S, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(cam_params, data, jnp.asarray(T_init, f32))

    flow = fout.reshape(B, 2, Np)[..., :N].transpose(0, 2, 1)
    chi2 = chi2.reshape(B, Np)[:, :N]
    inl = actf.reshape(B, Np)[:, :N] > 0.5
    return FlowJointBatch(T=Tout, flow=flow, inliers=inl,
                          num_inliers=jnp.sum(inl, axis=1), chi2=chi2)
