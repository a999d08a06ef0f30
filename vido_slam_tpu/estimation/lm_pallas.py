"""Fused Pallas TPU kernel for the per-frame unary-reprojection LM solves.

Covers the two hot per-frame g2o counterparts on one kernel:
- PoseOptimizationNew (camera pose; Huber sqrt(0.01), Optimizer.cc:2180) —
  pre-transform = identity;
- PoseOptimizationObjMot (object motion through P = K*Tcw, no robust
  kernel, Optimizer.cc:2826) — pre-transform = the fixed Tcw.

The XLA path (estimation/lm.lm_solve driven by estimation/pose.py) runs a
while_loop whose body dispatches ~30 small ops; with the camera solve plus
the 8-object vmapped solve this was ~1 ms/frame of latency-bound device
time. Here the ENTIRE Levenberg iteration — trial-point residuals,
analytic Jacobian planes, 6x6 normal equations, unrolled scalar Cholesky,
the g2o gain-ratio accept/reject policy — runs inside one kernel over
VMEM-resident (S, 128) planes, one grid step per problem.

Policy replicates lm.lm_solve exactly (one linearisation per iteration at
the trial point, Marquardt diag scaling, lam0 = tau*max diag H0, ni
doubling, gain/rel-tol/damping-explosion exits); tests assert parity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vido_slam_tpu.estimation.flow_joint_pallas import (
    _chol_solve6,
    _exp_se3_compose,
    _gram,
)


class PoseLMBatch(NamedTuple):
    T: jnp.ndarray          # (B, 4, 4)
    chi2: jnp.ndarray       # (B, N)
    num_iters: jnp.ndarray  # (B,)


def _pose_lm_kernel(cam_ref, data_ref, Tinit_ref, Tpre_ref, Tout_ref,
                    chi2_ref, *, max_iters: int,
                    huber_delta, init_lambda: float, gain_tol: float,
                    rel_tol: float):
    f32 = jnp.float32
    d = data_ref[0]
    px, py, pz = d[0], d[1], d[2]
    ou, ov = d[3], d[4]
    val = d[5]
    fx = cam_ref[0, 0]
    fy = cam_ref[0, 1]
    cx = cam_ref[0, 2]
    cy = cam_ref[0, 3]
    T0 = (Tinit_ref[0, 0, 0], Tinit_ref[0, 0, 1], Tinit_ref[0, 0, 2],
          Tinit_ref[0, 1, 0], Tinit_ref[0, 1, 1], Tinit_ref[0, 1, 2],
          Tinit_ref[0, 2, 0], Tinit_ref[0, 2, 1], Tinit_ref[0, 2, 2],
          Tinit_ref[0, 0, 3], Tinit_ref[0, 1, 3], Tinit_ref[0, 2, 3])
    P00, P01, P02 = Tpre_ref[0, 0, 0], Tpre_ref[0, 0, 1], Tpre_ref[0, 0, 2]
    P10, P11, P12 = Tpre_ref[0, 1, 0], Tpre_ref[0, 1, 1], Tpre_ref[0, 1, 2]
    P20, P21, P22 = Tpre_ref[0, 2, 0], Tpre_ref[0, 2, 1], Tpre_ref[0, 2, 2]
    q0, q1, q2 = Tpre_ref[0, 0, 3], Tpre_ref[0, 1, 3], Tpre_ref[0, 2, 3]

    def normal_eqs(T):
        # pw = T X (the variable transform), pc = Tpre pw (fixed chain)
        pwx = T[0] * px + T[1] * py + T[2] * pz + T[9]
        pwy = T[3] * px + T[4] * py + T[5] * pz + T[10]
        pwz = T[6] * px + T[7] * py + T[8] * pz + T[11]
        pcx = P00 * pwx + P01 * pwy + P02 * pwz + q0
        pcy = P10 * pwx + P11 * pwy + P12 * pwz + q1
        pcz = P20 * pwx + P21 * pwy + P22 * pwz + q2
        iz = 1.0 / jnp.where(jnp.abs(pcz) < 1e-6, f32(1e-6), pcz)
        ru = fx * pcx * iz + cx - ou
        rv = fy * pcy * iz + cy - ov
        chi2 = ru * ru + rv * rv
        if huber_delta is not None:
            d2 = huber_delta * huber_delta
            w_rob = jnp.where(chi2 <= d2, f32(1.0),
                              huber_delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
            rho = jnp.where(
                chi2 <= d2, chi2,
                2.0 * huber_delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2)
        else:
            w_rob = jnp.ones_like(chi2)
            rho = chi2
        w = w_rob * val
        cost = jnp.sum(rho * val)

        # J = Jproj(pc) @ Rpre @ [I | -hat(pw)] per point (left perturbation
        # of the VARIABLE transform: d pw = d_rho + d_phi x pw)
        a = fx * iz
        c = -fx * pcx * iz * iz
        e = fy * iz
        f = -fy * pcy * iz * iz
        # rows of Jproj @ Rpre: gu = a*P0 + c*P2, gv = e*P1 + f*P2 (3-vecs)
        gu0 = a * P00 + c * P20
        gu1 = a * P01 + c * P21
        gu2 = a * P02 + c * P22
        gv0 = e * P10 + f * P20
        gv1 = e * P11 + f * P21
        gv2 = e * P12 + f * P22
        # [I | -hat(pw)] phi columns: (g . col_j of -hat(pw)) with
        # -hat(pw) = [[0, z, -y], [-z, 0, x], [y, -x, 0]]
        Ju = (gu0, gu1, gu2,
              gu2 * pwy - gu1 * pwz,
              gu0 * pwz - gu2 * pwx,
              gu1 * pwx - gu0 * pwy)
        Jv = (gv0, gv1, gv2,
              gv2 * pwy - gv1 * pwz,
              gv0 * pwz - gv2 * pwx,
              gv1 * pwx - gv0 * pwy)
        # 6x6 normal equations + gradient via TWO MXU grams (8 rows each):
        # rows 0-5 = sqrt(w)*J, row 6 = sqrt(w)*r — H in [0:6, 0:6],
        # g in [0:6, 6]. Replaces 21 + 6 scalar plane reductions per
        # iteration (measured dominating the kernel's runtime).
        sw = jnp.sqrt(jnp.maximum(w, 0.0))
        Gu = _gram([sw * Ju[j] for j in range(6)] + [sw * ru, None], 8)
        Gv = _gram([sw * Jv[j] for j in range(6)] + [sw * rv, None], 8)
        G = Gu + Gv
        H = [None] * 21
        idx = 0
        for j in range(6):
            for k in range(j, 6):
                H[idx] = G[j, k]
                idx += 1
        g = [G[j, 6] for j in range(6)]
        return tuple(H), tuple(g), cost, chi2

    def full(Ht):
        S = [[None] * 6 for _ in range(6)]
        idx = 0
        for j in range(6):
            for k in range(j, 6):
                S[j][k] = Ht[idx]
                S[k][j] = Ht[idx]
                idx += 1
        return S

    H0, g0, cost0, _ = normal_eqs(T0)
    # upper-tri index of (j, j): offset = sum_{i<j}(6-i) = j*6 - j(j-1)/2
    diag_idx = [j * 6 - j * (j - 1) // 2 for j in range(6)]
    dH0 = [H0[diag_idx[j]] for j in range(6)]
    maxd0 = dH0[0]
    for j in range(1, 6):
        maxd0 = jnp.maximum(maxd0, dH0[j])
    lam0 = jnp.maximum(init_lambda * maxd0, 1e-30)
    done0 = cost0 <= gain_tol

    def cond(state):
        it, T, lam, ni, cost, H, g, done = state
        return (it < max_iters) & ~done

    def body(state):
        it, T, lam, ni, cost, H, g, done = state
        dH = [H[diag_idx[j]] for j in range(6)]
        maxd = dH[0]
        for j in range(1, 6):
            maxd = jnp.maximum(maxd, dH[j])
        floor = 1e-6 * jnp.maximum(maxd, 1e-12)
        dscale = [jnp.maximum(dH[j], floor) for j in range(6)]
        Hd = full(H)
        for j in range(6):
            Hd[j][j] = Hd[j][j] + lam * dscale[j]
        delta = _chol_solve6(Hd, [-g[j] for j in range(6)])
        bad = ~jnp.isfinite(sum(delta))
        delta = [jnp.where(bad, f32(0.0), delta[j]) for j in range(6)]
        T_new = _exp_se3_compose(delta, T)
        H_new, g_new, cost_new, _ = normal_eqs(T_new)
        pred = 0.5 * sum(
            delta[j] * (lam * dscale[j] * delta[j] - g[j]) for j in range(6))
        rho = (cost - cost_new) / jnp.maximum(pred, 1e-20)
        accept = (cost_new < cost) & ~bad
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_new = jnp.where(accept, lam_acc, lam * ni)
        ni_new = jnp.where(accept, f32(2.0), ni * 2.0)
        T_next = tuple(jnp.where(accept, tn, tc)
                       for tn, tc in zip(T_new, T))
        cost_next = jnp.where(accept, cost_new, cost)
        H_next = tuple(jnp.where(accept, hn, hc)
                       for hn, hc in zip(H_new, H))
        g_next = tuple(jnp.where(accept, gn, gc)
                       for gn, gc in zip(g_new, g))
        done_new = accept & (pred < gain_tol * jnp.maximum(cost, 1e-20))
        done_new = done_new | (
            accept & (cost - cost_new < rel_tol * jnp.maximum(cost, 1e-20)))
        done_new = done_new | (lam_new > 1e10 * jnp.maximum(lam0, 1e-30))
        return (it + 1, T_next, lam_new, ni_new, cost_next, H_next, g_next,
                done_new)

    init = (jnp.int32(0), T0, lam0, f32(2.0), cost0, H0, g0, done0)
    it, T, lam, ni, cost, H, g, done = lax.while_loop(cond, body, init)

    _, _, _, chi2 = normal_eqs(T)
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
    # row 3 carries the iteration count in slot 0 (the wrapper resets the
    # homogeneous row and reads num_iters from it — a (B, 1) int output
    # block would violate the SMEM block-divisibility rule)
    Tout_ref[0, 3, 0] = it.astype(f32)
    Tout_ref[0, 3, 1] = f32(0.0)
    Tout_ref[0, 3, 2] = f32(0.0)
    Tout_ref[0, 3, 3] = f32(1.0)
    chi2_ref[0] = chi2


def pose_lm_batched_pallas(
    T_init: jnp.ndarray,    # (B, 4, 4) variable transforms
    T_pre: jnp.ndarray,     # (B, 4, 4) fixed pre-transforms (I for camera)
    pts3d: jnp.ndarray,     # (B, N, 3) or (N, 3) shared
    obs: jnp.ndarray,       # (B, N, 2) or (N, 2)
    valid: jnp.ndarray,     # (B, N)
    cam,
    *,
    huber_delta=None,
    max_iters: int = 100,
    init_lambda: float = 1e-5,
    gain_tol: float = 1e-9,
    rel_tol: float = 1e-5,
    interpret: bool = False,
) -> PoseLMBatch:
    B, N = valid.shape
    f32 = jnp.float32
    S = -(-N // 128)
    Np = S * 128

    def bcast(x):
        x = jnp.asarray(x, f32)
        if x.ndim == 2:
            x = jnp.broadcast_to(x[None], (B,) + x.shape)
        return x

    pts3d = bcast(pts3d)
    obs = bcast(obs)

    def plane(x):
        return jnp.pad(x, ((0, 0), (0, Np - N))).reshape(B, S, 128)

    data = jnp.stack([
        plane(pts3d[..., 0]), plane(pts3d[..., 1]), plane(pts3d[..., 2]),
        plane(obs[..., 0]), plane(obs[..., 1]),
        plane(valid.astype(f32)),
    ], axis=1)
    cam_params = jnp.asarray([[cam.fx, cam.fy, cam.cx, cam.cy]], f32)

    Tout, chi2 = pl.pallas_call(
        functools.partial(
            _pose_lm_kernel, max_iters=max_iters, huber_delta=huber_delta,
            init_lambda=init_lambda, gain_tol=gain_tol, rel_tol=rel_tol),
        out_shape=(
            jax.ShapeDtypeStruct((B, 4, 4), f32),
            jax.ShapeDtypeStruct((B, S, 128), f32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6, S, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(cam_params, data, jnp.asarray(T_init, f32), jnp.asarray(T_pre, f32))

    its = Tout[:, 3, 0].astype(jnp.int32)
    Tout = Tout.at[:, 3, :].set(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], f32))
    return PoseLMBatch(T=Tout, chi2=chi2.reshape(B, Np)[:, :N],
                       num_iters=its)
