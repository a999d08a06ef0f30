"""Joint flow + pose optimization (the reference's `bJoint` path).

TPU-native replacements for the reference's joint g2o solves:
- `flow_joint_optimization`  ~ Optimizer::PoseOptimizationFlow2Cam
  (Optimizer.cc:2622-2824) and Optimizer::PoseOptimizationFlow2
  (Optimizer.cc:3037-3253) — identical graph structure, so one kernel
  serves both.  Unknowns: one SE(3) vertex + a 2D optical-flow vertex per
  point (`g2o::VertexSBAFlow`, types_sba.h:78-95).  Per point:
    * binary edge `EdgeSE3ProjectFlow2` (types_six_dof_expmap.h:436-477):
        r1 = (obs_last + flow) - pi(T * Twl * backproj(obs_last, depth_last))
      with information 0.1*I and Huber delta sqrt(0.04);
    * unary prior `EdgeFlowPrior` (types_six_dof_expmap.h:414-433):
        r2 = flow - flow_measured, information 0.3*I, no robust kernel.
  Four rounds of LM with chi2 gates {0.04, 5.991, 5.991, 5.991}
  (chi2 = 0.1*|r1|^2); the pose resets to the init at the start of each
  round while the flow estimates persist; the Huber kernel is dropped
  after round 2 (Optimizer.cc:2747-2795).
- `estimate_camera_pose_joint` ~ Tracking.cc:1133-1135 (init from
  GetInitModelCam, then Flow2Cam).
- `estimate_object_motion_joint` ~ Tracking.cc:1268-1271 (init from
  GetInitModelObj via mInitModel, then Flow2; motion H = Tcw^-1 * X).

The reference solves the (6 + 2N)-dim system with a dense BlockSolverX.
Here the arrow structure is exploited analytically: the flow Jacobian of
its own projection residual is the identity, so every per-point 2x2
Hessian block is a SCALAR multiple of I_2 and the Schur complement onto
the pose is closed-form:

    S   = sum_i  a_i * s_i / (a_i + s_i) * D_i^T D_i          (6x6)
    rhs = sum_i  D_i^T (a_i r1_i - a_i/(a_i+s_i) * b_f_i)
    df_i = -(b_f_i + a_i D_i dxi) / (a_i + s_i)

with a_i = 0.1 * huber_w_i (projection information after robustification),
s_i = 0.3 (prior information), D_i = d r1_i / d xi.  Everything is one
fixed-shape fused program per round — no per-point control flow.

Writeback semantics (Optimizer.cc:2797-2817, 3218-3234): the current
frame's keypoints for inlier points move to `obs_last + flow_opt`.

Note: the reference's `bJoint` flag (Tracking.h:184) is declared but never
assigned — formally uninitialized.  The joint formulation is the paper's
headline contribution, so both paths are provided; `Tracker(joint_flow=...)`
selects.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vido_slam_tpu.estimation.lm import _solve_spd, huber_weight
from vido_slam_tpu.estimation.pose import PoseEstimate, _count_model_inliers
from vido_slam_tpu.estimation.ransac import pnp_ransac
from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.geometry.se3 import compose, exp_se3, inverse_se3

_HI = lax.Precision.HIGHEST

# Reference constants (Optimizer.cc:2624-2625, 2663-2666, 2690-2693, 2745)
RP_THRES_JOINT = 0.04      # round-0 chi2 gate and Huber delta^2
CHI2_LATER = 5.991         # rounds 1-3 gate
SIGMA_PROJ = 0.1           # EdgeSE3ProjectFlow2 information
SIGMA_PRIOR = 0.3          # EdgeFlowPrior information
HUBER_DELTA = 0.2          # sqrt(0.04)
ROUND_ITERS = 10           # LM steps per round (reference: 100; the
#   Schur-GN converges in <10 — the gain early-exit governs either way)
MIN_EDGES = 5              # Optimizer.cc:2794 — below this the solve stops


class FlowJointEstimate(NamedTuple):
    T: jnp.ndarray          # (4, 4) optimized SE(3) vertex
    flow: jnp.ndarray       # (N, 2) optimized per-point flow
    inliers: jnp.ndarray    # (N,) bool, final-round chi2 gate
    num_inliers: jnp.ndarray
    chi2: jnp.ndarray       # (N,) final 0.1*|r1|^2


def _proj_and_jac(T, pts3d, cam: Camera):
    """Projection of T*pts and its (N,2,6) jacobian w.r.t. a left
    perturbation T <- exp(xi) T, xi = [rho, phi] (geometry/se3.exp_se3).

    Closed form: pc(xi) = exp(xi)(T X) ~ pc + rho + phi x pc, so
    d pc/d rho = I, d pc/d phi = -hat(pc); chained with the pinhole
    jacobian [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]. The earlier
    vmapped-jacfwd form emitted ~8 passes of exp_se3/compose ops per LM
    iteration — a measurable slice of the per-frame while-loop time."""
    pc = jnp.einsum("nj,ij->ni", pts3d, T[:3, :3], precision=_HI) + T[:3, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    zr = jnp.zeros_like(z)
    fx, fy = cam.fx, cam.fy
    # rows of Jp @ [I | -hat(pc)]: precompute Jp entries
    a = fx * iz               # du/dx
    c = -fx * x * iz * iz     # du/dz
    e = fy * iz               # dv/dy
    f = -fy * y * iz * iz     # dv/dz
    # d pc/d phi = -hat(pc) = [[0, z, -y], [-z, 0, x], [y, -x, 0]]
    Ju = jnp.stack([a, zr, c, c * y, a * z - c * x, -a * y], axis=-1)
    Jv = jnp.stack([zr, e, f, f * y - e * z, -f * x, e * x], axis=-1)
    J = jnp.stack([Ju, Jv], axis=1)                      # (N, 2, 6)
    proj = jnp.stack([fx * x * iz + cam.cx, fy * y * iz + cam.cy], axis=-1)
    return proj, J, z


def _round_lm(T0, f0, pts3d, obs, flow_meas, active, valid, cam,
              use_huber: bool, iters: int):
    """One reference 'round': LM from (T0, f0) on the `active` edge set.

    The flow priors of ALL valid points stay in the system (the reference
    never levels them out), so deactivated points' flows relax back to the
    measured flow.
    """

    def cost(T, f):
        pc = jnp.einsum("nj,ij->ni", pts3d, T[:3, :3], precision=_HI) + T[:3, 3]
        r1 = obs + f - cam.project(pc)
        c1 = SIGMA_PROJ * jnp.sum(r1 * r1, axis=-1)
        if use_huber:
            d2 = HUBER_DELTA * HUBER_DELTA
            rho = jnp.where(c1 <= d2,
                            c1, 2.0 * HUBER_DELTA * jnp.sqrt(jnp.maximum(c1, 1e-12)) - d2)
        else:
            rho = c1
        r2 = f - flow_meas
        c2 = SIGMA_PRIOR * jnp.sum(r2 * r2, axis=-1)
        guard = pc[:, 2] > 1e-3
        return (jnp.sum(jnp.where(active & guard, rho, 0.0))
                + jnp.sum(jnp.where(valid, c2, 0.0)))

    enough = jnp.sum(active) >= MIN_EDGES

    def body(state):
        T, f, lam, c_prev, i, _ = state
        proj, Jp, z = _proj_and_jac(T, pts3d, cam)
        r1 = obs + f - proj
        D = -Jp                                  # d r1 / d xi, (N, 2, 6)
        chi2 = SIGMA_PROJ * jnp.sum(r1 * r1, axis=-1)
        w = huber_weight(chi2, HUBER_DELTA) if use_huber else jnp.ones_like(chi2)
        a = jnp.where(active & (z > 1e-3), SIGMA_PROJ * w, 0.0)   # (N,)
        s = jnp.where(valid, SIGMA_PRIOR, 0.0)
        v = a + s + 1e-12                        # per-point scalar 2x2 block

        r2 = f - flow_meas
        b_f = a[:, None] * r1 + s[:, None] * r2              # (N, 2)
        DtD = jnp.einsum("nki,nkj->nij", D, D, precision=_HI)  # (N, 6, 6)
        S = jnp.einsum("n,nij->ij", a * s / v, DtD, precision=_HI)
        rhs_vec = a[:, None] * r1 - (a / v)[:, None] * b_f
        rhs = -jnp.einsum("nki,nk->i", D, rhs_vec, precision=_HI)

        diag = jnp.maximum(jnp.diag(S), 1e-6)
        dxi = _solve_spd(S + lam * jnp.diag(diag), rhs)
        df = -(b_f + a[:, None] * jnp.einsum("nij,j->ni", D, dxi,
                                             precision=_HI)) / v[:, None]

        T_new = compose(exp_se3(dxi), T)
        f_new = f + df
        c_new = cost(T_new, f_new)
        ok = (c_new < c_prev) & jnp.all(jnp.isfinite(dxi)) & enough
        T = jnp.where(ok, T_new, T)
        f = jnp.where(ok, f_new, f)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        c = jnp.where(ok, c_new, c_prev)
        converged = ok & (c_prev - c_new < 1e-8 * jnp.maximum(c_prev, 1.0))
        return T, f, lam, c, i + 1, converged

    def cond(state):
        _, _, lam, _, i, converged = state
        return (i < iters) & ~converged & (lam < 1e6)

    c0 = cost(T0, f0)
    T, f, _, _, _, _ = lax.while_loop(
        cond, body, (T0, f0, jnp.float32(1e-3), c0, jnp.int32(0), False)
    )
    return T, f


@partial(jax.jit, static_argnames=("iters", "use_pallas"))
def flow_joint_optimization(
    T_init: jnp.ndarray,       # (4, 4) SE(3) vertex init
    pts3d_world: jnp.ndarray,  # (N, 3) fixed world points (last frame)
    obs_last: jnp.ndarray,     # (N, 2) last-frame keypoints
    flow_meas: jnp.ndarray,    # (N, 2) measured flow last -> cur
    valid: jnp.ndarray,        # (N,) base correspondence set
    cam: Camera,
    iters: int = ROUND_ITERS,
    use_pallas: bool = False,
) -> FlowJointEstimate:
    """Four-round robust joint solve, Optimizer.cc:2742-2795 semantics.

    With use_pallas=True the whole 4-round solve runs as ONE fused Pallas
    TPU kernel (estimation/flow_joint_pallas.py) instead of 4 while_loops
    of ~40 dispatched ops each — same semantics, parity-tested."""
    valid = valid.astype(bool)
    if use_pallas:
        from vido_slam_tpu.estimation.flow_joint_pallas import (
            flow_joint_batched_pallas)

        jb = flow_joint_batched_pallas(
            T_init[None], pts3d_world[None], obs_last[None],
            flow_meas[None], valid[None], cam, iters=iters)
        return FlowJointEstimate(
            T=jb.T[0], flow=jb.flow[0], inliers=jb.inliers[0],
            num_inliers=jb.num_inliers[0], chi2=jb.chi2[0])
    f = jnp.where(valid[:, None], flow_meas, 0.0)
    active = valid
    T = T_init
    for rnd in range(4):
        # pose resets to the init each round; flows persist (Optimizer.cc:2746)
        T, f = _round_lm(T_init, f, pts3d_world, obs_last, flow_meas,
                         active, valid, cam,
                         use_huber=(rnd < 3), iters=iters)
        pc = jnp.einsum("nj,ij->ni", pts3d_world, T[:3, :3],
                        precision=_HI) + T[:3, 3]
        r1 = obs_last + f - cam.project(pc)
        chi2 = SIGMA_PROJ * jnp.sum(r1 * r1, axis=-1)
        thr = RP_THRES_JOINT if rnd == 0 else CHI2_LATER
        active = valid & (chi2 <= thr) & (pc[:, 2] > 1e-3)
    return FlowJointEstimate(
        T=T, flow=f, inliers=active, num_inliers=jnp.sum(active), chi2=chi2
    )


@partial(jax.jit, static_argnames=("num_hypotheses", "use_pallas"))
def estimate_camera_pose_joint(
    key: jnp.ndarray,
    pts3d_world: jnp.ndarray,
    obs_last: jnp.ndarray,       # (N, 2) LAST-frame keypoints
    cur_uv: jnp.ndarray,         # (N, 2) flow-propagated current positions
    valid: jnp.ndarray,
    cam: Camera,
    T_motion_model: jnp.ndarray,
    obs_pc: jnp.ndarray = None,  # (N, 3) current camera-frame backprojections
    num_hypotheses: int = 500,
    use_pallas: bool = False,
):
    """GetInitModelCam + PoseOptimizationFlow2Cam (Tracking.cc:1125-1135).

    Returns (PoseEstimate, flow_opt): the caller moves inlier keypoints to
    obs_last + flow_opt (the reference's updateflow writeback).
    """
    rr = pnp_ransac(key, pts3d_world, cur_uv, valid, cam, obs_pc,
                    num_hypotheses=num_hypotheses)
    mm_ok, mm_count = _count_model_inliers(
        T_motion_model, pts3d_world, cur_uv, valid, cam)
    use_ransac = rr.num_inliers > mm_count
    T_init = jnp.where(use_ransac, rr.T, T_motion_model)
    init_inl = jnp.where(use_ransac, rr.inliers, mm_ok)
    je = flow_joint_optimization(
        T_init, pts3d_world, obs_last, cur_uv - obs_last, init_inl, cam,
        use_pallas=use_pallas)
    est = PoseEstimate(T=je.T, inliers=je.inliers,
                       num_inliers=je.num_inliers, chi2=je.chi2)
    return est, je.flow


@partial(jax.jit, static_argnames=("num_hypotheses",))
def estimate_object_motion_joint(
    key: jnp.ndarray,
    Tcw: jnp.ndarray,
    pts3d_world: jnp.ndarray,
    obs_last: jnp.ndarray,
    cur_uv: jnp.ndarray,
    valid: jnp.ndarray,
    cam: Camera,
    H_motion_model: jnp.ndarray,
    has_motion_model: jnp.ndarray,
    obs_pc: jnp.ndarray = None,
    num_hypotheses: int = 500,
):
    """GetInitModelObj + PoseOptimizationFlow2 (Tracking.cc:1213,1268-1271).

    The joint vertex is X = Tcw * H (world -> current camera for object
    points); the returned estimate carries H = Tcw^-1 * X.
    """
    rr = pnp_ransac(key, pts3d_world, cur_uv, valid, cam, obs_pc,
                    num_hypotheses=num_hypotheses)
    M_mm = compose(Tcw, H_motion_model)
    mm_ok, mm_count = _count_model_inliers(M_mm, pts3d_world, cur_uv, valid, cam)
    mm_count = jnp.where(has_motion_model, mm_count, -1)
    use_ransac = rr.num_inliers > mm_count
    M_init = jnp.where(use_ransac, rr.T, M_mm)
    init_inl = jnp.where(use_ransac, rr.inliers, mm_ok)
    je = flow_joint_optimization(
        M_init, pts3d_world, obs_last, cur_uv - obs_last, init_inl, cam)
    H = compose(inverse_se3(Tcw), je.T)
    est = PoseEstimate(T=H, inliers=je.inliers,
                       num_inliers=je.num_inliers, chi2=je.chi2)
    return est, je.flow


@partial(jax.jit, static_argnames=("num_hypotheses", "use_pallas"))
def estimate_object_motions_joint_batched(
    keys: jnp.ndarray,            # (K, 2) PRNG keys
    Tcw: jnp.ndarray,             # (4, 4) current camera pose
    pts3d_world: jnp.ndarray,     # (N, 3) last-frame object points (shared)
    obs_last: jnp.ndarray,        # (N, 2)
    cur_uv: jnp.ndarray,          # (N, 2)
    masks: jnp.ndarray,           # (K, N) per-object point sets
    cam: Camera,
    H_motion_model: jnp.ndarray,  # (K, 4, 4)
    has_motion_model: jnp.ndarray,  # (K,)
    obs_pc: jnp.ndarray = None,
    num_hypotheses: int = 500,
    use_pallas: bool = False,
):
    """All K per-frame object motions in one batch: the RANSAC-vs-motion-
    model initialization is vmapped XLA; the 4-round joint LM runs as one
    K-problem fused Pallas kernel when use_pallas (one grid step per
    object) or as the vmapped XLA solver otherwise. Semantically identical
    to vmap(estimate_object_motion_joint).

    Returns (H (K, 4, 4), inliers (K, N), num_inliers (K,), flow (K, N, 2)).
    """

    def init_one(kk, msk, Hm, hm):
        rr = pnp_ransac(kk, pts3d_world, cur_uv, msk, cam, obs_pc,
                        num_hypotheses=num_hypotheses)
        M_mm = compose(Tcw, Hm)
        mm_ok, mm_count = _count_model_inliers(M_mm, pts3d_world, cur_uv,
                                               msk, cam)
        mm_count = jnp.where(hm, mm_count, -1)
        use_ransac = rr.num_inliers > mm_count
        return (jnp.where(use_ransac, rr.T, M_mm),
                jnp.where(use_ransac, rr.inliers, mm_ok))

    M_init, init_inl = jax.vmap(init_one)(keys, masks, H_motion_model,
                                          has_motion_model)
    flow_meas = cur_uv - obs_last
    if use_pallas:
        from vido_slam_tpu.estimation.flow_joint_pallas import (
            flow_joint_batched_pallas)

        jb = flow_joint_batched_pallas(M_init, pts3d_world, obs_last,
                                       flow_meas, init_inl, cam)
        M, inl, n_inl, fl = jb.T, jb.inliers, jb.num_inliers, jb.flow
    else:
        je = jax.vmap(
            lambda M0, ii: flow_joint_optimization(
                M0, pts3d_world, obs_last, flow_meas, ii, cam)
        )(M_init, init_inl)
        M, inl, n_inl, fl = je.T, je.inliers, je.num_inliers, je.flow
    H = jax.vmap(lambda Mi: compose(inverse_se3(Tcw), Mi))(M)
    return H, inl, n_inl, fl
