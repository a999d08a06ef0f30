"""Batched PnP RANSAC, pure JAX — the TPU replacement for cv::solvePnPRansac.

The reference initializes camera/object motion with OpenCV P3P RANSAC, 500
iterations, 0.4 px reprojection threshold (Tracking.cc:1965-1968 /
GetInitModelObj). RANSAC is embarrassingly parallel: here all hypotheses are
generated and scored at once with `vmap` — one fused XLA program instead of a
sequential loop.

Minimal solver: the pipeline is RGB-D (depth for every feature in both
frames), so the hypothesis generator is 4-point Kabsch/Umeyama 3D-3D
alignment (Horn's quaternion form, batched) that stays well-posed for
COPLANAR points (road scenes are dominated by the ground plane, which makes
projective minimal solvers like DLT degenerate; the reference's P3P
tolerates coplanarity for the same reason). Hypotheses are scored by 2D
reprojection error exactly like the reference (0.4 px). Degenerate samples
simply score few inliers and lose the argmax; no data-dependent control
flow. A 6-point DLT (`_dlt_pose`) is kept for depth-less callers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.geometry.se3 import make_se3

_HI = lax.Precision.HIGHEST


class RansacResult(NamedTuple):
    T: jnp.ndarray          # (4, 4) best pose hypothesis, world->camera
    inliers: jnp.ndarray    # (N,) bool inlier mask under the best hypothesis
    num_inliers: jnp.ndarray  # scalar int


def _dlt_pose(X: jnp.ndarray, x_norm: jnp.ndarray) -> jnp.ndarray:
    """6+ point DLT: 3D points (S, 3) + normalized image coords (S, 2)
    -> (4, 4) pose [R|t] (world->camera). Batched via vmap outside."""
    # condition the 3D points
    mu = jnp.mean(X, axis=0)
    scale = jnp.mean(jnp.linalg.norm(X - mu, axis=-1)) + 1e-12
    Xc = (X - mu) / scale

    S = X.shape[0]
    ones = jnp.ones((S, 1), dtype=X.dtype)
    Xh = jnp.concatenate([Xc, ones], axis=-1)  # (S, 4)
    u = x_norm[:, 0:1]
    v = x_norm[:, 1:2]
    zeros = jnp.zeros_like(Xh)
    # rows: [Xh, 0, -u*Xh] and [0, Xh, -v*Xh]
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # (S, 12)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2S, 12)
    AtA = jnp.einsum("ni,nj->ij", A, A, precision=_HI)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]  # smallest eigenvalue eigenvector
    P = p.reshape(3, 4)

    # cheirality: depths of the sample points should be positive
    z = Xh @ P[2]
    sign = jnp.where(jnp.sum(jnp.sign(z)) < 0, -1.0, 1.0)
    P = P * sign

    # extract R (Procrustes) and scale
    M = P[:, :3]
    U, s, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision=_HI))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=X.dtype)).at[2, 2].set(det)
    R = jnp.matmul(jnp.matmul(U, D, precision=_HI), Vt, precision=_HI)
    sc = jnp.mean(s) + 1e-12
    t = P[:, 3] / sc

    # undo conditioning: x ~ R (X-mu)/scale + t  =>  t_final = scale*t - R mu
    t_final = scale * t - R @ mu
    return make_se3(R, t_final)


def _quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _kabsch_pose(Xw: jnp.ndarray, Xc: jnp.ndarray) -> jnp.ndarray:
    """4+ point 3D-3D alignment: world points (S, 3) + camera-frame points
    (S, 3) -> (4, 4) T with Xc = R Xw + t.

    Horn's quaternion formulation instead of the classic SVD: the optimal
    rotation is the dominant eigenvector of a 4x4 symmetric matrix built
    from the cross-covariance, found here by shifted power iteration — pure
    batched arithmetic (vmaps into (H, 4, 4) matvecs) instead of thousands
    of tiny LAPACK SVDs, which lower terribly on TPU. Always yields a proper
    rotation; degenerate samples just lose the RANSAC argmax."""
    cw = jnp.mean(Xw, axis=0)
    cc = jnp.mean(Xc, axis=0)
    M = jnp.einsum("ni,nj->ij", Xw - cw, Xc - cc, precision=_HI)
    tr = jnp.trace(M)
    A = M - M.T
    d = jnp.array([A[1, 2], A[2, 0], A[0, 1]])
    K = jnp.zeros((4, 4))
    K = K.at[0, 0].set(tr)
    K = K.at[0, 1:].set(d)
    K = K.at[1:, 0].set(d)
    K = K.at[1:, 1:].set(M + M.T - tr * jnp.eye(3))
    # shift so the dominant eigenvalue of (K + shift I) is the max one
    shift = jnp.sqrt(jnp.sum(K * K)) + 1e-6
    Ks = K + shift * jnp.eye(4)
    q = jnp.array([1.0, 0.01, 0.01, 0.01])  # deterministic start

    # UNROLLED power iteration: 40 trips of a 4x4 matvec in a fori_loop is
    # pure loop-dispatch overhead on TPU (profiled ~1.8 ms/frame across the
    # two RANSAC call sites); unrolled, XLA fuses the whole chain into the
    # surrounding hypothesis vmap. Normalisation every 4 steps is enough to
    # prevent overflow (|Ks| is normalised by the shift).
    for i in range(40):
        q = Ks @ q
        if i % 4 == 3:
            q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    R = _quat_to_rot(q)  # Xc ~ R Xw (Horn's q maps w->c with this K)
    t = cc - R @ cw
    return make_se3(R, t)


def _score(T: jnp.ndarray, X: jnp.ndarray, obs_uv: jnp.ndarray, cam: Camera,
           valid: jnp.ndarray, thresh: float):
    R = T[:3, :3]
    t = T[:3, 3]
    pc = jnp.einsum("ij,nj->ni", R, X, precision=_HI) + t
    uv = cam.project(pc)
    err = jnp.linalg.norm(uv - obs_uv, axis=-1)
    ok = (err < thresh) & valid & (pc[:, 2] > 0)
    return ok, jnp.sum(ok)


def _score_counts_all(Ts: jnp.ndarray, X: jnp.ndarray, obs_uv: jnp.ndarray,
                      cam: Camera, valid: jnp.ndarray, thresh: float):
    """Inlier counts for ALL hypotheses as ONE (N, 4) @ (4, 3H) matmul.

    vmapping `_score` over H hypotheses materialised an (H, N, 3) camera-
    point tensor plus same-sized projections (~190 MB per RANSAC at
    H=500, N=4000, K=8 objects) — pure HBM traffic. The matmul form keeps
    the largest intermediate at (N, 3H) and lets the MXU do the transform;
    rows of P are component-major so the x/y/z slices are contiguous."""
    H = Ts.shape[0]
    # (3H, 4): rows [x-rows of all H | y-rows | z-rows]
    P = jnp.concatenate([Ts[:, 0, :], Ts[:, 1, :], Ts[:, 2, :]], axis=0)
    Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=-1)   # (N, 4)
    PC = jnp.einsum("nk,hk->nh", Xh, P, precision=_HI)            # (N, 3H)
    xs, ys, zs = PC[:, :H], PC[:, H:2 * H], PC[:, 2 * H:]
    # z guard mirrors Camera.project (eps=1e-6, sign dropped) so counts are
    # bit-identical to the vmapped _score path
    iz = 1.0 / jnp.where(jnp.abs(zs) < 1e-6, 1e-6, zs)
    du = cam.fx * xs * iz + cam.cx - obs_uv[:, :1]
    dv = cam.fy * ys * iz + cam.cy - obs_uv[:, 1:2]
    ok = (du * du + dv * dv < thresh * thresh) \
        & valid[:, None] & (zs > 0)
    return jnp.sum(ok, axis=0)                                    # (H,)


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size"))
def pnp_ransac(
    key: jnp.ndarray,
    pts3d: jnp.ndarray,     # (N, 3) world points (last-frame unprojections)
    obs_uv: jnp.ndarray,    # (N, 2) current-frame pixels
    valid: jnp.ndarray,     # (N,) bool
    cam: Camera,
    obs_pc: Optional[jnp.ndarray] = None,  # (N, 3) current camera-frame pts
    *,
    num_hypotheses: int = 500,
    sample_size: int = 4,
    threshold: float = 0.4,  # px, Tracking.cc:1966
) -> RansacResult:
    """All-parallel RANSAC: returns best pose + inlier mask.

    With `obs_pc` (RGB-D: current-frame backprojections) hypotheses come
    from the coplanar-safe Kabsch solver; without it, 6-point DLT.

    Sampling is a single multi-operand `lax.sort`: a random key per point
    (invalid points pushed to the end) sorts the POINT DATA ITSELF, and the
    hypotheses take consecutive static slices of the shuffled array. This
    replaces `jax.random.choice` + row gather, which profiled at ~3 ms/frame
    on TPU (the weighted-choice searchsorted lowers to a while loop and the
    16k-row gather to a serial custom fusion). Statistically this draws the
    hypotheses' samples without replacement ACROSS hypotheses — for N in the
    thousands and sample size 4 the clean-sample probability per hypothesis
    is the same as iid sampling to within O(S/N)."""
    N = pts3d.shape[0]
    S = max(sample_size, 6 if obs_pc is None else sample_size)
    assert N >= S, "need at least one sample's worth of points"
    need = num_hypotheses * S
    # When more samples are needed than points exist (small object patches),
    # sort `reps` independently-shuffled copies in ONE lax.sort call: the
    # composite key (tile_id*100 + r) keeps tiles contiguous while each tile
    # gets its own permutation, so wrapped hypotheses still draw distinct
    # sample sets.
    reps = -(-need // N)
    tile = (lambda a: jnp.tile(a, reps)) if reps > 1 else (lambda a: a)
    r = jax.random.uniform(key, (reps * N,))
    vbig = tile(valid)
    sort_key = jnp.where(vbig, r, r + 10.0)  # invalid points sink (per tile)
    if reps > 1:
        sort_key = sort_key + 100.0 * jnp.repeat(
            jnp.arange(reps, dtype=sort_key.dtype), N)
    pc = obs_pc if obs_pc is not None else jnp.zeros_like(pts3d)
    ops = (sort_key, vbig.astype(jnp.int32),
           tile(pts3d[:, 0]), tile(pts3d[:, 1]), tile(pts3d[:, 2]),
           tile(pc[:, 0]), tile(pc[:, 1]), tile(pc[:, 2]),
           tile(obs_uv[:, 0]), tile(obs_uv[:, 1]))
    sorted_ops = jax.lax.sort(ops, num_keys=1)

    def take(a):
        return a[:need].reshape(num_hypotheses, S)
    v_s = take(sorted_ops[1]) > 0
    Xw_s = jnp.stack([take(sorted_ops[2]), take(sorted_ops[3]),
                      take(sorted_ops[4])], axis=-1)
    sample_ok = jnp.all(v_s, axis=1)

    if obs_pc is not None:
        Xc_s = jnp.stack([take(sorted_ops[5]), take(sorted_ops[6]),
                          take(sorted_ops[7])], axis=-1)
        Ts = jax.vmap(_kabsch_pose)(Xw_s, Xc_s)
    else:
        u_s = (take(sorted_ops[8]) - cam.cx) / cam.fx
        v_uv = (take(sorted_ops[9]) - cam.cy) / cam.fy
        Ts = jax.vmap(_dlt_pose)(Xw_s, jnp.stack([u_s, v_uv], axis=-1))
    counts = _score_counts_all(Ts, pts3d, obs_uv, cam, valid, threshold)
    counts = jnp.where(sample_ok, counts, -1)
    best = jnp.argmax(counts)
    good = counts[best] >= 0
    # inlier mask only for the winner (one more cheap scoring pass) — the
    # (H, N) mask for every hypothesis is never needed
    ok_best, _ = _score(Ts[best], pts3d, obs_uv, cam, valid, threshold)
    return RansacResult(T=jnp.where(good, Ts[best], jnp.eye(4)),
                        inliers=ok_best & good,
                        num_inliers=jnp.maximum(counts[best], 0))
