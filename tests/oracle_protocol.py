"""Independent end-to-end PROTOCOL oracle (VERDICT r3 item 3).

A plain-numpy float64 re-expression of the reference's per-frame tracked
protocol — inherit correspondences -> camera pose RANSAC-vs-motion-model +
LM -> scene flow -> object selection -> object motion RANSAC + LM ->
renewal — following the stage semantics of Tracking.cc:283-782,1081-1509
directly, with NO shared code with `vido_slam_tpu` (no JAX, no imports from
the package's estimation/frontend modules). It exists so the fused device
program has an oracle that cannot inherit its bugs: trajectories and object
motions from the two implementations are compared in
tests/test_protocol_oracle.py.

Documented deviations from the reference (shared with the system, SURVEY
section 7): no g2o — LM is a dense normal-equations solve; the RANSAC
minimal solver is a 4-point Gauss-Newton refine instead of P3P (the
protocol decision — "more 0.4 px inliers wins vs the motion model",
Tracking.cc:1965-2027 — is preserved); features sample a deterministic
grid instead of cv::RNG. The oracle does NOT run window BA: the per-frame
protocol alone must land within the ATE tolerance. The camera-pose solve
runs 4 optimize/re-classify stages with a fixed chi2<=0.01 inlier gate;
the reference's PoseOptimizationNew declares the 4-stage chi2 schedule
but its loop is `for(it=0; it<1; it++)` (Optimizer.cc:2268-2320) so only
ONE stage with chi2Mono[0]=rp_thres ever executes — the extra stages are
a (benign) strengthening kept for oracle robustness, not reference parity.

Reference constants used (same citations as the system):
  RANSAC reproj 0.4 px, 500 hypotheses       Tracking.cc:1965-1968
  final inlier chi2 <= 0.01 px^2             Optimizer.cc:2270
  Huber delta sqrt(0.01) (camera only)       Optimizer.cc:2214
  min object points 150                      Tracking.cc:1790
  min object inliers 50                      Tracking.cc:1218
  scene-flow thresholds SFMgThres/SFDsThres  kaist/kitti config
  dense object sampling step 4               Frame.cc:184
  speed = |t - (I-R) c| * 3.6 * fps          Tracking.cc:1295-1302
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- SE(3) f64


def hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]],
                    np.float64)


def exp_so3(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3) + hat(w)
    K = hat(w / th)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def exp_se3(xi):
    """xi = [rho, phi] -> 4x4 (first-order coupling is enough for the tiny
    GN/LM steps this oracle takes; the retract only has to be a retraction)."""
    T = np.eye(4)
    R = exp_so3(xi[3:6])
    T[:3, :3] = R
    th = np.linalg.norm(xi[3:6])
    if th < 1e-12:
        V = np.eye(3)
    else:
        K = hat(xi[3:6] / th)
        V = (np.eye(3) + (1 - np.cos(th)) / th * K
             + (th - np.sin(th)) / th * (K @ K))
    T[:3, 3] = V @ xi[:3]
    return T


# ------------------------------------------------------------ camera model


class Pinhole:
    def __init__(self, fx, fy, cx, cy, width, height, fps=10.0):
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.width, self.height = width, height
        self.fps = fps

    def project(self, pc):
        """(N, 3) camera-frame -> (N, 2) pixels (z clamped away from 0)."""
        z = np.where(np.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        return np.stack([self.fx * pc[:, 0] / z + self.cx,
                         self.fy * pc[:, 1] / z + self.cy], axis=1)

    def unproject(self, uv, depth):
        x = (uv[:, 0] - self.cx) / self.fx * depth
        y = (uv[:, 1] - self.cy) / self.fy * depth
        return np.stack([x, y, depth], axis=1)


def to_world(Tcw, pc):
    Twc = np.linalg.inv(Tcw)
    return pc @ Twc[:3, :3].T + Twc[:3, 3]


def to_cam(Tcw, pw):
    return pw @ Tcw[:3, :3].T + Tcw[:3, 3]


def bilinear(img, uv):
    """Sample (H, W) or (H, W, C) at float pixel positions (N, 2)."""
    H, W = img.shape[:2]
    u = np.clip(uv[:, 0], 0.0, W - 1.001)
    v = np.clip(uv[:, 1], 0.0, H - 1.001)
    u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
    du, dv = u - u0, v - v0
    if img.ndim == 2:
        a = img[v0, u0] * (1 - du) + img[v0, u0 + 1] * du
        b = img[v0 + 1, u0] * (1 - du) + img[v0 + 1, u0 + 1] * du
        return a * (1 - dv) + b * dv
    a = img[v0, u0] * (1 - du)[:, None] + img[v0, u0 + 1] * du[:, None]
    b = (img[v0 + 1, u0] * (1 - du)[:, None]
         + img[v0 + 1, u0 + 1] * du[:, None])
    return a * (1 - dv)[:, None] + b * dv[:, None]


def nearest(img, uv):
    H, W = img.shape[:2]
    u = np.clip(np.rint(uv[:, 0]).astype(int), 0, W - 1)
    v = np.clip(np.rint(uv[:, 1]).astype(int), 0, H - 1)
    return img[v, u]


# ---------------------------------------------------- batched GN / LM (f64)


def _proj_jac(cam, pc):
    """(..., N, 3) -> (..., N, 2, 3) projection Jacobian."""
    z = np.where(np.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    iz = 1.0 / z
    J = np.zeros(pc.shape[:-1] + (2, 3))
    J[..., 0, 0] = cam.fx * iz
    J[..., 0, 2] = -cam.fx * pc[..., 0] * iz * iz
    J[..., 1, 1] = cam.fy * iz
    J[..., 1, 2] = -cam.fy * pc[..., 1] * iz * iz
    return J


def lm_pose(cam, Xw, obs, w, T0, iters=10, huber=None, obj_motion=None):
    """LM on the camera pose Tcw (obj_motion None) or on a world-frame
    object motion H with fixed Tcw=obj_motion (EdgeSE3ProjectXYZOnlyPose /
    ...OnlyObjMotion residual semantics, Optimizer.cc:2180/2826).

    Xw (N, 3) world points, obs (N, 2) pixels, w (N,) 0/1 weights.
    Returns (T_opt, chi2 (N,) final squared reprojection error).

    Step acceptance follows g2o's Levenberg policy
    (optimization_algorithm_levenberg.cpp): a trial step is only committed
    when the robust cost does not increase; a rejected step keeps the
    current pose and retries with 10x damping."""

    def trial_cost(T_try):
        pc_t = (to_cam(T_try, Xw) if obj_motion is None
                else to_cam(obj_motion, Xw @ T_try[:3, :3].T + T_try[:3, 3]))
        r_t = obs - cam.project(pc_t)
        chi2_t = np.sum(r_t * r_t, axis=1)
        ww_t = w.astype(np.float64)
        if huber is not None:
            nrm_t = np.sqrt(np.maximum(chi2_t, 1e-18))
            ww_t = ww_t * np.minimum(1.0, huber / nrm_t)
        return float(np.sum(ww_t * chi2_t))

    T = T0.copy()
    lam = 1e-6
    for _ in range(iters):
        if obj_motion is None:
            pc = to_cam(T, Xw)
            body = [np.eye(3)[None].repeat(len(Xw), 0), -hat_batch(pc)]
            Jg = np.concatenate(body, axis=2)           # (N, 3, 6) d pc/d xi
        else:
            Tcw = obj_motion
            q = Xw @ T[:3, :3].T + T[:3, 3]             # H Xw
            pc = q @ Tcw[:3, :3].T + Tcw[:3, 3]
            Jq = np.concatenate(
                [np.eye(3)[None].repeat(len(Xw), 0), -hat_batch(q)], axis=2)
            Jg = np.einsum("ij,njk->nik", Tcw[:3, :3], Jq)
        r = obs - cam.project(pc)                        # (N, 2)
        Jp = _proj_jac(cam, pc)                          # (N, 2, 3)
        J = -np.einsum("nij,njk->nik", Jp, Jg)           # (N, 2, 6)
        chi2 = np.sum(r * r, axis=1)
        ww = w.astype(np.float64)
        if huber is not None:
            # IRLS Huber on the residual norm (robust_kernel_impl.h)
            nrm = np.sqrt(np.maximum(chi2, 1e-18))
            ww = ww * np.minimum(1.0, huber / nrm)
        cost = float(np.sum(ww * chi2))
        H6 = np.einsum("nij,n,nik->jk", J, ww, J)
        g = np.einsum("nij,n,ni->j", J, ww, r)
        try:
            delta = np.linalg.solve(H6 + lam * np.eye(6), -g)
        except np.linalg.LinAlgError:
            break
        T_new = exp_se3(delta) @ T
        if trial_cost(T_new) <= cost * (1 + 1e-12):
            T = T_new                      # accept: commit + relax damping
            lam = max(lam * 0.5, 1e-9)
            if np.linalg.norm(delta) < 1e-12:
                break
        else:
            lam *= 10.0                    # reject: keep T, more damping
    pc = (to_cam(T, Xw) if obj_motion is None
          else to_cam(obj_motion, Xw @ T[:3, :3].T + T[:3, 3]))
    r = obs - cam.project(pc)
    return T, np.sum(r * r, axis=1)


def hat_batch(p):
    N = p.shape[0]
    out = np.zeros((N, 3, 3))
    out[:, 0, 1] = -p[:, 2]; out[:, 0, 2] = p[:, 1]
    out[:, 1, 0] = p[:, 2];  out[:, 1, 2] = -p[:, 0]
    out[:, 2, 0] = -p[:, 1]; out[:, 2, 1] = p[:, 0]
    return out


def count_inliers(cam, T, Xw, obs, valid, thresh=0.4, obj_motion=None):
    pc = (to_cam(T, Xw) if obj_motion is None
          else to_cam(obj_motion, Xw @ T[:3, :3].T + T[:3, 3]))
    r = obs - cam.project(pc)
    ok = (np.linalg.norm(r, axis=1) < thresh) & valid & (pc[:, 2] > 0)
    return ok


def ransac_vs_model(cam, Xw, obs, valid, T_model, has_model, rng,
                    n_hyp=500, iters_per_hyp=8, obj_motion=None):
    """GetInitModelCam/Obj (Tracking.cc:1914-2162): n_hyp minimal 4-point
    hypotheses each GN-refined, best by 0.4 px inlier count, compared
    against the motion-model hypothesis; more inliers wins."""
    idx = np.nonzero(valid)[0]
    T_seed = T_model if has_model else np.eye(4)
    best_T, best_n = T_seed, -1
    if len(idx) >= 4:
        sets = rng.choice(idx, size=(n_hyp, 4), replace=True)
        w4 = np.ones(4)
        for s in sets:
            T_h, _ = lm_pose(cam, Xw[s], obs[s], w4, T_seed,
                             iters=iters_per_hyp, obj_motion=obj_motion)
            n = int(count_inliers(cam, T_h, Xw, obs, valid,
                                  obj_motion=obj_motion).sum())
            if n > best_n:
                best_T, best_n = T_h, n
    if has_model:
        n_model = int(count_inliers(cam, T_model, Xw, obs, valid,
                                    obj_motion=obj_motion).sum())
        if n_model >= best_n:
            return T_model, n_model
    return best_T, best_n


# --------------------------------------------------------------- the oracle


class OracleConfig:
    def __init__(self, th_depth_bg=80.0, th_depth_obj=60.0, n_bg=1200,
                 sf_mg=0.12, sf_ds=0.3, min_obj_points=150,
                 min_obj_inliers=50, obj_step=4, grid=20, n_hyp=500,
                 boundary_px=20, boundary_frac=0.5, seed=0):
        self.th_depth_bg = th_depth_bg
        self.th_depth_obj = th_depth_obj
        self.n_bg = n_bg
        self.sf_mg = sf_mg
        self.sf_ds = sf_ds
        self.min_obj_points = min_obj_points
        self.min_obj_inliers = min_obj_inliers
        self.obj_step = obj_step
        self.grid = grid
        self.n_hyp = n_hyp
        self.boundary_px = boundary_px
        self.boundary_frac = boundary_frac
        self.seed = seed


class OracleResult:
    def __init__(self):
        self.Tcw = []            # per frame (4, 4)
        self.objects = []        # per frame: dict sem -> dict(H, speed, n_inl, centroid)


def sample_bg_grid(cfg, cam, depth, mask, rng, n, exclude_uv=None):
    """Grid-random static sampling (SampleKeyPoints, Frame.cc:888-958):
    grid x grid cells, random candidates per cell gated by mask==0 and
    0 < depth < ThDepthBG, up to n total; min-dist-1px dedup vs exclude."""
    H, W = depth.shape
    gs_y, gs_x = H // cfg.grid, W // cfg.grid
    pts = []
    for gy in range(cfg.grid):
        for gx in range(cfg.grid):
            for _ in range(max(n // (cfg.grid * cfg.grid), 1) + 2):
                u = gx * gs_x + rng.randint(0, max(gs_x, 1))
                v = gy * gs_y + rng.randint(0, max(gs_y, 1))
                if u >= W or v >= H:
                    continue
                d = depth[v, u]
                if mask[v, u] == 0 and 0 < d < cfg.th_depth_bg:
                    pts.append((u, v))
    pts = np.asarray(pts, np.float64).reshape(-1, 2)
    if exclude_uv is not None and len(exclude_uv) and len(pts):
        d2 = np.min(np.sum(
            (pts[:, None] - exclude_uv[None]) ** 2, axis=2), axis=1)
        pts = pts[d2 >= 1.0]
    if len(pts) > n:
        pts = pts[rng.choice(len(pts), n, replace=False)]
    return pts


def sample_obj_dense(cfg, depth, mask):
    """Every obj_step-th pixel where mask != 0 and depth valid
    (Frame.cc:184-211)."""
    H, W = depth.shape
    vv, uu = np.mgrid[0:H:cfg.obj_step, 0:W:cfg.obj_step]
    uu, vv = uu.ravel(), vv.ravel()
    sel = (mask[vv, uu] != 0) & (depth[vv, uu] > 0) \
        & (depth[vv, uu] < cfg.th_depth_obj)
    return (np.stack([uu[sel], vv[sel]], 1).astype(np.float64),
            mask[vv, uu][sel].astype(int))


def run_oracle(cam, frames, cfg=None, verbose=False):
    """frames: sequence with .depth (H, W), .flow (H, W, 2) to the NEXT
    frame, .mask (H, W) int — the offline precomputed-perception inputs.
    Returns OracleResult with one Tcw per frame and per-frame object
    motions."""
    cfg = cfg or OracleConfig()
    rng = np.random.RandomState(cfg.seed)
    res = OracleResult()

    # ---- Initialization (Tracking.cc:1512-1580): pose = I, backproject
    f0 = frames[0]
    depth = np.asarray(f0.depth, np.float64)
    mask = np.asarray(f0.mask)
    Tcw = np.eye(4)
    bg_uv = sample_bg_grid(cfg, cam, depth, mask, rng, cfg.n_bg)
    bg_Xw = to_world(Tcw, cam.unproject(bg_uv, nearest(depth, bg_uv)))
    obj_uv, obj_sem = sample_obj_dense(cfg, depth, mask)
    obj_Xw = to_world(Tcw, cam.unproject(obj_uv, nearest(depth, obj_uv)))
    prev_flow = np.asarray(f0.flow, np.float64)
    velocity = None
    bin_motion = {}      # sem value -> last frame's world-frame motion
    res.Tcw.append(Tcw.copy())
    res.objects.append({})

    H_img, W_img = depth.shape
    for t in range(1, len(frames)):
        fr = frames[t]
        depth = np.asarray(fr.depth, np.float64)
        mask = np.asarray(fr.mask)

        # ---- 1. inherit correspondences (Tracking.cc:369-430)
        cur_bg = bg_uv + bilinear(prev_flow, bg_uv)
        inb = ((cur_bg[:, 0] >= 1) & (cur_bg[:, 0] < W_img - 1)
               & (cur_bg[:, 1] >= 1) & (cur_bg[:, 1] < H_img - 1))
        sem_at = nearest(mask, cur_bg)
        d_at = nearest(depth, cur_bg)
        bg_valid = inb & (sem_at == 0) & (d_at > 0) & (d_at < cfg.th_depth_bg)

        # ---- 2. camera pose: RANSAC vs motion model + LM
        # (GetInitModelCam :1914-2027; PoseOptimizationNew Optimizer.cc:2180)
        T_model = (velocity @ Tcw) if velocity is not None else np.eye(4)
        T0, _ = ransac_vs_model(cam, bg_Xw, cur_bg, bg_valid, T_model,
                                velocity is not None, rng, n_hyp=cfg.n_hyp)
        w = count_inliers(cam, T0, bg_Xw, cur_bg, bg_valid).astype(float)
        # 4 optimize/re-classify stages with a fixed 0.01 gate — a
        # documented deviation (see module docstring): the reference's
        # loop at Optimizer.cc:2268-2320 executes only one stage.
        T_new = T0
        for _stage in range(4):
            T_new, chi2 = lm_pose(cam, bg_Xw, cur_bg, w, T_new, iters=10,
                                  huber=0.1)
            w = ((chi2 <= 0.01) & bg_valid).astype(float)
        Tcw_new = T_new
        velocity = Tcw_new @ np.linalg.inv(Tcw)   # mVelocity (:1143-1149)

        # ---- 3. scene flow of object points (GetSceneFlowObj :1582-1668)
        cur_obj = obj_uv + bilinear(prev_flow, obj_uv)
        oinb = ((cur_obj[:, 0] >= 1) & (cur_obj[:, 0] < W_img - 1)
                & (cur_obj[:, 1] >= 1) & (cur_obj[:, 1] < H_img - 1))
        od = nearest(depth, cur_obj)
        osem = nearest(mask, cur_obj)
        o_ok = oinb & (od > 0) & (od < cfg.th_depth_obj) & (osem != 0)
        Xw_cur = to_world(Tcw_new, cam.unproject(cur_obj, od))
        sf = np.linalg.norm(Xw_cur - obj_Xw, axis=1)

        # ---- 4. object selection (DynObjTracking :1670-1912)
        frame_objects = {}
        new_bins = {}
        for sem in np.unique(osem[o_ok]):
            sel = o_ok & (osem == sem)
            n_pts = int(sel.sum())
            if n_pts < cfg.min_obj_points:
                continue
            u, v = cur_obj[sel, 0], cur_obj[sel, 1]
            border = ((u < cfg.boundary_px) | (u > W_img - cfg.boundary_px)
                      | (v < cfg.boundary_px) | (v > H_img - cfg.boundary_px))
            if border.mean() > cfg.boundary_frac:
                continue
            static_frac = (sf[sel] < cfg.sf_mg).mean()
            if static_frac > cfg.sf_ds:
                continue
            if od[sel].mean() > cfg.th_depth_obj:
                continue

            # ---- 5. object motion (GetInitModelObj + ObjMot :1192-1305)
            Xp = obj_Xw[sel]
            obs = cur_obj[sel]
            centroid = Xp.mean(axis=0)
            H_model = bin_motion.get(int(sem), np.eye(4))
            has_model = int(sem) in bin_motion
            val = np.ones(len(Xp), bool)
            H0, _ = ransac_vs_model(
                cam, Xp, obs, val, H_model, has_model, rng,
                n_hyp=max(cfg.n_hyp // 5, 50), obj_motion=Tcw_new)
            wo = count_inliers(cam, H0, Xp, obs, val,
                               obj_motion=Tcw_new).astype(float)
            H_opt = H0
            for _stage in range(4):
                H_opt, chi2 = lm_pose(cam, Xp, obs, wo, H_opt, iters=10,
                                      obj_motion=Tcw_new)
                wo = (chi2 <= 0.01).astype(float)
            n_inl = int(wo.sum())
            if n_inl < cfg.min_obj_inliers:
                continue   # bObjStat=false (:1218-1228)
            sp = H_opt[:3, 3] - (np.eye(3) - H_opt[:3, :3]) @ centroid
            frame_objects[int(sem)] = {
                "H": H_opt, "speed_kmh": np.linalg.norm(sp) * 3.6 * cam.fps,
                "n_inliers": n_inl, "centroid": centroid,
            }
            new_bins[int(sem)] = H_opt

        # ---- 6. renewal (RenewFrameInfo :2959-3289)
        keep = w > 0.5
        kept_uv = cur_bg[keep]
        kept_d = nearest(depth, kept_uv)
        top_up = sample_bg_grid(cfg, cam, depth, mask, rng,
                                cfg.n_bg - len(kept_uv), exclude_uv=kept_uv)
        bg_uv = np.concatenate([kept_uv, top_up], axis=0)
        bg_d = np.concatenate([kept_d, nearest(depth, top_up)])
        bg_Xw = to_world(Tcw_new, cam.unproject(bg_uv, bg_d))
        obj_uv, obj_sem = sample_obj_dense(cfg, depth, mask)
        obj_Xw = to_world(Tcw_new,
                          cam.unproject(obj_uv, nearest(depth, obj_uv)))

        Tcw = Tcw_new
        bin_motion = new_bins
        prev_flow = np.asarray(fr.flow, np.float64)
        res.Tcw.append(Tcw.copy())
        res.objects.append(frame_objects)
        if verbose:
            print(f"oracle frame {t}: {int(keep.sum())} bg inliers, "
                  f"{len(frame_objects)} objects")
    return res
