"""Per-frame tracking orchestration — Tracking::GrabImageRGBD / Track()
(reference vido_slam/src/Tracking.cc:283-782, 1081-1509) rebuilt TPU-first.

Structure per frame (VO mode):
  1. inherit correspondences: propagate last frame's feature slots through
     the stored flow, re-reading depth/mask at the new positions
     (Tracking.cc:369-430);
  2. camera pose: parallel PnP-RANSAC vs constant-velocity model + LM refine
     (GetInitModelCam + PoseOptimizationNew, Tracking.cc:1125-1136);
  3. scene flow of object points (GetSceneFlowObj, :1582-1668);
  4. object segmentation stats + on-device object selection (the per-label
     decisions of DynObjTracking, :1670-1912);
  5. per-object motion: RANSAC + LM, vmapped over a fixed object budget
     (GetInitModelObj + PoseOptimizationObjMot, :1192-1305); the previous
     frame's motions live in a per-semantic-bin device table so the motion-
     model hypothesis needs no host round-trip; speed = |t - (I-R) c| * 36
     km/h (:1295-1302); < 50 inliers marks the object failed (:1218-1228);
  6. feature renewal into fixed slots (RenewFrameInfo, :2959-3289);
  7. record the frame + tracking-id bookkeeping (host).

TPU-native structure: steps 1-6 are ONE jitted device program
(`_track_step`) — a single dispatch per frame — and the host performs ONE
batched `jax.device_get` for map recording and the tiny tracking-id
bookkeeping. This matters doubly here: host<->device round-trips carry
tunnel latency, and the reference's design (dozens of sequential CPU stages)
would serialise on it.
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.config import Config
from vido_slam_tpu.estimation.pose import (
    estimate_camera_pose,
    estimate_object_motion,
    estimate_object_motions_batched,
)
from vido_slam_tpu.estimation.flow_joint import (
    estimate_camera_pose_joint,
    estimate_object_motions_joint_batched,
)
# NOTE: imported at module scope on purpose — importing inside the jitted
# _track_step would execute window_ba's module-level jnp constants under an
# active trace and leak tracers into the host BA path
from vido_slam_tpu.estimation.window_ba import solve_window_ba
from vido_slam_tpu.frontend.features import (
    FeatureSet,
    gather_depth_bilinear,
    propagate_features,
    sample_background_features,
    sample_object_points,
)
from vido_slam_tpu.frontend.objects import (
    MAX_SEM,
    ObjectStats,
    ObjectTracker,
    assign_point_labels,
    compute_object_stats,
)
from vido_slam_tpu.frontend.association import update_mask
from vido_slam_tpu.frontend.renewal import renew_features
from vido_slam_tpu.frontend.sceneflow import scene_flow_world, unproject_to_world
from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.geometry.se3 import compose, inverse_se3
from vido_slam_tpu.slam_map import FrameRecord, ObjectObservation, SlamMap
from vido_slam_tpu.utils.packing import (
    make_spec,
    pack_pytree,
    unpack_pytree,
)

MIN_OBJ_INLIERS = 50  # Tracking.cc:1218


class TrackState(NamedTuple):
    """Device-side persistent state between frames."""

    stat: FeatureSet
    obj: FeatureSet
    Tcw: jnp.ndarray
    velocity: jnp.ndarray
    has_velocity: jnp.ndarray
    # per-semantic-bin motion table: last frame's world-frame motion of the
    # object whose points carried this semantic value (device-side stand-in
    # for vObjMod + nSemPosition lookup, Tracking.cc:2095-2101)
    bin_motion: jnp.ndarray      # (MAX_SEM, 4, 4)
    bin_has_motion: jnp.ndarray  # (MAX_SEM,) bool
    # previous frame's mask + flow for UpdateMask (Tracking.cc:3291-3529)
    last_mask: jnp.ndarray       # (H, W) int32
    last_flow: jnp.ndarray       # (H, W, 2)
    # ---- fused window-BA rings (device-side PartialBatchOptimization) ----
    # Shifted (not circular) so index order == window frame order; all
    # fixed-shape. Slot-persistence makes slot index == track identity, so
    # no host track assembly or transfer is needed (one RPC saved per ring).
    ba_obs: jnp.ndarray          # (W, N_bg, 3) camera-frame backprojections
    ba_obs_valid: jnp.ndarray    # (W, N_bg)
    ba_age: jnp.ndarray          # (N_bg,) consecutive-valid run of the slot
    ba_Twc: jnp.ndarray          # (W, 4, 4) refined window poses
    ba_odom: jnp.ndarray         # (W, 4, 4) tracked motion frame w-1 -> w
    ba_odom_valid: jnp.ndarray   # (W,)
    ba_nframes: jnp.ndarray      # scalar int32, frames pushed (clipped)
    # PRNG key lives in device state: a host-side jax.random.split + key
    # transfer per frame costs ~2 RPC dispatches on the tunneled transport
    key: jnp.ndarray             # (2,) uint32


class StepOutputs(NamedTuple):
    """Everything the host needs per frame, fetched in one device_get.

    The tunneled transport serializes copy transmission with device compute
    at ~28 MB/s (measured), so every fetched KB costs ~36 us of wall time
    per frame. In `record="light"` mode (the default when the fused BA owns
    the window state on device and no full-batch pass will need per-point
    history) the per-point fields below are emitted as (0,)-shaped
    placeholders — ~12 KB/frame crosses instead of ~120 KB."""

    Tcw: jnp.ndarray
    cam_motion: jnp.ndarray         # Twc_{t-1}^-1 Twc_t (BA odometry meas)
    # object stats for host id bookkeeping
    stats: ObjectStats
    # selected objects (fixed K slots)
    obj_sem_values: jnp.ndarray     # (K,) semantic value, 0 = inactive
    obj_active: jnp.ndarray         # (K,)
    obj_motion: jnp.ndarray         # (K, 4, 4)
    obj_ok: jnp.ndarray             # (K,) >= 50 inliers
    obj_num_inliers: jnp.ndarray    # (K,)
    obj_centroid: jnp.ndarray       # (K, 3)
    obj_speed: jnp.ndarray          # (K,)
    # per-point motion labels (by semantic value; host maps to track ids).
    # int16 on the wire — the tunnel transport is bandwidth-bound, and
    # semantic values/slot ids fit comfortably (see utils/packing.py).
    point_labels: jnp.ndarray       # (N_obj,) int16
    # renewed features + new-slot markers (also inside the new state).
    # NOTE: the world-frame unprojections (stat_3d/obj_3d of FrameRecord)
    # are NOT fetched — they are pure functions of (uv, depth, Tcw) and the
    # host recomputes them in _record_outputs, saving ~84 KB/frame of
    # transport.
    stat_uv: jnp.ndarray
    stat_depth: jnp.ndarray
    stat_valid: jnp.ndarray
    stat_is_new: jnp.ndarray
    obj_uv: jnp.ndarray
    obj_depth: jnp.ndarray
    obj_valid: jnp.ndarray
    obj_is_new: jnp.ndarray
    obj_sem: jnp.ndarray            # int16 on the wire
    # fused window-BA results (fused_ba mode; zeros otherwise)
    ba_Twc: jnp.ndarray        # (W, 4, 4) refined window poses
    ba_points: jnp.ndarray     # (P_sel, 3) refined world points
    ba_slots: jnp.ndarray      # (P_sel,) int16 slot of each refined point
    ba_point_ok: jnp.ndarray   # (P_sel,)
    ba_nframes: jnp.ndarray    # scalar: real (non-pad) frames in the window


def _select_objects(stats: ObjectStats, max_objects: int):
    """Top-K tracked semantic bins by point count, on device."""
    prio = jnp.where(stats.is_tracked, stats.count, -1.0)
    vals, bins = jax.lax.top_k(prio, max_objects)
    active = vals > 0
    return jnp.where(active, bins, 0).astype(jnp.int32), active


def _track_step(
    state: TrackState,
    depth: jnp.ndarray,
    flow: jnp.ndarray,
    mask: jnp.ndarray,
    gray: jnp.ndarray,
    cam: Camera,
    *,
    use_fast: bool,
    joint_flow: bool,
    n_bg: int,
    n_obj: int,
    max_objects: int,
    th_depth_bg: float,
    th_depth_obj: float,
    sf_mg_thres: float,
    sf_ds_thres: float,
    height: int,
    width: int,
    fused_ba: bool = False,
    ba_window: int = 20,
    ba_points: int = 1000,
    ba_iters: int = 10,
    record_light: bool = False,
    lm_pallas: bool = False,
):
    k_cam, k_obj, k_fresh, k_next = jax.random.split(state.key, 4)

    # -- 0. mask repair: recover objects the detector missed ---------
    mask = update_mask(mask, state.last_mask, state.last_flow)

    # -- 1. inherit correspondences ---------------------------------
    cur_stat = propagate_features(state.stat, depth, mask, flow, th_depth=th_depth_bg)
    cur_stat = cur_stat._replace(valid=cur_stat.valid & (cur_stat.sem == 0))
    cur_obj = propagate_features(state.obj, depth, mask, flow, th_depth=th_depth_obj)

    # -- 2. camera pose ---------------------------------------------
    pts3d_stat = unproject_to_world(cam, state.stat.uv, state.stat.depth, state.Tcw)
    T_mm = jnp.where(
        state.has_velocity, compose(state.velocity, state.Tcw), state.Tcw
    )
    if joint_flow:
        # bJoint path (Tracking.cc:1133-1134): pose + per-point flow solved
        # jointly; inlier keypoints move to obs_last + optimized flow and
        # their depth is re-read at the new position (the reference samples
        # depth at the final key positions each frame, Tracking.cc:375-391)
        est, flow_opt = estimate_camera_pose_joint(
            k_cam, pts3d_stat, state.stat.uv, cur_stat.uv,
            cur_stat.valid & state.stat.valid,
            cam, T_mm, cam.backproject(cur_stat.uv, cur_stat.depth),
            use_pallas=lm_pallas,
        )
        uv_j = jnp.where(est.inliers[:, None], state.stat.uv + flow_opt,
                         cur_stat.uv)
        d_j = gather_depth_bilinear(depth, uv_j)
        cur_stat = cur_stat._replace(
            uv=uv_j,
            depth=jnp.where(est.inliers & (d_j > 0), d_j, cur_stat.depth),
        )
    else:
        est = estimate_camera_pose(
            k_cam, pts3d_stat, cur_stat.uv, cur_stat.valid & state.stat.valid,
            cam, T_mm, cam.backproject(cur_stat.uv, cur_stat.depth),
            use_pallas=lm_pallas,
        )
    Tcw = est.T
    velocity = compose(Tcw, inverse_se3(state.Tcw))
    cam_motion = inverse_se3(velocity)

    # -- 3/4. scene flow + object stats -----------------------------
    obj_valid = cur_obj.valid & state.obj.valid
    pts3d_obj_pre = unproject_to_world(cam, state.obj.uv, state.obj.depth, state.Tcw)
    flow3d, sf_norm, sf_ok = scene_flow_world(
        cam,
        state.obj.uv, state.obj.depth, state.Tcw,
        cur_obj.uv, cur_obj.depth, Tcw,
        state.obj.sem, cur_obj.sem, obj_valid,
    )
    stats = compute_object_stats(
        cur_obj.uv, cur_obj.sem, state.obj.sem, sf_norm, cur_obj.depth, sf_ok,
        height=height, width=width,
        sf_mg_thres=sf_mg_thres, sf_ds_thres=sf_ds_thres,
        th_depth_obj=th_depth_obj,
    )
    sem_values, active = _select_objects(stats, max_objects)
    # per-point labels: use the semantic value itself as a provisional label
    # (> 0 for tracked bins); the host rewrites to global tracking ids
    sem_as_id = jnp.arange(MAX_SEM, dtype=jnp.int32)
    point_labels = assign_point_labels(cur_obj.sem, sf_ok, stats, sem_as_id)

    # -- 5. object motions ------------------------------------------
    # motion-model hypothesis: last frame's motion of the bin this object's
    # points came from (assoc_prev_sem), looked up in the device table
    prev_bins = stats.assoc_prev_sem[sem_values]
    H_mm = state.bin_motion[prev_bins]
    has_mm = state.bin_has_motion[prev_bins] & active

    obj_masks = (
        (cur_obj.sem[None, :] == sem_values[:, None])
        & active[:, None]
        & (point_labels[None, :] > 0)
    )

    obj_pc_cur = cam.backproject(cur_obj.uv, cur_obj.depth)

    keys = jax.random.split(k_obj, max_objects)
    if joint_flow:
        # PoseOptimizationFlow2 (Tracking.cc:1268-1271) for all K objects in
        # one batch; with lm_pallas the 4-round LM is ONE fused kernel with
        # a grid step per object (estimation/flow_joint_pallas.py)
        H, obj_inl, n_inl, obj_flow = estimate_object_motions_joint_batched(
            keys, Tcw, pts3d_obj_pre, state.obj.uv, cur_obj.uv, obj_masks,
            cam, H_mm, has_mm, obj_pc_cur, use_pallas=lm_pallas,
        )
    else:
        H, obj_inl, n_inl = estimate_object_motions_batched(
            keys, Tcw, pts3d_obj_pre, cur_obj.uv, obj_masks, cam, H_mm,
            has_mm, obj_pc_cur, use_pallas=lm_pallas,
        )
        obj_flow = jnp.zeros((max_objects,) + cur_obj.uv.shape,
                             cur_obj.uv.dtype)
    wK = obj_masks.astype(jnp.float32)                       # (K, N)
    cent = (wK @ pts3d_obj_pre) / jnp.maximum(
        jnp.sum(wK, axis=1, keepdims=True), 1.0)             # (K, 3)
    sp_v = H[:, :3, 3] - jnp.einsum(
        "kij,kj->ki", jnp.eye(3)[None] - H[:, :3, :3], cent)
    speed = jnp.linalg.norm(sp_v, axis=-1) * 36.0
    if joint_flow:
        # updateflow writeback (Optimizer.cc:3224-3232): the per-object
        # masks are disjoint, so a masked sum combines the K flow fields
        upd = obj_masks & obj_inl                       # (K, N)
        moved = jnp.any(upd, axis=0)
        fl_comb = jnp.einsum("kn,knj->nj", upd.astype(jnp.float32), obj_flow)
        uv_j = jnp.where(moved[:, None], state.obj.uv + fl_comb, cur_obj.uv)
        d_j = gather_depth_bilinear(depth, uv_j)
        cur_obj = cur_obj._replace(
            uv=uv_j, depth=jnp.where(moved & (d_j > 0), d_j, cur_obj.depth)
        )
    ok = active & (n_inl >= MIN_OBJ_INLIERS)
    eye4 = jnp.broadcast_to(jnp.eye(4), (max_objects, 4, 4))
    H = jnp.where(ok[:, None, None], H, eye4)
    speed = jnp.where(ok, speed, 0.0)

    # failed objects' points fall back to -1 (Tracking.cc:1391-1398);
    # out-of-bounds indices with mode="drop" skip the non-failed slots
    failed_idx = jnp.where(active & ~ok, sem_values, MAX_SEM)
    is_failed_bin = jnp.zeros(MAX_SEM, bool).at[failed_idx].set(True, mode="drop")
    point_labels = jnp.where(is_failed_bin[jnp.clip(cur_obj.sem, 0, MAX_SEM - 1)],
                             -1, point_labels)

    # motion table for the next frame: only this frame's successful objects
    # seed a motion-model hypothesis (vObjMod semantics)
    ok_idx = jnp.where(ok, sem_values, MAX_SEM)
    bin_motion = state.bin_motion.at[ok_idx].set(H, mode="drop")
    bin_has_motion = jnp.zeros(MAX_SEM, bool).at[ok_idx].set(True, mode="drop")

    obj_inlier_any = jnp.any(obj_inl & obj_masks, axis=0)

    # -- 6. renewal --------------------------------------------------
    score_map = None
    if use_fast:
        from vido_slam_tpu.ops.fast import fast_score_map

        score_map = fast_score_map(gray)
    fresh_bg = sample_background_features(
        k_fresh, mask, depth, flow, score_map, n=n_bg, th_depth=th_depth_bg
    )
    fresh_obj = sample_object_points(
        mask, depth, flow, n=n_obj, th_depth=th_depth_obj
    )
    renewed_stat, stat_new = renew_features(
        cur_stat, est.inliers, fresh_bg, height=height, width=width
    )
    keep_obj = obj_inlier_any & (point_labels > 0)
    renewed_obj, obj_new = renew_features(
        cur_obj, keep_obj, fresh_obj, height=height, width=width
    )
    fresh_labels = assign_point_labels(
        renewed_obj.sem, renewed_obj.valid, stats, sem_as_id
    )
    point_labels = jnp.where(obj_new, fresh_labels, point_labels)

    # -- 7. fused window BA (PartialBatchOptimization inside the step) ----
    # The host path (Tracker._run_window_ba) assembles tracks from recorded
    # frames and pays a put + a get RPC per frame; here the window lives in
    # device rings (slot index == track identity, frontend/renewal.py), the
    # whole solve joins this frame's program, and its results ride the same
    # output fetch. Track segmentation matches assembly.py: a slot's run of
    # consecutive valid frames (broken by renewal or invalidity) is a track;
    # only the newest segment per slot participates (older window segments
    # are dropped — documented deviation, they rarely survive >1 renewal).
    W = ba_window
    obs_cur = cam.backproject(renewed_stat.uv, renewed_stat.depth)
    prev_valid = state.ba_obs_valid[-1]
    age = jnp.where(
        renewed_stat.valid,
        jnp.where(stat_new | ~prev_valid, 1, state.ba_age + 1),
        0,
    )
    ba_obs = jnp.concatenate([state.ba_obs[1:], obs_cur[None]])
    ba_obs_valid = jnp.concatenate(
        [state.ba_obs_valid[1:], renewed_stat.valid[None]])
    ba_Twc = jnp.concatenate([state.ba_Twc[1:], inverse_se3(Tcw)[None]])
    ba_odom = jnp.concatenate([state.ba_odom[1:], cam_motion[None]])
    # the appended pair's motion is MEASURED this frame (cam_motion above),
    # so its odometry edge is always valid — gating it on has_velocity (the
    # motion-MODEL flag, False on the first tracked frame) dropped the
    # window's first odometry edge, leaving the gauge frame tethered only
    # through Huber-saturated point edges: the window then wandered +z a
    # little on every re-solve and the drift froze into the trajectory
    # (~0.4 m over 30 frames on the offline scene — r5 root-caused by a
    # fused-vs-host problem diff; the host assembly keeps this edge,
    # matching the reference's vmRigidMotion odometry which exists for
    # every tracked pair, Optimizer.cc:248-260)
    ba_odom_valid = jnp.concatenate(
        [state.ba_odom_valid[1:], jnp.ones((1,), bool)])
    nf = jnp.minimum(state.ba_nframes + 1, W)

    if fused_ba:
        frame_valid = jnp.arange(W) >= W - nf
        # observation participates if inside the slot's current track run
        run = jnp.minimum(age, W)
        in_run = jnp.arange(W)[:, None] >= (W - run)[None, :]
        wv = ba_obs_valid & in_run & frame_valid[:, None]
        count = jnp.sum(wv, axis=0)
        score = jnp.where(count >= 3, count, -1)
        _, sel = jax.lax.top_k(score, ba_points)
        sel_ok = score[sel] > 0
        # anchors re-derived each solve from the first in-run observation
        # mapped through the CURRENT ring pose (assembly.py X0 semantics).
        # A persistent refined-anchor state (the earlier design) closes a
        # pose->point->pose feedback loop that is marginally unstable on
        # yaw-ambiguous scenes (~1.55x error growth per frame, saturating
        # in a Huber-saturated period-2 zigzag local minimum); measurement
        # -derived anchors keep every solve tied to the data.
        first_w = jnp.argmax(wv, axis=0)                     # (N,)
        obs_first = ba_obs[first_w, jnp.arange(ba_obs.shape[1])]
        T_first = ba_Twc[first_w]                            # (N, 4, 4)
        anchors = (
            jnp.einsum("nij,nj->ni", T_first[:, :3, :3], obs_first)
            + T_first[:, :3, 3]
        )
        res = solve_window_ba(
            jnp.where(frame_valid[:, None, None], ba_Twc, jnp.eye(4)),
            ba_odom[1:],
            ba_odom_valid[1:] & frame_valid[:-1] & frame_valid[1:],
            anchors[sel],
            ba_obs[:, sel],
            wv[:, sel],
            sel_ok,
            frame_valid,
            max_iters=ba_iters,
        )
        Tcw_out = inverse_se3(res.Twc[-1])
        ba_Twc = jnp.where(frame_valid[:, None, None], res.Twc, ba_Twc)
        out_ba = (res.Twc, res.points, sel.astype(jnp.int32), sel_ok, nf)
    else:
        Tcw_out = Tcw
        P = ba_points
        out_ba = (ba_Twc, jnp.zeros((P, 3)), jnp.zeros(P, jnp.int32),
                  jnp.zeros(P, bool), nf)

    new_state = TrackState(
        stat=renewed_stat,
        obj=renewed_obj,
        Tcw=Tcw_out,
        velocity=velocity,
        has_velocity=jnp.bool_(True),
        bin_motion=bin_motion,
        bin_has_motion=bin_has_motion,
        last_mask=mask,
        last_flow=flow,
        ba_obs=ba_obs,
        ba_obs_valid=ba_obs_valid,
        ba_age=age,
        ba_Twc=ba_Twc,
        ba_odom=ba_odom,
        ba_odom_valid=ba_odom_valid,
        ba_nframes=nf,
        key=k_next,
    )
    if record_light:
        # per-point history is not fetched: (0,)-shaped placeholders keep
        # the output pytree structure (and the unpack spec) uniform
        e = lambda *s, dtype=jnp.float32: jnp.zeros(s, dtype)
        outputs = StepOutputs(
            Tcw=Tcw,
            cam_motion=cam_motion,
            stats=stats,
            obj_sem_values=sem_values,
            obj_active=active,
            obj_motion=H,
            obj_ok=ok,
            obj_num_inliers=n_inl,
            obj_centroid=cent,
            obj_speed=speed,
            point_labels=e(0, dtype=jnp.int16),
            stat_uv=e(0, 2),
            stat_depth=e(0),
            stat_valid=e(0, dtype=bool),
            stat_is_new=e(0, dtype=bool),
            obj_uv=e(0, 2),
            obj_depth=e(0),
            obj_valid=e(0, dtype=bool),
            obj_is_new=e(0, dtype=bool),
            obj_sem=e(0, dtype=jnp.int16),
            ba_Twc=out_ba[0],
            ba_points=e(0, 3),
            ba_slots=e(0, dtype=jnp.int16),
            ba_point_ok=e(0, dtype=bool),
            ba_nframes=out_ba[4],
        )
    else:
        outputs = StepOutputs(
            Tcw=Tcw,
            cam_motion=cam_motion,
            stats=stats,
            obj_sem_values=sem_values,
            obj_active=active,
            obj_motion=H,
            obj_ok=ok,
            obj_num_inliers=n_inl,
            obj_centroid=cent,
            obj_speed=speed,
            point_labels=point_labels.astype(jnp.int16),
            stat_uv=renewed_stat.uv,
            stat_depth=renewed_stat.depth,
            stat_valid=renewed_stat.valid,
            stat_is_new=stat_new,
            obj_uv=renewed_obj.uv,
            obj_depth=renewed_obj.depth,
            obj_valid=renewed_obj.valid,
            obj_is_new=obj_new,
            obj_sem=renewed_obj.sem.astype(jnp.int16),
            ba_Twc=out_ba[0],
            ba_points=out_ba[1],
            ba_slots=out_ba[2].astype(jnp.int16),
            ba_point_ok=out_ba[3],
            ba_nframes=out_ba[4],
        )
    return new_state, outputs


class Tracker:
    """VO/VIO front-end orchestrator (System owns one of these)."""

    def __init__(
        self,
        config: Config,
        *,
        n_bg: Optional[int] = None,
        n_obj: int = 4000,
        max_objects: int = 8,
        seed: int = 0,
        local_ba: bool = True,
        ba_max_points: int = 1000,
        ba_iters: int = 15,
        use_imu: bool = False,
        imu_max_frames: int = 32,
        imu_max_segments: int = 64,
        imu_init_stride: int = 3,
        pipelined: bool = False,
        joint_flow: bool = False,
        fused_ba: bool = False,
        record: str = "auto",
        lm_pallas: bool = None,
    ):
        self.cfg = config
        c = config.camera
        self.cam = Camera.create(
            fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, dist=c.dist,
            width=c.width, height=c.height, bf=c.bf, fps=c.fps,
        )
        self.n_bg = n_bg or config.system.max_track_points_bg
        self.n_obj = n_obj
        self.max_objects = max_objects
        self.key = jax.random.PRNGKey(seed)
        self._gray_zero = None
        self.map = SlamMap()
        self.object_tracker = ObjectTracker()
        self.state: Optional[TrackState] = None
        self.frame_id = 0
        self.local_ba = local_ba
        self.ba_max_points = ba_max_points
        self.ba_iters = ba_iters
        # fused window BA: PartialBatchOptimization runs inside the per-frame
        # device program from ring buffers (no per-frame BA put/get RPCs).
        # VIO composes with it: IMU init / scale refinement run at map-
        # synchronous points and transform the device rings in place
        # (_rescale_state).
        self.fused_ba = fused_ba and local_ba
        # software pipeline (hide host<->device round-trips): frame t's
        # outputs are recorded while frame t+1 computes.
        # with fused_ba the fetch feeds nothing back into device state, so
        # the one-frame-lagged pipeline is exactly equivalent (records lag
        # one frame until finish()) and the fetch RTT hides under compute.
        # VIO + pipeline needs the fused BA (the host-assembled window BA's
        # async dispatch would race the scale handling's map rewrite).
        self.pipelined = pipelined and (not use_imu or self.fused_ba)
        # defer the window-BA fetch: join it with the NEXT frame's output
        # fetch (one host round-trip instead of two; pose correction applied
        # device-side). Off by default: on tunneled transports the joined
        # fetch serialises behind prefetched work and measures slower.
        self.ba_deferred = False
        self._pending = None
        self._pending_ba = None
        # fused perception+tracking program (attach_perception)
        self._step_frames = None
        self._step_frames2 = None
        self._pp = None
        self._attached = None
        self._init_perceive = None
        self._pending_q: list = []   # track_frames_pair outputs awaiting record
        # ---- VIO state (Tracking.cc:112-121, 784-1077) ----
        self.use_imu = use_imu
        self.imu_max_frames = imu_max_frames
        # inertial-init baseline stride (frames per composed preint pair);
        # see _try_initialize_imu for the errors-in-variables rationale
        self.imu_init_stride = imu_init_stride
        self.imu_max_segments = imu_max_segments
        self.imu_scale = 1.0           # mScale
        self.imu_initialized = False
        self.imu_init_attempts = 0     # observability: InitializeIMU runs
        self.imu_refine_runs = 0       # observability: ScaleRefinement runs
        self.imu_bias = np.zeros(6, np.float32)
        self.Rwg: Optional[np.ndarray] = None
        self._imu_queue: list = []     # pending (a, w, t) measurements
        self._preints: list = []       # per consecutive-frame-pair states
        self._last_ts: Optional[float] = None
        self._last_scale_refine_t = 0.0
        if use_imu:
            from vido_slam_tpu.imu.preintegration import ImuCalib

            # the tiny IMU-side programs (preintegration scan, init LM,
            # alignment) run on the HOST CPU backend: as device programs on
            # a tunneled TPU each costs serialized h2d puts plus a blocking
            # fetch behind all in-flight frame work (FIFO transport) —
            # measured 12.5 FPS on the VIO bench row vs 48.5 VO
            try:
                self._imu_cpu = jax.devices("cpu")[0]
            except RuntimeError:
                self._imu_cpu = None
            i = config.imu
            with self._host_math():
                self.imu_calib = ImuCalib.from_config(
                    i.Tbc, i.noise_gyro, i.noise_acc, i.gyro_walk,
                    i.acc_walk, i.frequency,
                )
        s = config.system
        # UseSampleFeature: 0 = detected FAST corners (needs the gray image),
        # 1 = grid-random sampling (kaist_config.yaml:78, Tracking.cc:167)
        self.use_fast = not s.use_sample_feature
        # the reference's bJoint (Tracking.h:184 — declared, never assigned):
        # joint flow+pose optimizers instead of fixed-correspondence LM
        self.joint_flow = joint_flow
        # fused Pallas LM kernels for the per-frame solves. Standalone the
        # kernels beat the XLA while-loops 7-18x (estimation/lm_pallas.py),
        # but INSIDE the fused frame program their packed-plane input
        # layouts propagate backwards through the perception graph and the
        # convolutions recompile ~2.9 ms/frame slower (measured by-source
        # device-trace diff, r5) — a net loss. Default OFF until the layout
        # isolation is solved; opt in with lm_pallas=True.
        self.lm_pallas = bool(False if lm_pallas is None else lm_pallas)
        # record mode: what per-frame data crosses the device->host boundary.
        # "full" fetches per-point slots into FrameRecords (needed by the
        # host-assembled BA paths, the KITTI full-batch pass, point viz and
        # session snapshots). "light" fetches only poses/object stats
        # (~12 KB vs ~120 KB — the tunneled transport serializes the copy
        # with compute at ~28 MB/s, so this is ~4 ms of wall per frame).
        # "auto": light exactly when the fused BA owns the window state on
        # device AND no KITTI-style full-batch pass will need the history.
        assert record in ("auto", "full", "light"), record
        if record == "auto":
            self.record_light = bool(self.fused_ba
                                     and config.system.choose_data != 2)
        else:
            self.record_light = record == "light"
        assert not (self.record_light and self.local_ba and not self.fused_ba), \
            "record='light' requires the fused BA (the host-assembled window" \
            " BA reads per-point FrameRecords)"
        self._build_step()

    def _build_step(self):
        s = self.cfg.system
        raw_step = partial(
            _track_step,
            cam=self.cam,
            use_fast=self.use_fast,
            joint_flow=self.joint_flow,
            n_bg=self.n_bg,
            n_obj=self.n_obj,
            max_objects=self.max_objects,
            th_depth_bg=s.th_depth_bg,
            th_depth_obj=s.th_depth_obj,
            sf_mg_thres=s.sf_mg_thres,
            sf_ds_thres=s.sf_ds_thres,
            height=self.cam.height,
            width=self.cam.width,
            fused_ba=self.fused_ba,
            ba_window=s.window_size,
            ba_points=self.ba_max_points,
            ba_iters=self.ba_iters,
            record_light=self.record_light,
            lm_pallas=self.lm_pallas,
        )
        self._raw_step = raw_step

        # the jitted step returns StepOutputs PACKED into two flat buffers:
        # each device_get leaf is its own serialized RPC on the tunneled
        # transport, and the ~36-leaf fetch profiled at ~48 ms/frame — the
        # pack makes the per-frame fetch 2 leaves (utils/packing.py)
        def packed_step(state, depth, flow, mask, gray):
            new_state, out = raw_step(state, depth, flow, mask, gray)
            fbuf, ibuf = pack_pytree(out)
            return new_state, fbuf, ibuf

        self._step = jax.jit(packed_step)
        self._out_spec = None

    def _ensure_out_spec(self, state, depth, flow, mask, gray):
        if self._out_spec is None:
            struct = jax.eval_shape(
                self._raw_step, state, depth, flow, mask, gray)[1]
            self._out_spec = make_spec(struct)

    def _fetch_outputs(self, packed):
        """One-RPC fetch + host-side unpack back into StepOutputs."""
        fbuf, ibuf = jax.device_get(packed)
        return unpack_pytree(fbuf, ibuf, self._out_spec)

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # ------------------------------------------------------------------
    # VIO: IMU queue + preintegration + initialization
    # (System.cc:74-75 GrabImuData; Tracking.cc:784-887 PreintegrateIMU;
    #  :937-1077 InitializeIMU/ScaleRefinement)
    # ------------------------------------------------------------------
    def grab_imu_data(self, measurements) -> None:
        """Queue raw IMU samples; each has .a (3,), .w (3,), .t seconds."""
        self._imu_queue.extend(measurements)

    def _host_math(self):
        """Context manager pinning the IMU-side math to the host CPU
        backend (see __init__); no-ops when no CPU backend exists."""
        import contextlib

        cpu = getattr(self, "_imu_cpu", None)
        return jax.default_device(cpu) if cpu is not None \
            else contextlib.nullcontext()

    def _preintegrate_interval(self, t0: float, t1: float):
        from vido_slam_tpu.imu.preintegration import (
            init_preintegration, integrate_measurements, prepare_segments,
        )

        if not self._imu_queue:
            return None
        times = np.asarray([m.t for m in self._imu_queue], np.float64)
        accs = np.asarray([np.asarray(m.a) for m in self._imu_queue], np.float32)
        gyros = np.asarray([np.asarray(m.w) for m in self._imu_queue], np.float32)
        a, w, dt = prepare_segments(times, accs, gyros, t0, t1,
                                    self.imu_max_segments)
        with self._host_math():
            st = integrate_measurements(
                init_preintegration(jnp.asarray(self.imu_bias)),
                jnp.asarray(a), jnp.asarray(w), jnp.asarray(dt),
                self.imu_calib,
            )
        # drop consumed samples (keep one before t1 for boundary interp)
        keep = times >= t1 - 0.02
        self._imu_queue = [m for m, k in zip(self._imu_queue, keep) if k]
        return jax.device_get(st)

    def _body_poses(self):
        """Twb_i = Twc_i * Tcb for every frame in the map."""
        Tbc = np.asarray(self.cfg.imu.Tbc, np.float64)
        Tcb = np.linalg.inv(Tbc)
        Rwb, twb = [], []
        for rec in self.map.frames:
            Twb = np.linalg.inv(np.asarray(rec.Tcw, np.float64)) @ Tcb
            Rwb.append(Twb[:3, :3])
            twb.append(Twb[:3, 3])
        return np.stack(Rwb), np.stack(twb)

    def _stacked_preints(self, preints):
        """Pad a list of preintegration states into the fixed (M-1)-slot
        arrays `initialize_imu` consumes (pair i covers frames i -> i+1 of
        the window the caller selected)."""
        M = self.imu_max_frames - 1
        z33 = np.zeros((3, 3), np.float32)
        out = {
            "dts": np.zeros(M, np.float32),
            "dR": np.tile(np.eye(3, dtype=np.float32), (M, 1, 1)),
            "dV": np.zeros((M, 3), np.float32),
            "dP": np.zeros((M, 3), np.float32),
            "JRg": np.tile(z33, (M, 1, 1)),
            "JVg": np.tile(z33, (M, 1, 1)),
            "JVa": np.tile(z33, (M, 1, 1)),
            "JPg": np.tile(z33, (M, 1, 1)),
            "JPa": np.tile(z33, (M, 1, 1)),
            "C9": np.tile(np.eye(9, dtype=np.float32) * 1e-6, (M, 1, 1)),
        }
        pv = np.zeros(M, bool)
        for i, st in enumerate(preints[:M]):
            if st is None:
                continue
            out["dts"][i] = st.dT
            out["dR"][i] = st.dR
            out["dV"][i] = st.dV
            out["dP"][i] = st.dP
            out["JRg"][i] = st.JRg
            out["JVg"][i] = st.JVg
            out["JVa"][i] = st.JVa
            out["JPg"][i] = st.JPg
            out["JPa"][i] = st.JPa
            out["C9"][i] = st.C[:9, :9]
            pv[i] = st.dT > 0
        return out, pv

    def _try_initialize_imu(self, timestamp: float) -> None:
        """InitializeIMU (Tracking.cc:937-1044): needs >= 10 frames and
        >= 2 s of data; estimates gravity/scale/biases and rescales the map.

        The reference retries every frame while uninitialized with NO upper
        frame bound (Tracking.cc:1452-1453, gate :939-949) — so this never
        locks out: past `imu_max_frames` frames the attempt SLIDES to the
        most recent imu_max_frames frames / preint pairs (fixed problem
        shape), instead of giving up. A sequence whose early frames lack
        excitation (e.g. stopped at a light) still initializes once motion
        begins."""
        from vido_slam_tpu.estimation.imu_init import initialize_imu

        n = len(self.map)
        if n < 10:
            return
        M = self.imu_max_frames
        t0_all = self.map.frames[max(0, n - M)].timestamp
        if timestamp - t0_all < 2.0:
            return
        Rwb_np, twb_np = self._body_poses()
        self.imu_init_attempts += 1
        # Two stride candidates, best (largest) recovered scale wins:
        # consecutive 0.1 s camera-rate pairs make the visual-inertial
        # alignment an errors-in-variables problem — the visual positions
        # sit in the regressor multiplying the scale, so VO noise
        # attenuates the scale strictly TOWARD ZERO (measured: 1 cm noise
        # -> s=0.47x truth at stride 1; composing K pairs into one longer
        # baseline grows the kinematic signal ~K^2 and recovers it). But
        # when the VO noise is tiny, the stride only costs pairs
        # (variance). Since the failure mode is one-sided, running the
        # staged init at stride 1 AND stride K and keeping the LARGER
        # valid scale picks the better-conditioned candidate in every
        # measured regime. The reference's init over sparser KEYFRAMES is
        # the same longer-baseline medicine (Tracking.cc:937+ operates on
        # the keyframe chain).
        strides = {1, max(1, int(self.imu_init_stride))}
        best = None
        for K in sorted(strides):
            cand = self._init_candidate(K, n, M, Rwb_np, twb_np)
            if cand is None:
                continue
            if best is None or float(cand.scale) > float(best.scale):
                best = cand
        if best is None:
            return
        res = best
        scale = float(res.scale)
        if scale < 0.1:  # Tracking.cc:1008-1012
            return
        Rwg = np.asarray(res.Rwg, np.float64)
        self.Rwg = Rwg
        self.imu_bias = np.concatenate(
            [np.asarray(res.bg), np.asarray(res.ba)]
        ).astype(np.float32)
        if abs(scale - 1.0) > 1e-5:  # Tracking.cc:1016-1020
            self.map.apply_scaled_rotation(Rwg.T, scale)
            self.imu_scale *= scale
            self._rescale_state(scale, Rwg.T)
        self.imu_initialized = True
        self._last_scale_refine_t = timestamp

    def _init_candidate(self, K: int, n: int, M: int,
                        Rwb_np: np.ndarray, twb_np: np.ndarray):
        """One staged-init run over the stride-K window (composed preints);
        None when the window cannot support it."""
        from vido_slam_tpu.estimation.imu_init import initialize_imu
        from vido_slam_tpu.imu.preintegration import compose_preints

        idxs = list(range(n - 1, -1, -K))[::-1]
        idxs = idxs[-M:]
        n_w = len(idxs)
        if n_w < 5:
            return None
        Rwb = np.tile(np.eye(3, dtype=np.float32), (M, 1, 1))
        twb = np.zeros((M, 3), np.float32)
        Rwb[:n_w] = Rwb_np[idxs]
        twb[:n_w] = twb_np[idxs]
        # composed preint per strided pair; any missing sub-pair (None —
        # no IMU samples in that interval) invalidates the pair
        window_pre = []
        for a, b in zip(idxs[:-1], idxs[1:]):
            subs = self._preints[a:b]
            if any(p is None for p in subs):
                window_pre.append(None)
                continue
            st = subs[0]
            for p in subs[1:]:
                st = compose_preints(st, p)
            window_pre.append(st)
        pp, pv = self._stacked_preints(window_pre)
        pv[n_w - 1:] = False
        with self._host_math():
            res = initialize_imu(
                jnp.asarray(Rwb), jnp.asarray(twb),
                **{k: jnp.asarray(v) for k, v in pp.items()},
                pair_valid=jnp.asarray(pv),
                prior_g=1e2, prior_a=1e9,
            )
        return jax.device_get(res)

    def _rescale_state(self, scale: float, Ryw: np.ndarray) -> None:
        """Bring the device-side tracking state into the rescaled, gravity-
        aligned world — the state-side counterpart of
        Map::ApplyScaledRotation (Map.cc:57-120). Camera-frame quantities
        (stored feature depths, BA-ring backprojections) scale by s; the
        pose transforms as Tcw' = [Rcw·Ryw^T | s·tcw]; relative motions
        (BA odometry ring) keep their rotation with translations scaled;
        velocity and per-bin object motions are invalidated and re-seed on
        the next frame. Applying the transform directly (instead of copying
        the last map pose) keeps this correct even when the state runs
        ahead of the recorded frames (pipelined / pair modes)."""
        st = self.state
        s = jnp.float32(scale)
        Ryw_j = jnp.asarray(np.asarray(Ryw, np.float64), jnp.float32)
        Tcw = st.Tcw
        Tcw_new = (Tcw.at[:3, :3].set(Tcw[:3, :3] @ Ryw_j.T)
                   .at[:3, 3].set(s * Tcw[:3, 3]))
        # window-BA rings: Twc' = [Ryw·Rwc | s·Ryw·twc]; odometry
        # (Twc_{w-1}^{-1}·Twc_w) keeps R, scales t; obs are camera-frame
        ba_Twc = st.ba_Twc
        ba_R = jnp.einsum("ij,wjk->wik", Ryw_j, ba_Twc[:, :3, :3])
        ba_t = s * jnp.einsum("ij,wj->wi", Ryw_j, ba_Twc[:, :3, 3])
        ba_Twc_new = (ba_Twc.at[:, :3, :3].set(ba_R)
                      .at[:, :3, 3].set(ba_t))
        self.state = st._replace(
            stat=st.stat._replace(depth=st.stat.depth * s),
            obj=st.obj._replace(depth=st.obj.depth * s),
            Tcw=Tcw_new,
            has_velocity=jnp.bool_(False),
            bin_has_motion=jnp.zeros_like(st.bin_has_motion),
            ba_obs=st.ba_obs * s,
            ba_Twc=ba_Twc_new,
            ba_odom=st.ba_odom.at[:, :3, 3].multiply(s),
        )

    def _try_scale_refinement(self, timestamp: float) -> None:
        """ScaleRefinement (Tracking.cc:1046-1077), every ~10 s."""
        from vido_slam_tpu.estimation.imu_init import (
            estimate_gravity_direction, linear_alignment,
        )

        if timestamp - self._last_scale_refine_t < 10.0:
            return
        from vido_slam_tpu.imu.preintegration import compose_preints

        nmap = len(self.map)
        Tbc = np.asarray(self.cfg.imu.Tbc, np.float64)
        Tcb = np.linalg.inv(Tbc)

        def candidate(K):
            """Stride-K stage-B alignment (same errors-in-variables
            medicine as the init, see _try_initialize_imu); only preints
            whose BOTH frames are recorded (pipelined modes can run the
            preints ahead of the map)."""
            idxs = list(range(nmap - 1, -1, -K))[::-1]
            idxs = idxs[-self.imu_max_frames:]
            if len(idxs) < 5:
                return None
            Rwb, twb = [], []
            for i in idxs:
                Twb = np.linalg.inv(
                    np.asarray(self.map.frames[i].Tcw, np.float64)) @ Tcb
                Rwb.append(Twb[:3, :3])
                twb.append(Twb[:3, 3])
            pre = []
            for a, b in zip(idxs[:-1], idxs[1:]):
                subs = self._preints[a:b]
                if b > len(self._preints) or any(p is None for p in subs):
                    return None
                st = subs[0]
                for p in subs[1:]:
                    st = compose_preints(st, p)
                pre.append(st)
            with self._host_math():
                dts = jnp.asarray([p.dT for p in pre])
                dV = jnp.asarray([p.dV for p in pre])
                dP = jnp.asarray([p.dP for p in pre])
                pv = jnp.asarray([p.dT > 0 for p in pre])
                Rwb_j = jnp.asarray(np.stack(Rwb), jnp.float32)
                twb_j = jnp.asarray(np.stack(twb), jnp.float32)
                Rwg0 = estimate_gravity_direction(Rwb_j, dV, pv)
                _, s, Rwg, _ = linear_alignment(
                    Rwb_j, twb_j, dts, dV, dP, pv, Rwg0)
            return float(s), np.asarray(Rwg)

        self.imu_refine_runs += 1
        best = None
        for K in sorted({1, max(1, int(self.imu_init_stride))}):
            c = candidate(K)
            if c is None:
                continue
            # EIV attenuation is one-sided (toward 0): larger scale wins
            if best is None or c[0] > best[0]:
                best = c
        if best is None:
            return
        scale, Rwg = best
        self._last_scale_refine_t = timestamp
        if scale < 0.1 or abs(scale - 1.0) <= 1e-5:
            return
        Ryw = np.asarray(Rwg, np.float64).T
        self.map.apply_scaled_rotation(Ryw, scale)
        self.imu_scale *= scale
        self._rescale_state(scale, Ryw)

    # ------------------------------------------------------------------
    def initialize(self, depth, flow, mask, Tcw_gt=None, timestamp=0.0,
                   image=None):
        """First frame (Tracking::Initialization, Tracking.cc:1512-1580):
        sample features, pose = identity, push to map."""
        depth = jnp.asarray(depth)
        flow = jnp.asarray(flow)
        mask = jnp.asarray(mask, jnp.int32)
        score_map = None
        if self.use_fast and image is not None:
            from vido_slam_tpu.ops.fast import fast_score_map

            score_map = fast_score_map(jnp.asarray(image, jnp.float32))
        stat = sample_background_features(
            self._next_key(), mask, depth, flow, score_map,
            n=self.n_bg, th_depth=self.cfg.system.th_depth_bg,
        )
        obj = sample_object_points(
            mask, depth, flow, n=self.n_obj, th_depth=self.cfg.system.th_depth_obj
        )
        Tcw = jnp.eye(4)
        W = self.cfg.system.window_size
        obs0 = self.cam.backproject(stat.uv, stat.depth)
        stat_3d0 = unproject_to_world(self.cam, stat.uv, stat.depth, Tcw)
        self.state = TrackState(
            stat=stat,
            obj=obj,
            Tcw=Tcw,
            velocity=jnp.eye(4),
            has_velocity=jnp.bool_(False),
            bin_motion=jnp.tile(jnp.eye(4), (MAX_SEM, 1, 1)),
            bin_has_motion=jnp.zeros(MAX_SEM, bool),
            last_mask=mask,
            last_flow=flow,
            ba_obs=jnp.zeros((W, self.n_bg, 3)).at[-1].set(obs0),
            ba_obs_valid=jnp.zeros((W, self.n_bg), bool).at[-1].set(stat.valid),
            ba_age=stat.valid.astype(jnp.int32),
            ba_Twc=jnp.tile(jnp.eye(4), (W, 1, 1)),
            ba_odom=jnp.tile(jnp.eye(4), (W, 1, 1)),
            ba_odom_valid=jnp.zeros(W, bool),
            ba_nframes=jnp.int32(1),
            key=self._next_key(),
        )
        stat_3d = stat_3d0
        obj_3d = unproject_to_world(self.cam, obj.uv, obj.depth, Tcw)
        host = jax.device_get(
            (stat.uv, stat.depth, stat.valid, stat_3d,
             obj.uv, obj.depth, obj.valid, obj.sem, obj_3d)
        )
        (s_uv, s_d, s_v, s_3d, o_uv, o_d, o_v, o_s, o_3d) = host
        self.map.add_frame(FrameRecord(
            frame_id=self.frame_id,
            timestamp=float(timestamp),
            Tcw=np.eye(4, dtype=np.float32),
            Tcw_gt=None if Tcw_gt is None else np.asarray(Tcw_gt),
            stat_uv=s_uv, stat_depth=s_d, stat_valid=s_v,
            stat_is_new=np.ones(self.n_bg, bool), stat_3d=s_3d,
            obj_uv=o_uv, obj_depth=o_d, obj_valid=o_v,
            obj_is_new=np.ones(self.n_obj, bool), obj_sem=o_s,
            obj_label=np.full(self.n_obj, -1, np.int32), obj_3d=o_3d,
            objects=[], timing={},
        ))
        self.frame_id += 1
        self._last_ts = float(timestamp)

    # ------------------------------------------------------------------
    def track(self, depth, flow, mask, Tcw_gt=None, timestamp=None,
              image=None):
        """Process one frame; returns the new camera pose (4,4) np array.
        `image` is the grayscale frame for detected-feature mode (FAST);
        without it the tracker falls back to grid-random sampling."""
        if image is None and self.use_fast:
            self.use_fast = False
            self._build_step()
        if image is None:
            if self._gray_zero is None:
                self._gray_zero = jnp.zeros(
                    (self.cam.height, self.cam.width), jnp.float32)
            gray = self._gray_zero
        else:
            gray = jnp.asarray(image, jnp.float32)
        if self.state is None:
            self.initialize(depth, flow, mask, Tcw_gt,
                            timestamp if timestamp is not None else 0.0,
                            image=image)
            return np.eye(4, dtype=np.float32)
        if timestamp is None:
            timestamp = self.frame_id / self.cam.fps
        t_start = time.perf_counter()

        # VIO: preintegrate the IMU over the inter-frame interval
        # (PreintegrateIMU, Tracking.cc:784-887)
        if self.use_imu:
            if self.pipelined and self._vio_event_due(self._last_ts):
                # pipelined _post_step returns before _vio_update; sync the
                # map HERE (same pre-dispatch sync as track_frames) so IMU
                # init / scale refinement still fire on the separate route
                self._finalize_pending_ba()
                self._process_pending()
                self._vio_update(self._last_ts)
            if self._last_ts is not None:
                self._preints.append(
                    self._preintegrate_interval(self._last_ts,
                                                float(timestamp))
                )
        self._last_ts = float(timestamp)

        depth = jnp.asarray(depth)
        flow = jnp.asarray(flow)
        mask = jnp.asarray(mask, jnp.int32)

        self._ensure_out_spec(self.state, depth, flow, mask, gray)
        new_state, out_f, out_i = self._step(self.state, depth, flow, mask,
                                             gray)
        self.state = new_state
        return self._post_step((out_f, out_i), float(timestamp), Tcw_gt,
                               t_start)

    def _post_step(self, out, timestamp, Tcw_gt, t_start):
        """Everything after the per-frame device dispatch: pipelined copy
        scheduling, output fetch/record, BA application, VIO hooks."""
        out_f, out_i = out
        if self.pipelined:
            # ---- software pipeline: hide the fetch + BA round-trips ----
            # Enqueue the device->host copy of THIS frame's outputs NOW,
            # directly behind the step dispatch: the tunneled transport is
            # FIFO, so a d2h issued any later (e.g. next frame, after the
            # next perception dispatch) would wait for ALL newer device work
            # before returning — measured as ~a full extra device-frame of
            # wall time per frame. With the copy in flight, next frame's
            # blocking device_get returns from the local buffer.
            out_f.copy_to_host_async()
            out_i.copy_to_host_async()
            # then (a) fold the PREVIOUS BA result into the map, (b) record
            # the PREVIOUS frame from its already-copied outputs, (c) launch
            # this window's BA asynchronously. The state correction from the
            # in-flight BA is applied as a device-side relative transform, so
            # the critical path has NO blocking host transfer.
            self._finalize_pending_ba()
            self._process_pending()
            self._pending = (out, float(timestamp),
                             None if Tcw_gt is None else np.asarray(Tcw_gt),
                             time.perf_counter() - t_start)
            if self.local_ba and not self.fused_ba and len(self.map) >= 3:
                self._dispatch_window_ba()
            # return the pose LAZILY (device array): materialising it here
            # would block on the whole in-flight chain including the BA we
            # just dispatched, defeating the pipeline
            return self.state.Tcw

        # ---- single batched host fetch -----------------------------
        # join the previous frame's BA results into the same transfer
        if self._pending_ba is not None:
            prob_prev, res_prev = self._pending_ba
            fbuf, ibuf, ba_tw, ba_x = jax.device_get(
                (out[0], out[1], res_prev.Twc, res_prev.points))
            h = unpack_pytree(fbuf, ibuf, self._out_spec)
            self._pending_ba = None
            self._apply_ba_writeback(prob_prev, ba_tw, ba_x)
        else:
            h = self._fetch_outputs(out)
        t_step = time.perf_counter()
        self._record_outputs(h, float(timestamp), Tcw_gt, t_step - t_start)
        Tcw = h.Tcw

        # ---- fused window BA: apply the results that rode the fetch -----
        if self.fused_ba:
            t0 = time.perf_counter()
            Tcw = self._apply_fused_ba(h)
            self.map.lba_time.append(time.perf_counter() - t0)
            if self.use_imu:
                # synchronous mode: map/state/preints are aligned here
                self._vio_update(float(timestamp))
                Tcw = self.map.frames[-1].Tcw
            return np.asarray(Tcw)

        # ---- sliding-window BA (PartialBatchOptimization) ----------
        if self.local_ba and len(self.map) >= 3:
            t0 = time.perf_counter()
            if self.ba_deferred and not self.use_imu:
                self._dispatch_window_ba()
                Tcw = self.state.Tcw
            else:
                Tcw = self._run_window_ba()
            self.map.lba_time.append(time.perf_counter() - t0)

        # ---- VIO init / scale refinement (Tracking.cc:1452-1480) ----
        if self.use_imu:
            self._vio_update(float(timestamp))
            Tcw = jnp.asarray(self.map.frames[-1].Tcw)
        return np.asarray(Tcw)

    def _vio_update(self, timestamp) -> None:
        """IMU initialization / scale refinement (Tracking.cc:1452-1480).
        Must run at a map-synchronous point: every dispatched frame
        recorded, `self.state` on the last recorded frame's world, and
        `self._preints` aligned with the recorded pairs — the pipelined
        paths guarantee this by draining pending outputs first."""
        if timestamp is None:
            return
        if not self.imu_initialized:
            self._try_initialize_imu(float(timestamp))
        else:
            self._try_scale_refinement(float(timestamp))

    def _vio_event_due(self, ts) -> bool:
        """Cheap precondition check for whether _vio_update could possibly
        act at timestamp `ts` (the gating conditions of Tracking.cc:939-949
        and :1046-1077). The pipelined VIO paths only pay the pre-dispatch
        sync (losing the record/compute overlap) on frames where this is
        true — i.e. every frame from the 10-frame/2-s mark until the init
        succeeds, then once per ~10 s for scale refinement."""
        if ts is None:
            return False
        if not self.imu_initialized:
            # no upper frame bound: init retries every frame over a sliding
            # window of the most recent imu_max_frames frames (the reference
            # retries unboundedly, Tracking.cc:1452-1453)
            n = len(self.map) + len(self._pending_q) \
                + (1 if self._pending is not None else 0)
            if n < 10:
                return False
            t0 = self.map.frames[0].timestamp if len(self.map) else 0.0
            return ts - t0 >= 2.0
        return ts - self._last_scale_refine_t >= 10.0

    # ------------------------------------------------------------------
    # Fully-fused per-frame program: perception + depth conversion +
    # tracking step as ONE dispatch. On the tunneled transport each program
    # boundary costs scheduling latency (~1-2 ms), so the realtime pipeline
    # (raw frames in, pose out) runs fastest as a single program per frame.
    # ------------------------------------------------------------------
    def attach_perception(self, model, depth_mode: str,
                          depth_map_factor: float = None, bf: float = None,
                          scale: float = 1.0):
        """Bind a PerceptionModel into the per-frame program; enables
        `track_frames`. `scale` is a fixed BASE metric scale; the effective
        depth scale each dispatch is base x the current IMU scale (mScale,
        Tracking.cc:316-319) and rides as a SCALAR PROGRAM INPUT, so VIO
        initialization / scale refinement never recompile the fused
        program."""
        from vido_slam_tpu.geometry.camera import convert_depth

        dm_factor = (depth_map_factor if depth_map_factor is not None
                     else self.cfg.system.depth_map_factor)
        bf_ = bf if bf is not None else self.cfg.camera.bf
        raw = self._raw_step
        use_fast = self.use_fast
        H, W = self.cam.height, self.cam.width

        # perception weights ride as PACKED jit arguments (one buffer per
        # dtype) rather than closure constants: constants bake a ~0.5 GB
        # executable that a tunneled TPU runtime re-loads for minutes on
        # every process start (see PerceptionModel.__init__)
        self._pp = model._pp
        percept = model.forward_from_packed

        def track_percept(state, out, cur_bgr, scale_in):
            """Tracking step from one PerceptionOutput (device-side)."""
            depth = convert_depth(out.depth_u16, depth_mode, dm_factor, bf_,
                                  scale=scale_in)
            if use_fast:
                gray = (0.299 * cur_bgr[..., 2] + 0.587 * cur_bgr[..., 1]
                        + 0.114 * cur_bgr[..., 0])
            else:
                gray = jnp.zeros((H, W), jnp.float32)
            new_state, outs = raw(state, depth, out.flow,
                                  out.mask.astype(jnp.int32), gray)
            fbuf, ibuf = pack_pytree(outs)
            return new_state, fbuf, ibuf

        def fused(bufs, state, prev_bgr, cur_bgr, scale_in):
            out = percept(bufs, prev_bgr, cur_bgr)
            return track_percept(state, out, cur_bgr, scale_in)

        self._attached = (model, depth_mode, dm_factor, bf_, scale)
        self._percept_base_scale = float(scale)
        self._step_frames = jax.jit(fused)

        # two frames per device program (track_frames_pair): halves the
        # per-program tunnel costs (scheduling + copy turnaround) at the
        # price of one frame of extra latency. Compiled lazily on first use.
        #
        # Batching the pair's perception at N=2 (perception_forward_pair)
        # was MEASURED SLOWER end-to-end on v5e: 36.6 FPS with the detector
        # vmapped (its NMS/LM-style while-loops run both images to the max
        # trip count and the banded ROIAlign matmuls batch badly), 42.3 FPS
        # with only the conv-only depth/flow nets batched — vs 43.3 FPS for
        # the plain sequential form below. XLA's scheduler already hides
        # most per-op latency inside the big fused program, so batch-2
        # mainly adds layout/stacking overhead here.
        def fused2(bufs, state, f0, f1, f2, scale_in):
            state, fA, iA = fused(bufs, state, f0, f1, scale_in)
            state, fB, iB = fused(bufs, state, f1, f2, scale_in)
            return state, fA, iA, fB, iB

        self._step_frames2 = jax.jit(fused2)

    def _effective_scale(self) -> np.float32:
        """Depth scale for the next fused dispatch: the attach-time base
        times the live IMU scale (updated by _vio_update)."""
        return np.float32(self._percept_base_scale * self.imu_scale)

    def track_frames(self, prev_bgr, cur_bgr, Tcw_gt=None, timestamp=None):
        """Process one frame from RAW BGR images (prev, cur) through the
        fused perception+tracking program; returns the camera pose Tcw."""
        assert self._step_frames is not None, "call attach_perception first"
        prev = jnp.asarray(prev_bgr, jnp.float32)
        cur = jnp.asarray(cur_bgr, jnp.float32)
        if self.state is None:
            # first frame: run perception standalone to seed the state
            model, mode, f, bf_, scale = self._attached
            if self._init_perceive is None:
                self._init_perceive = model.make_slam_forward(
                    mode, f, bf_, scale)
            depth, flow, mask = self._init_perceive(prev, cur)
            self.initialize(depth, flow, mask, Tcw_gt,
                            timestamp if timestamp is not None else 0.0)
            return np.eye(4, dtype=np.float32)
        if timestamp is None:
            # index of the frame being dispatched (frame_id lags by the
            # not-yet-recorded in-flight frames in pipelined mode)
            n_inflight = ((1 if self._pending is not None else 0)
                          + len(self._pending_q))
            timestamp = (self.frame_id + n_inflight) / self.cam.fps
        t_start = time.perf_counter()
        if self.use_imu:
            if self.pipelined and self._vio_event_due(self._last_ts):
                # sync point BEFORE the dispatch, only when an IMU event
                # could fire: its scale change feeds this frame's depth
                # conversion and must transform state + map together (see
                # _vio_update); in the synchronous mode _post_step handles
                # it after recording
                self._finalize_pending_ba()
                self._process_pending()
                self._vio_update(self._last_ts)
            # PreintegrateIMU over the inter-frame interval (Tracking.cc:784)
            self._preints.append(
                self._preintegrate_interval(self._last_ts, float(timestamp)))
        self._last_ts = float(timestamp)
        if self._out_spec is None:
            H, W = self.cam.height, self.cam.width
            self._ensure_out_spec(
                self.state,
                jax.ShapeDtypeStruct((H, W), jnp.float32),
                jax.ShapeDtypeStruct((H, W, 2), jnp.float32),
                jax.ShapeDtypeStruct((H, W), jnp.int32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            )
        new_state, out_f, out_i = self._step_frames(self._pp, self.state,
                                                    prev, cur,
                                                    self._effective_scale())
        self.state = new_state
        return self._post_step((out_f, out_i), float(timestamp), Tcw_gt,
                               t_start)

    def track_frames_pair(self, f0, f1, f2, Tcw_gt=None, timestamps=None):
        """Process TWO frames (transitions f0->f1 and f1->f2) in ONE device
        program — the per-program tunnel cost (scheduling + copy turnaround)
        amortises over two frames. Requires attach_perception and the
        pipelined fused-BA configuration (records lag up to two frames
        until finish()). Frame k's inputs are perception(f_k, f_k+1), like
        track_frames — so the FIRST call only initialises frame 0 from
        (f0, f1) and returns; subsequent calls must chain at odd offsets
        ((f1,f2,f3), (f3,f4,f5), ...), each processing frames k and k+1.
        `Tcw_gt`: optional (gtA, gtB) pair for the two frames.
        `timestamps`: optional (tA, tB) REAL sensor timestamps of the two
        frames; required for VIO on clips whose camera clock is not exactly
        index/cfg.fps-aligned, since the IMU samples carry real timestamps
        and prepare_segments selects by the (t0, t1] windows."""
        assert self._step_frames2 is not None, "call attach_perception first"
        assert self.pipelined and self.fused_ba, (
            "track_frames_pair requires pipelined=True, fused_ba=True")
        f0 = jnp.asarray(f0, jnp.float32)
        f1 = jnp.asarray(f1, jnp.float32)
        f2 = jnp.asarray(f2, jnp.float32)
        if self.state is None:
            model, mode, fct, bf_, scale = self._attached
            if self._init_perceive is None:
                self._init_perceive = model.make_slam_forward(
                    mode, fct, bf_, scale)
            depth, flow, mask = self._init_perceive(f0, f1)
            self.initialize(depth, flow, mask, None, 0.0)
            return np.eye(4, dtype=np.float32)
        if self._out_spec is None:
            H, W = self.cam.height, self.cam.width
            self._ensure_out_spec(
                self.state,
                jax.ShapeDtypeStruct((H, W), jnp.float32),
                jax.ShapeDtypeStruct((H, W, 2), jnp.float32),
                jax.ShapeDtypeStruct((H, W), jnp.int32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            )
        vio_ts = None
        if self.use_imu:
            # sync point BEFORE the dispatch ONLY when an IMU event could
            # fire (the event's scale change feeds this pair's depth
            # conversion and must transform state + map together): record
            # the previous pair, then run init / scale refinement on the
            # now-synchronous map. On ordinary frames the VO path's
            # record/compute overlap is kept; preintegration runs after
            # the dispatch, hidden behind the device compute.
            if self._vio_event_due(self._last_ts):
                self._drain_pending_q()
                self._vio_update(self._last_ts)
            if timestamps is not None:
                tsA, tsB = float(timestamps[0]), float(timestamps[1])
            else:
                fps_ = self.cam.fps
                base0 = self.frame_id + len(self._pending_q)
                tsA, tsB = base0 / fps_, (base0 + 1) / fps_
            vio_ts = (self._last_ts, tsA, tsB)
        t_start = time.perf_counter()
        new_state, fA, iA, fB, iB = self._step_frames2(
            self._pp, self.state, f0, f1, f2, self._effective_scale())
        self.state = new_state
        if vio_ts is not None:
            # PreintegrateIMU for the pair's two intervals (Tracking.cc:784)
            t_prev, tA, tB = vio_ts
            self._preints.append(self._preintegrate_interval(t_prev, tA))
            self._preints.append(self._preintegrate_interval(tA, tB))
        # copies ride directly behind the dispatch on the FIFO transport
        for b in (fA, iA, fB, iB):
            b.copy_to_host_async()
        # record the PREVIOUS pair while this one computes
        self._drain_pending_q()
        base = self.frame_id
        if timestamps is not None:
            recA, recB = float(timestamps[0]), float(timestamps[1])
        else:
            fps = self.cam.fps
            recA, recB = base / fps, (base + 1) / fps
        gA, gB = (None, None) if Tcw_gt is None else Tcw_gt
        dt = time.perf_counter() - t_start
        self._pending_q.append(((fA, iA), recA,
                                None if gA is None else np.asarray(gA), dt))
        self._pending_q.append(((fB, iB), recB,
                                None if gB is None else np.asarray(gB), dt))
        self._last_ts = recB
        return self.state.Tcw     # lazy device array (see _post_step)

    def _drain_pending_q(self):
        for out, ts, tgt, dt in self._pending_q:
            h = self._fetch_outputs(out)
            self._record_outputs(h, ts, tgt, dt)
            self._apply_fused_ba(h)
        self._pending_q = []

    # ------------------------------------------------------------------
    def finish(self):
        """Drain deferred work: pending frame outputs (pipelined mode) and
        the in-flight window-BA result."""
        self._drain_pending_q()
        self._finalize_pending_ba()
        if self.pipelined:
            self._process_pending()
            if self.local_ba and not self.fused_ba and len(self.map) >= 3:
                self._dispatch_window_ba()
                self._finalize_pending_ba()

    def _process_pending(self):
        if self._pending is None:
            return
        out, ts, tgt, dt = self._pending
        self._pending = None
        h = self._fetch_outputs(out)
        self._record_outputs(h, ts, tgt, dt)
        if self.fused_ba:
            self._apply_fused_ba(h)

    def _dispatch_window_ba(self):
        """Launch the window BA asynchronously over the recorded map and
        apply the pose correction to the device state as a relative
        transform: T_t' = T_t * inv(T_prev_orig) * T_prev_opt."""
        from vido_slam_tpu.estimation.assembly import assemble_static_window
        from vido_slam_tpu.estimation.window_ba import (
            pack_window_problem, packed_Twc0_last, solve_window_ba_packed,
        )

        W = self.cfg.system.window_size
        prob = assemble_static_window(self.map, self.cam, W, self.ba_max_points)
        frame_valid = np.zeros(W, bool)
        frame_valid[prob.pad:] = True
        buf = jax.device_put(pack_window_problem(prob, frame_valid))
        P = prob.X0.shape[0]
        res = solve_window_ba_packed(buf, W, P, max_iters=self.ba_iters)
        # corr = inv(Tcw_orig_prev) * Tcw_opt_prev = Twc0[-1] * inv(Twc[-1]),
        # computed entirely on device (no host round-trip)
        corr = compose(packed_Twc0_last(buf, W, P), inverse_se3(res.Twc[-1]))
        self.state = self.state._replace(Tcw=compose(self.state.Tcw, corr))
        self._pending_ba = (prob, res)

    def _finalize_pending_ba(self):
        if self._pending_ba is None:
            return
        prob, res = self._pending_ba
        self._pending_ba = None
        Twc, X = jax.device_get((res.Twc, res.points))
        self._apply_ba_writeback(prob, Twc, X)

    def _apply_ba_writeback(self, prob, Twc, X):
        """Map write-back of fetched BA results. The window is anchored at
        the frame count the problem was assembled with (the map may have
        grown by one since when the fetch is deferred)."""
        idx = {f.frame_id: f for f in self.map.frames}
        for i, fid in enumerate(prob.frame_ids):
            rec = idx.get(fid)
            if rec is None:
                continue
            rec.Tcw = np.linalg.inv(Twc[prob.pad + i]).astype(np.float32)
        pv = np.asarray(prob.point_valid)
        W = self.cfg.system.window_size
        for wi in range(prob.pad, W):
            fid = prob.frame_ids[wi - prob.pad]
            rec = idx.get(fid)
            if rec is None:
                continue
            sl = prob.slots[wi]
            m = (sl >= 0) & pv
            p3d = np.array(rec.stat_3d)
            p3d[sl[m]] = X[m]
            rec.stat_3d = p3d

    # ------------------------------------------------------------------
    def _record_outputs(self, h, timestamp, Tcw_gt, step_time):
        # ---- host bookkeeping: tracking ids ------------------------
        bin_track_id, objects = self.object_tracker.assign_ids(h.stats)
        sem_to_tid = np.zeros(MAX_SEM, np.int32)
        sem_to_tid[: bin_track_id.shape[0]] = bin_track_id
        labels = np.asarray(h.point_labels)
        labels = np.where(labels > 0, sem_to_tid[np.clip(labels, 0, MAX_SEM - 1)], labels)

        obs_list: List[ObjectObservation] = []
        for k in range(self.max_objects):
            if not h.obj_active[k]:
                continue
            sem_v = int(h.obj_sem_values[k])
            status = bool(h.obj_ok[k])
            if not status:
                self.object_tracker.mark_failed(sem_v)
            obs_list.append(ObjectObservation(
                track_id=int(sem_to_tid[sem_v]),
                sem_value=sem_v,
                motion=h.obj_motion[k],
                speed_kmh=float(h.obj_speed[k]),
                centroid=h.obj_centroid[k],
                num_inliers=int(h.obj_num_inliers[k]),
                status=status,
            ))

        # world-frame unprojections recomputed here instead of fetched
        # (pure functions of uv/depth/Tcw; saves ~84 KB of transport/frame).
        # In light record mode the per-point fields arrive (0,)-shaped and
        # the record simply carries empty point arrays.
        Tcw_np = np.asarray(h.Tcw, np.float32)
        stat_3d = self._unproject_np(h.stat_uv, h.stat_depth, Tcw_np)
        obj_3d = self._unproject_np(h.obj_uv, h.obj_depth, Tcw_np)
        self.map.add_frame(FrameRecord(
            frame_id=self.frame_id,
            timestamp=float(timestamp),
            Tcw=Tcw_np,
            Tcw_gt=None if Tcw_gt is None else np.asarray(Tcw_gt),
            stat_uv=h.stat_uv, stat_depth=h.stat_depth,
            stat_valid=h.stat_valid, stat_is_new=h.stat_is_new,
            stat_3d=stat_3d,
            obj_uv=h.obj_uv, obj_depth=h.obj_depth, obj_valid=h.obj_valid,
            obj_is_new=h.obj_is_new, obj_sem=np.asarray(h.obj_sem, np.int32),
            obj_label=labels.astype(np.int32), obj_3d=obj_3d,
            objects=obs_list,
            timing={"track_step": step_time},
            cam_motion=np.asarray(h.cam_motion),
        ))
        self.frame_id += 1

    def _unproject_np(self, uv, depth, Tcw):
        """Host-side unproject_to_world counterpart (f32 numpy)."""
        cam = self.cam
        x = (uv[:, 0] - float(cam.cx)) * depth / float(cam.fx)
        y = (uv[:, 1] - float(cam.cy)) * depth / float(cam.fy)
        xc = np.stack([x, y, depth], axis=-1).astype(np.float32)
        Twc = np.linalg.inv(Tcw)
        return (xc @ Twc[:3, :3].T.astype(np.float32)
                + Twc[:3, 3].astype(np.float32)).astype(np.float32)

    # ------------------------------------------------------------------
    def run_full_batch(self, max_frames: int = 64, max_static: int = 2000,
                       cg_iters: int = 60, max_iters: int = 15):
        """FullBatchOptimization (Optimizer.cc:1235-2178): whole-sequence
        BA with object motions and dynamic points; results go to the
        REFINED slots (map.refined_poses / refined_motions), mirroring
        vmCameraPose_RF / vmRigidMotion_RF (Optimizer.cc:2116-2133)."""
        from vido_slam_tpu.estimation.assembly import assemble_full_problem
        from vido_slam_tpu.estimation.full_ba import solve_full_ba

        assert not self.record_light, (
            "run_full_batch needs per-point FrameRecords; construct the "
            "Tracker with record='full' (auto picks it for KITTI mode)")
        prob, stat, motion_ids = assemble_full_problem(
            self.map, self.cam, max_frames, max_static, self.max_objects
        )
        res = solve_full_ba(prob, max_iters=max_iters, cg_iters=cg_iters)
        Twc, H = jax.device_get((res.Twc, res.H))
        pad = stat.pad
        n = len(stat.frame_ids)
        self.map.refined_poses = np.stack(
            [np.linalg.inv(Twc[pad + i]).astype(np.float32) for i in range(n)]
        )
        refined: dict = {}
        mv = np.asarray(prob.motion_valid)
        for fi in range(n):
            f = pad + fi
            for k in range(self.max_objects):
                tid = int(motion_ids[f, k])
                if tid >= 0 and mv[f, k]:
                    refined.setdefault(tid, {})[stat.frame_ids[fi]] = H[f, k]
        self.map.refined_motions = refined
        return res

    # ------------------------------------------------------------------
    def _apply_fused_ba(self, h) -> np.ndarray:
        """Map write-back of the fused in-step window BA (the device-side
        PartialBatchOptimization): refined window poses overwrite the last
        nf records; refined points land in the newest record's slots (each
        record received its refinement when it was the window head)."""
        W = h.ba_Twc.shape[0]
        nf = min(int(h.ba_nframes), W, len(self.map))
        recs = self.map.frames[-nf:]
        for i, rec in enumerate(recs):
            rec.Tcw = np.linalg.inv(h.ba_Twc[W - nf + i]).astype(np.float32)
        ok = np.asarray(h.ba_point_ok)
        if ok.size and ok.any():
            p3d = np.array(recs[-1].stat_3d)
            p3d[np.asarray(h.ba_slots)[ok]] = np.asarray(h.ba_points)[ok]
            recs[-1].stat_3d = p3d
        return recs[-1].Tcw

    def _run_window_ba(self):
        """Assemble + solve the static window BA and write results back
        (reference Tracking.cc:1431-1447 -> Optimizer.cc:43-1228; partial
        write-back semantics of Optimizer.cc:1056-1142)."""
        from vido_slam_tpu.estimation.assembly import assemble_static_window
        from vido_slam_tpu.estimation.window_ba import (
            pack_window_problem, solve_window_ba_packed,
        )

        W = self.cfg.system.window_size
        prob = assemble_static_window(self.map, self.cam, W, self.ba_max_points)
        frame_valid = np.zeros(W, bool)
        frame_valid[prob.pad:] = True
        # single packed host->device transfer: on a tunneled transport each
        # put is a serialized ~14 ms RPC, so 8 separate leaves would cost
        # ~100 ms of latency per frame (measured)
        buf = jax.device_put(pack_window_problem(prob, frame_valid))
        res = solve_window_ba_packed(
            buf, W, prob.X0.shape[0], max_iters=self.ba_iters,
        )
        # the updated current pose feeds the next frame's tracking without a
        # host round-trip; the host copy comes from the same fetch below
        self.state = self.state._replace(Tcw=inverse_se3(res.Twc[-1]))
        Twc, X = jax.device_get((res.Twc, res.points))
        # write back poses
        recs = self.map.frames[len(self.map) - (W - prob.pad):]
        for i, rec in enumerate(recs):
            rec.Tcw = np.linalg.inv(Twc[prob.pad + i]).astype(np.float32)
        # write back optimized points to every observation slot
        pv = np.asarray(prob.point_valid)
        for wi in range(prob.pad, W):
            sl = prob.slots[wi]
            m = (sl >= 0) & pv
            p3d = np.array(recs[wi - prob.pad].stat_3d)
            p3d[sl[m]] = X[m]
            recs[wi - prob.pad].stat_3d = p3d
        return recs[-1].Tcw
