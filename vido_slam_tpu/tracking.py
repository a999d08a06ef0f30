"""Per-frame tracking orchestration — Tracking::GrabImageRGBD / Track()
(reference vido_slam/src/Tracking.cc:283-782, 1081-1509) rebuilt TPU-first.

Structure per frame (VO mode):
  1. inherit correspondences: propagate last frame's feature slots through
     the stored flow, re-reading depth/mask at the new positions
     (Tracking.cc:369-430);
  2. camera pose: parallel PnP-RANSAC vs constant-velocity model + LM refine
     (GetInitModelCam + PoseOptimizationNew, Tracking.cc:1125-1136);
  3. scene flow of object points (GetSceneFlowObj, :1582-1668);
  4. object segmentation stats on device + tracking-id bookkeeping on host
     (DynObjTracking, :1670-1912);
  5. per-object motion: RANSAC + LM, vmapped over a fixed object budget
     (GetInitModelObj + PoseOptimizationObjMot, :1192-1305); speed =
     |t - (I-R) c| * 36 km/h (:1295-1302); < 50 inliers marks the object
     failed (:1218-1228);
  6. feature renewal into fixed slots (RenewFrameInfo, :2959-3289);
  7. push the frame into the map.

All numeric phases are jitted fixed-shape device programs; the host only
does tiny id bookkeeping and map appends.
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
)
from vido_slam_tpu.frontend.features import (
    FeatureSet,
    propagate_features,
    sample_background_features,
    sample_object_points,
)
from vido_slam_tpu.frontend.objects import (
    MAX_SEM,
    ObjectTracker,
    assign_point_labels,
    compute_object_stats,
)
from vido_slam_tpu.frontend.renewal import renew_features
from vido_slam_tpu.frontend.sceneflow import scene_flow_world, unproject_to_world
from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.geometry.se3 import compose, inverse_se3
from vido_slam_tpu.slam_map import FrameRecord, ObjectObservation, SlamMap

MIN_OBJ_INLIERS = 50  # Tracking.cc:1218


class TrackState(NamedTuple):
    """Device-side persistent state between frames."""

    stat: FeatureSet
    obj: FeatureSet
    Tcw: jnp.ndarray
    velocity: jnp.ndarray
    has_velocity: jnp.ndarray


@partial(jax.jit, static_argnames=("max_objects",))
def _object_motion_phase(
    keys,
    Tcw,
    pts3d_pre,
    obs_uv,
    obj_masks,          # (K, N) bool per-object point masks
    H_mm,               # (K, 4, 4) motion-model hypotheses
    has_mm,             # (K,) bool
    active,             # (K,) bool — slot holds a real object
    cam: Camera,
    max_objects: int,
):
    def one(key, mask, Hm, hm):
        est = estimate_object_motion(
            key, Tcw, pts3d_pre, obs_uv, mask, cam, Hm, hm
        )
        # centroid of the object's pre-frame world points (Tracking.cc:1195-1204)
        w = mask.astype(jnp.float32)
        c = jnp.sum(pts3d_pre * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
        sp_v = est.T[:3, 3] - (jnp.eye(3) - est.T[:3, :3]) @ c
        speed = jnp.linalg.norm(sp_v) * 36.0  # km/h at 10 fps (Tracking.cc:1299)
        return est.T, est.inliers, est.num_inliers, c, speed

    H, inl, n_inl, cent, speed = jax.vmap(one)(keys, obj_masks, H_mm, has_mm)
    ok = active & (n_inl >= MIN_OBJ_INLIERS)
    eye = jnp.broadcast_to(jnp.eye(4), (max_objects, 4, 4))
    H = jnp.where(ok[:, None, None], H, eye)
    speed = jnp.where(ok, speed, 0.0)
    return H, inl, n_inl, cent, speed, ok


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
        self.map = SlamMap()
        self.object_tracker = ObjectTracker()
        self.state: Optional[TrackState] = None
        self.frame_id = 0
        self.local_ba = local_ba
        self.ba_max_points = ba_max_points
        self.ba_iters = ba_iters
        # host mirror: track_id -> last world-frame motion (for motion model)
        self._last_motion: dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _sample_fresh(self, depth, flow, mask):
        kb = self._next_key()
        fresh_bg = sample_background_features(
            kb, mask, depth, flow,
            n=self.n_bg, th_depth=self.cfg.system.th_depth_bg,
        )
        fresh_obj = sample_object_points(
            mask, depth, flow,
            n=self.n_obj, th_depth=self.cfg.system.th_depth_obj,
        )
        return fresh_bg, fresh_obj

    # ------------------------------------------------------------------
    def initialize(self, depth, flow, mask, Tcw_gt=None, timestamp=0.0):
        """First frame (Tracking::Initialization, Tracking.cc:1512-1580):
        sample features, pose = identity, push to map."""
        depth = jnp.asarray(depth)
        flow = jnp.asarray(flow)
        mask = jnp.asarray(mask, jnp.int32)
        stat, obj = self._sample_fresh(depth, flow, mask)
        Tcw = jnp.eye(4)
        self.state = TrackState(
            stat=stat,
            obj=obj,
            Tcw=Tcw,
            velocity=jnp.eye(4),
            has_velocity=jnp.bool_(False),
        )
        self._record_frame(
            Tcw, stat, jnp.ones(self.n_bg, bool), obj,
            jnp.full((self.n_obj,), -1, jnp.int32), jnp.ones(self.n_obj, bool),
            [], Tcw_gt, timestamp, {},
        )
        self.frame_id += 1

    # ------------------------------------------------------------------
    def track(self, depth, flow, mask, Tcw_gt=None, timestamp=None):
        """Process one frame; returns the new camera pose (4,4) np array."""
        if self.state is None:
            self.initialize(depth, flow, mask, Tcw_gt,
                            timestamp if timestamp is not None else 0.0)
            return np.eye(4, dtype=np.float32)
        depth = jnp.asarray(depth)
        flow = jnp.asarray(flow)
        mask = jnp.asarray(mask, jnp.int32)
        if timestamp is None:
            timestamp = self.frame_id / self.cam.fps
        timing = {}
        st = self.state

        # -- 1. inherit correspondences ---------------------------------
        t0 = time.perf_counter()
        cur_stat = propagate_features(
            st.stat, depth, mask, flow, th_depth=self.cfg.system.th_depth_bg
        )
        # background features must stay on background in the new frame
        cur_stat = cur_stat._replace(valid=cur_stat.valid & (cur_stat.sem == 0))
        cur_obj = propagate_features(
            st.obj, depth, mask, flow, th_depth=self.cfg.system.th_depth_obj
        )
        timing["mask_update"] = time.perf_counter() - t0

        # -- 2. camera pose ---------------------------------------------
        t0 = time.perf_counter()
        pts3d_stat = unproject_to_world(self.cam, st.stat.uv, st.stat.depth, st.Tcw)
        T_mm = jnp.where(
            st.has_velocity, compose(st.velocity, st.Tcw), st.Tcw
        )
        est = estimate_camera_pose(
            self._next_key(), pts3d_stat, cur_stat.uv,
            cur_stat.valid & st.stat.valid, self.cam, T_mm,
        )
        Tcw = est.T
        velocity = compose(Tcw, inverse_se3(st.Tcw))
        timing["cam_pose"] = time.perf_counter() - t0

        # -- 3/4. scene flow + object tracking --------------------------
        t0 = time.perf_counter()
        obj_valid = cur_obj.valid & st.obj.valid
        pts3d_obj_pre = unproject_to_world(self.cam, st.obj.uv, st.obj.depth, st.Tcw)
        flow3d, sf_norm, sf_ok = scene_flow_world(
            self.cam,
            st.obj.uv, st.obj.depth, st.Tcw,
            cur_obj.uv, cur_obj.depth, Tcw,
            st.obj.sem, cur_obj.sem, obj_valid,
        )
        stats = compute_object_stats(
            cur_obj.uv, cur_obj.sem, st.obj.sem, sf_norm, cur_obj.depth, sf_ok,
            height=self.cam.height, width=self.cam.width,
            sf_mg_thres=self.cfg.system.sf_mg_thres,
            sf_ds_thres=self.cfg.system.sf_ds_thres,
            th_depth_obj=self.cfg.system.th_depth_obj,
        )
        bin_track_id, objects = self.object_tracker.assign_ids(stats)
        point_labels = assign_point_labels(
            cur_obj.sem, sf_ok, stats, jnp.asarray(bin_track_id)
        )
        timing["obj_track"] = time.perf_counter() - t0

        # -- 5. per-object motion ---------------------------------------
        t0 = time.perf_counter()
        K = self.max_objects
        objects = objects[:K]
        sem_values = np.zeros(K, np.int32)
        H_mm = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        has_mm = np.zeros(K, bool)
        active = np.zeros(K, bool)
        for k, ob in enumerate(objects):
            sem_values[k] = ob.sem_value
            active[k] = True
            if ob.track_id in self._last_motion:
                H_mm[k] = self._last_motion[ob.track_id]
                has_mm[k] = True
        sem_values_j = jnp.asarray(sem_values)
        obj_masks = (
            (cur_obj.sem[None, :] == sem_values_j[:, None])
            & (sem_values_j[:, None] > 0)
            & (point_labels[None, :] > 0)
        )
        keys = jax.random.split(self._next_key(), K)
        H, obj_inl, n_inl, cent, speed, ok = _object_motion_phase(
            keys, Tcw, pts3d_obj_pre, cur_obj.uv, obj_masks,
            jnp.asarray(H_mm), jnp.asarray(has_mm), jnp.asarray(active),
            self.cam, K,
        )
        n_inl_np = np.asarray(n_inl)
        ok_np = np.asarray(ok)
        H_np = np.asarray(H)
        cent_np = np.asarray(cent)
        speed_np = np.asarray(speed)
        obs_list: List[ObjectObservation] = []
        self._last_motion = {}
        for k, ob in enumerate(objects):
            status = bool(ok_np[k])
            if not status:
                self.object_tracker.mark_failed(ob.sem_value)
            else:
                self._last_motion[ob.track_id] = H_np[k]
            obs_list.append(
                ObjectObservation(
                    track_id=ob.track_id,
                    sem_value=ob.sem_value,
                    motion=H_np[k],
                    speed_kmh=float(speed_np[k]),
                    centroid=cent_np[k],
                    num_inliers=int(n_inl_np[k]),
                    status=status,
                )
            )
        # failed objects' points drop to -1 (Tracking.cc:1391-1398)
        failed_sems = jnp.asarray(
            [o.sem_value for o, okk in zip(objects, ok_np) if not okk] or [-2],
            jnp.int32,
        )
        point_labels = jnp.where(
            jnp.isin(cur_obj.sem, failed_sems), -1, point_labels
        )
        # object-point inliers across all objects
        obj_inlier_any = jnp.any(obj_inl & obj_masks, axis=0)
        timing["obj_motion"] = time.perf_counter() - t0

        # -- 6. renewal --------------------------------------------------
        t0 = time.perf_counter()
        fresh_bg, fresh_obj = self._sample_fresh(depth, flow, mask)
        renewed_stat, stat_new = renew_features(
            cur_stat, est.inliers, fresh_bg,
            height=self.cam.height, width=self.cam.width,
        )
        keep_obj = obj_inlier_any & (point_labels > 0)
        renewed_obj, obj_new = renew_features(
            cur_obj, keep_obj, fresh_obj,
            height=self.cam.height, width=self.cam.width,
        )
        # freshly filled slots take their bin's label (kept slots keep theirs)
        fresh_labels = assign_point_labels(
            renewed_obj.sem, renewed_obj.valid, stats, jnp.asarray(bin_track_id)
        )
        point_labels = jnp.where(obj_new, fresh_labels, point_labels)
        timing["map_update"] = time.perf_counter() - t0

        # -- 7. record + advance state ----------------------------------
        self._record_frame(
            Tcw, renewed_stat, stat_new, renewed_obj, point_labels, obj_new,
            obs_list, Tcw_gt, timestamp, timing,
            cam_motion=np.asarray(inverse_se3(velocity)),
        )
        self.state = TrackState(
            stat=renewed_stat,
            obj=renewed_obj,
            Tcw=Tcw,
            velocity=velocity,
            has_velocity=jnp.bool_(True),
        )
        self.frame_id += 1

        # -- 8. sliding-window BA (PartialBatchOptimization, every frame) --
        if self.local_ba and len(self.map) >= 3:
            t0 = time.perf_counter()
            Tcw = self._run_window_ba()
            self.map.lba_time.append(time.perf_counter() - t0)
        return np.asarray(Tcw)

    # ------------------------------------------------------------------
    def _run_window_ba(self):
        """Assemble + solve the static window BA and write results back
        (reference Tracking.cc:1431-1447 -> Optimizer.cc:43-1228; partial
        write-back semantics of Optimizer.cc:1056-1142)."""
        from vido_slam_tpu.estimation.assembly import assemble_static_window
        from vido_slam_tpu.estimation.window_ba import solve_window_ba

        W = self.cfg.system.window_size
        prob = assemble_static_window(self.map, self.cam, W, self.ba_max_points)
        frame_valid = np.zeros(W, bool)
        frame_valid[prob.pad:] = True
        res = solve_window_ba(
            jnp.asarray(prob.Twc0),
            jnp.asarray(prob.odom),
            jnp.asarray(prob.odom_valid),
            jnp.asarray(prob.X0),
            jnp.asarray(prob.obs),
            jnp.asarray(prob.obs_valid),
            jnp.asarray(prob.point_valid),
            jnp.asarray(frame_valid),
            max_iters=self.ba_iters,
        )
        Twc = np.asarray(res.Twc)
        X = np.asarray(res.points)
        # write back poses
        recs = self.map.frames[len(self.map) - (W - prob.pad):]
        for i, rec in enumerate(recs):
            rec.Tcw = np.linalg.inv(Twc[prob.pad + i]).astype(np.float32)
        # write back optimized points to every observation slot
        pv = np.asarray(prob.point_valid)
        for wi in range(prob.pad, W):
            sl = prob.slots[wi]
            m = (sl >= 0) & pv
            p3d = np.array(recs[wi - prob.pad].stat_3d)  # asarray views of
            p3d[sl[m]] = X[m]                            # jax arrays are RO
            recs[wi - prob.pad].stat_3d = p3d
        # current pose feeds the next frame's tracking
        Tcw_cur = jnp.asarray(recs[-1].Tcw)
        self.state = self.state._replace(Tcw=Tcw_cur)
        return Tcw_cur

    # ------------------------------------------------------------------
    def _record_frame(
        self, Tcw, stat, stat_new, obj, obj_label, obj_new,
        objects, Tcw_gt, timestamp, timing, cam_motion=None,
    ):
        stat_3d = unproject_to_world(self.cam, stat.uv, stat.depth, Tcw)
        obj_3d = unproject_to_world(self.cam, obj.uv, obj.depth, Tcw)
        self.map.add_frame(
            FrameRecord(
                frame_id=self.frame_id,
                timestamp=float(timestamp),
                Tcw=np.asarray(Tcw),
                Tcw_gt=None if Tcw_gt is None else np.asarray(Tcw_gt),
                stat_uv=np.asarray(stat.uv),
                stat_depth=np.asarray(stat.depth),
                stat_valid=np.asarray(stat.valid),
                stat_is_new=np.asarray(stat_new),
                stat_3d=np.asarray(stat_3d),
                obj_uv=np.asarray(obj.uv),
                obj_depth=np.asarray(obj.depth),
                obj_valid=np.asarray(obj.valid),
                obj_is_new=np.asarray(obj_new),
                obj_sem=np.asarray(obj.sem),
                obj_label=np.asarray(obj_label),
                obj_3d=np.asarray(obj_3d),
                objects=objects,
                timing=timing,
                cam_motion=cam_motion,
            )
        )
