"""End-to-end mono VO + dynamic-object tracking on a synthetic sequence."""

import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.config import config_from_dict
from vido_slam_tpu.io.synthetic import SyntheticSequence, simple_scene
from vido_slam_tpu.metrics import ate_rmse, rpe_camera, speed_error
from vido_slam_tpu.tracking import Tracker


def make_config(scene):
    cam = scene.cam
    return config_from_dict(
        {
            "Camera.width": cam.width,
            "Camera.height": cam.height,
            "Camera.fx": float(cam.fx),
            "Camera.fy": float(cam.fy),
            "Camera.cx": float(cam.cx),
            "Camera.cy": float(cam.cy),
            "Camera.bf": float(cam.bf),
            "ThDepthBG": 80.0,
            "ThDepthOBJ": 60.0,
            "MaxTrackPointBG": 1200,
            "MaxTrackPointOBJ": 800,
            "WINDOW_SIZE": 6,
        }
    )


@pytest.fixture(scope="module")
def sequence():
    scene = simple_scene(width=256, height=160, moving_box=True, box_speed=0.6)
    # forward motion with slight yaw: camera-frame per-step motion
    from vido_slam_tpu.geometry.se3 import make_se3
    from vido_slam_tpu.geometry.so3 import exp_so3

    dT = np.asarray(
        make_se3(exp_so3(jnp.array([0.0, 0.01, 0.0])), jnp.array([0.02, 0.0, -0.4]))
    )
    return scene, SyntheticSequence(scene, [dT], n_frames=8)


@pytest.fixture(scope="module")
def tracked(sequence):
    scene, seq = sequence
    cfg = make_config(scene)
    tracker = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0)
    for fr in seq.frames:
        tracker.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
    return scene, seq, tracker


class TestCameraTrajectory:
    def test_ate_small(self, tracked):
        _, seq, tracker = tracked
        est = tracker.map.poses
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        ate = ate_rmse(est, gt, align=False)
        assert ate < 0.05, f"ATE {ate}"

    def test_rpe_small(self, tracked):
        _, seq, tracker = tracked
        est = tracker.map.poses
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        rpe = rpe_camera(est, gt)
        assert rpe["rpe_trans_mean"] < 0.02
        assert rpe["rpe_rot_deg_mean"] < 0.2


class TestObjectTracking:
    def test_object_found_with_consistent_id(self, tracked):
        _, seq, tracker = tracked
        ids = tracker.map.track_ids()
        assert len(ids) == 1, f"expected one tracked object, got {ids}"

    def test_object_motion_accuracy(self, tracked):
        _, seq, tracker = tracked
        tid = tracker.map.track_ids()[0]
        motions = tracker.map.object_motions(tid)
        assert len(motions) >= 4
        H_gt = seq.frames[0].box_motions[0]
        for fid, H in motions.items():
            err_t = np.linalg.norm(H[:3, 3] - H_gt[:3, 3])
            assert err_t < 0.08, f"frame {fid}: t error {err_t}"

    def test_object_speed(self, tracked):
        scene, seq, tracker = tracked
        tid = tracker.map.track_ids()[0]
        frames_with_obj = [
            f for f in tracker.map.frames
            if any(o.track_id == tid and o.status for o in f.objects)
        ]
        H_gt = seq.frames[0].box_motions[0]
        errs = []
        for f in frames_with_obj:
            ob = next(o for o in f.objects if o.track_id == tid)
            errs.append(speed_error(ob.speed_kmh, H_gt, ob.centroid, fps=10.0))
        # gt speed = 0.6 m/frame * 36 = 21.6 km/h; allow 15% deviation
        assert np.mean(errs) < 3.5, f"speed errors {errs}"

    def test_static_scene_has_no_objects(self):
        scene = simple_scene(width=256, height=160, moving_box=False)
        from vido_slam_tpu.geometry.se3 import make_se3

        dT = np.asarray(make_se3(jnp.eye(3), jnp.array([0.0, 0.0, -0.3])))
        seq = SyntheticSequence(scene, [dT], n_frames=5)
        cfg = make_config(scene)
        tracker = Tracker(cfg, n_bg=800, n_obj=2000, max_objects=4, seed=1)
        for fr in seq.frames:
            tracker.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        assert tracker.map.track_ids() == []


class TestPipelinedMode:
    def test_pipelined_matches_sync(self, sequence):
        """Pipelined (one-frame-delayed host processing) must record the
        same number of frames and a near-identical trajectory."""
        scene, seq = sequence
        cfg = make_config(scene)

        t_sync = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0)
        for fr in seq.frames:
            t_sync.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)

        t_pipe = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                         pipelined=True)
        for fr in seq.frames:
            t_pipe.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        t_pipe.finish()

        assert len(t_pipe.map) == len(seq.frames)
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        ate_sync = ate_rmse(t_sync.map.poses, gt, align=False)
        ate_pipe = ate_rmse(t_pipe.map.poses, gt, align=False)
        # the one-frame-delayed BA correction changes poses slightly but
        # accuracy must stay in the same class
        assert ate_pipe < max(2.5 * ate_sync, 0.05), (ate_pipe, ate_sync)

    def test_objects_still_tracked(self, sequence):
        scene, seq = sequence
        cfg = make_config(scene)
        t_pipe = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                         pipelined=True)
        for fr in seq.frames:
            t_pipe.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        t_pipe.finish()
        assert len(t_pipe.map.track_ids()) == 1


class TestJointFlowMode:
    """bJoint path: PoseOptimizationFlow2Cam/Flow2 in the tracking loop."""

    def test_trajectory_and_object(self, sequence):
        scene, seq = sequence
        cfg = make_config(scene)
        tr = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                     joint_flow=True)
        for fr in seq.frames:
            tr.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        est = tr.map.poses
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        ate = ate_rmse(est, gt, align=False)
        assert ate < 0.05, f"joint ATE {ate}"
        assert len(tr.map.track_ids()) == 1
        tid = tr.map.track_ids()[0]
        H_gt = seq.frames[0].box_motions[0]
        for fid, H in tr.map.object_motions(tid).items():
            assert np.linalg.norm(H[:3, 3] - H_gt[:3, 3]) < 0.1, fid


class TestFusedBA:
    """Device-side window BA fused into the per-frame program."""

    def test_matches_host_ba_path(self, sequence):
        scene, seq = sequence
        cfg = make_config(scene)
        t_host = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0)
        t_fuse = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                         fused_ba=True)
        for fr in seq.frames:
            t_host.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
            t_fuse.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        ate_h = ate_rmse(t_host.map.poses, gt, align=False)
        ate_f = ate_rmse(t_fuse.map.poses, gt, align=False)
        assert ate_f < 0.05, f"fused ATE {ate_f} (host {ate_h})"
        # same optimization modulo track segmentation details
        d = np.abs(t_fuse.map.poses - t_host.map.poses).max()
        assert d < 0.03, f"pose divergence {d} (ATE host {ate_h} fused {ate_f})"
        assert len(t_fuse.map.track_ids()) == 1



    def test_first_odometry_edge_valid(self, sequence):
        """Regression (r5): the window ring's odometry edges must be valid
        for EVERY tracked pair, including the very first (frame 0 -> 1).
        Gating the append on has_velocity (the motion-MODEL flag) dropped
        the first edge, leaving the gauge frame tethered only through
        Huber-saturated point edges — the window then ratcheted +z on every
        re-solve (~0.4 m over 30 frames on the offline bench scene)."""
        import jax

        scene, seq = sequence
        cfg = make_config(scene)
        t = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                    fused_ba=True)
        for fr in seq.frames[:4]:
            t.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        ov = np.asarray(jax.device_get(t.state.ba_odom_valid))
        W = ov.shape[0]
        nf = int(jax.device_get(t.state.ba_nframes))
        assert nf == 4
        # pairs cover window positions (W-nf .. W-1); all nf-1 must be valid
        assert ov[W - nf + 1:].all(), ov
        assert not ov[:W - nf + 1].any(), ov

    def test_fused_pipelined_matches_fused_sync(self, sequence):
        scene, seq = sequence
        cfg = make_config(scene)
        t_sync = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                         fused_ba=True)
        t_pipe = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                         fused_ba=True, pipelined=True)
        for fr in seq.frames:
            t_sync.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
            t_pipe.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        t_pipe.finish()
        assert len(t_pipe.map) == len(t_sync.map)
        d = np.abs(t_pipe.map.poses - t_sync.map.poses).max()
        assert d < 1e-5, f"pipelined fused diverges: {d}"

    def test_light_record_matches_full(self, sequence):
        """record='light' changes only WHAT crosses the device->host
        boundary, never the computation: trajectories and object ids must
        be bit-identical to record='full'."""
        scene, seq = sequence
        cfg = make_config(scene)
        # auto rule picks light here (fused + non-KITTI): make both explicit
        t_full = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                         fused_ba=True, record="full")
        t_lite = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                         fused_ba=True, record="light")
        assert not t_full.record_light and t_lite.record_light
        # the bench/production configuration: pipelined + light
        t_pipe = Tracker(cfg, n_bg=1200, n_obj=3000, max_objects=4, seed=0,
                         fused_ba=True, record="light", pipelined=True)
        for fr in seq.frames:
            t_full.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
            t_lite.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
            t_pipe.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
        t_pipe.finish()
        np.testing.assert_array_equal(t_lite.map.poses, t_full.map.poses)
        np.testing.assert_array_equal(t_pipe.map.poses, t_full.map.poses)
        assert t_lite.map.track_ids() == t_full.map.track_ids()
        # light records carry no per-point history
        assert t_lite.map.frames[-1].stat_uv.size == 0
        assert t_full.map.frames[-1].stat_uv.size > 0

pytestmark = pytest.mark.slow  # heavy jit: full tier only
