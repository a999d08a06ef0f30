"""Long-sequence e2e (VERDICT r1 item 5): 110 frames with object birth and
death, renewal churn across the whole window, fused-BA vs host-BA
trajectory agreement, and a golden-trajectory regression file.

Reference semantics anchor: vido_slam/src/Tracking.cc:1081-1509 (per-frame
loop, renewal, PartialBatchOptimization cadence).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.config import config_from_dict
from vido_slam_tpu.geometry.se3 import make_se3
from vido_slam_tpu.geometry.so3 import exp_so3
from vido_slam_tpu.io.synthetic import (
    Box,
    SyntheticScene,
    SyntheticSequence,
)
from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.metrics import ate_rmse, rpe_camera
from vido_slam_tpu.tracking import Tracker

pytestmark = pytest.mark.slow

N_FRAMES = 110
GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_long_seq_poses.npy")


def long_scene():
    """Ground plane + three staggered moving boxes: the camera drives
    forward ~44 units, so each box grows, passes and leaves the frustum
    (object death), and far boxes only become visible mid-sequence
    (object birth)."""
    W, H = 256, 160
    cam = Camera.create(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2,
                        width=W, height=H, bf=40.0)

    def mbox(label, pos, vel, he=(2.0, 1.5, 2.0)):
        return Box(
            half_extent=jnp.array(he),
            label=label,
            pose0=make_se3(jnp.eye(3), jnp.asarray(pos, jnp.float32)),
            motion=make_se3(exp_so3(jnp.zeros(3)),
                            jnp.asarray(vel, jnp.float32)),
        )

    # dense strided sampling (step 4, Frame.cc:184) + MIN_OBJ_POINTS=150
    # means an object becomes trackable at roughly >= 2400 mask pixels —
    # i.e. when it comes within ~15-20 m at this focal length. Each box's
    # approach is staged so births and deaths spread across the sequence.
    boxes = (
        mbox(2, [-4.0, 0.0, 14.0], [0.45, 0.0, 0.0]),    # dies early
        mbox(3, [4.0, 0.0, 52.0], [-0.2, 0.0, -0.2],     # born mid-sequence
             he=(2.5, 1.8, 2.5)),
        mbox(4, [-5.0, 0.0, 74.0], [0.05, 0.0, -0.25],   # born late
             he=(2.5, 1.8, 2.5)),
    )
    return SyntheticScene(cam=cam, ground_y=1.5, boxes=boxes)


def make_config(scene):
    cam = scene.cam
    return config_from_dict({
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
        "WINDOW_SIZE": 8,
    })


@pytest.fixture(scope="module")
def sequence():
    scene = long_scene()
    dT = np.asarray(make_se3(exp_so3(jnp.array([0.0, 0.002, 0.0])),
                             jnp.array([0.015, 0.0, -0.4])))
    return scene, SyntheticSequence(scene, [dT], n_frames=N_FRAMES)


def run_tracker(scene, seq, **kw):
    tracker = Tracker(make_config(scene), n_bg=1200, n_obj=3000,
                      max_objects=4, seed=0, **kw)
    for fr in seq.frames:
        tracker.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
    tracker.finish()
    return tracker


@pytest.fixture(scope="module")
def tracked_fused(sequence):
    scene, seq = sequence
    return run_tracker(scene, seq, local_ba=True, fused_ba=True,
                       ba_max_points=600, ba_iters=10)


@pytest.fixture(scope="module")
def tracked_host(sequence):
    scene, seq = sequence
    return run_tracker(scene, seq, local_ba=True, fused_ba=False,
                       ba_max_points=600, ba_iters=10)


class TestLongTrajectory:
    def test_ate_bounded(self, sequence, tracked_fused):
        _, seq = sequence
        est = tracked_fused.map.poses
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        assert est.shape[0] == N_FRAMES
        ate = ate_rmse(est, gt, align=False)
        # ~44 m travelled; < 0.7% drift without loop closure
        assert ate < 0.3, f"ATE {ate}"

    def test_rpe_bounded(self, sequence, tracked_fused):
        _, seq = sequence
        est = tracked_fused.map.poses
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        rpe = rpe_camera(est, gt)
        # the blocky synthetic depth + bilinear flow quantise per-step
        # translation at this resolution
        assert rpe["rpe_trans_mean"] < 0.06
        assert rpe["rpe_rot_deg_mean"] < 0.15

    def test_fused_vs_host_ba_agreement(self, tracked_fused, tracked_host):
        """VERDICT r1 weak #6: quantify the fused-BA deviations (slot track
        segmentation, ba_points cap) against the host-assembled
        PartialBatchOptimization path over a long sequence."""
        pf = tracked_fused.map.poses
        ph = tracked_host.map.poses
        assert pf.shape == ph.shape
        # local (per-step) agreement between the two BA paths
        rel = rpe_camera(pf, ph)
        assert rel["rpe_trans_mean"] < 0.01, rel
        assert rel["rpe_rot_deg_mean"] < 0.1, rel
        # global gap bounded over the 44 m travelled
        dt = np.linalg.norm(pf[:, :3, 3] - ph[:, :3, 3], axis=1)
        assert float(dt.max()) < 0.1, f"max fused-host gap {dt.max()}"
        # both within the same ATE class vs GT
        gt = tracked_host.map.gt_poses
        if gt is not None and len(gt):
            a_f = ate_rmse(pf, np.asarray(gt), align=False)
            a_h = ate_rmse(ph, np.asarray(gt), align=False)
            assert abs(a_f - a_h) < 0.05


class TestObjectBirthDeath:
    def test_multiple_tracks_with_lifecycles(self, sequence, tracked_fused):
        _, seq = sequence
        tracker = tracked_fused
        ids = tracker.map.track_ids()
        # three simulated objects; the far slow box fragments into re-found
        # ids while it hovers near the MIN_OBJ_POINTS/inlier gates (the
        # reference's vObjLabel id bookkeeping flickers the same way on
        # marginal objects), but there must be no unbounded id explosion
        assert 3 <= len(ids) <= 10, f"track ids: {ids}"
        spans = {}
        for tid in ids:
            frames = sorted(tracker.map.object_motions(tid))
            spans[tid] = (frames[0], frames[-1], len(frames))
        # at least one object dies well before the end and one is born
        # well after the start
        first_death = min(hi for _, hi, _ in spans.values())
        last_birth = max(lo for lo, _, _ in spans.values())
        assert first_death < N_FRAMES - 25, spans
        assert last_birth > 25, spans
        # at least two sustained tracks (the near passes)
        sustained = [n for _, _, n in spans.values() if n >= 10]
        assert len(sustained) >= 2, spans

    def test_renewal_keeps_feature_budget_live(self, tracked_fused):
        """Slot reuse across 100+ frames must keep a healthy live feature
        set (ring-buffer/renewal bugs starve it)."""
        st = tracked_fused.state
        n_valid = int(np.asarray(jnp.sum(st.stat.valid)))
        assert n_valid > 600, f"live bg features at end: {n_valid}"


class TestGoldenTrajectory:
    def test_matches_golden(self, tracked_fused):
        """Regression pin: the 110-frame fused trajectory must stay within
        tolerance of the committed golden run (regenerate deliberately with
        VIDO_UPDATE_GOLDEN=1 after an intended numerics change)."""
        poses = np.asarray(tracked_fused.map.poses, np.float32)
        if os.environ.get("VIDO_UPDATE_GOLDEN") == "1" or not os.path.exists(GOLDEN):
            os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
            np.save(GOLDEN, poses)
            pytest.skip("golden trajectory (re)generated")
        golden = np.load(GOLDEN)
        assert golden.shape == poses.shape
        dt = np.linalg.norm(poses[:, :3, 3] - golden[:, :3, 3], axis=1)
        assert float(dt.max()) < 0.02, f"max drift vs golden {dt.max()}"
