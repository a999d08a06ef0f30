"""Full-batch dynamic BA: refines poses and object motions jointly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.config import config_from_dict
from vido_slam_tpu.io.synthetic import SyntheticSequence, simple_scene
from vido_slam_tpu.metrics import ate_rmse
from vido_slam_tpu.tracking import Tracker


@pytest.fixture(scope="module")
def tracked_with_full_ba():
    scene = simple_scene(width=256, height=160, moving_box=True, box_speed=0.6)
    from vido_slam_tpu.geometry.se3 import make_se3
    from vido_slam_tpu.geometry.so3 import exp_so3

    dT = np.asarray(
        make_se3(exp_so3(jnp.array([0.0, 0.01, 0.0])), jnp.array([0.02, 0.0, -0.4]))
    )
    seq = SyntheticSequence(scene, [dT], n_frames=8)
    cfg = config_from_dict(
        {
            "Camera.width": scene.cam.width,
            "Camera.height": scene.cam.height,
            "Camera.fx": float(scene.cam.fx),
            "Camera.fy": float(scene.cam.fy),
            "Camera.cx": float(scene.cam.cx),
            "Camera.cy": float(scene.cam.cy),
            "Camera.bf": float(scene.cam.bf),
            "MaxTrackPointBG": 1000,
            "WINDOW_SIZE": 6,
        }
    )
    tracker = Tracker(cfg, n_bg=1000, n_obj=2500, max_objects=4, seed=0,
                      ba_max_points=800)
    for fr in seq.frames:
        tracker.track(fr.depth, fr.flow, fr.mask, Tcw_gt=fr.Tcw_gt)
    res = tracker.run_full_batch(max_frames=8, max_static=800, cg_iters=40,
                                 max_iters=10)
    return seq, tracker, res


class TestFullBA:
    def test_runs_and_converges(self, tracked_with_full_ba):
        seq, tracker, res = tracked_with_full_ba
        assert np.isfinite(float(res.cost))
        assert tracker.map.refined_poses is not None
        assert tracker.map.refined_poses.shape[0] == len(seq.frames)

    def test_refined_trajectory_accuracy(self, tracked_with_full_ba):
        seq, tracker, res = tracked_with_full_ba
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        ate_refined = ate_rmse(tracker.map.refined_poses, gt, align=False)
        assert ate_refined < 0.06, f"refined ATE {ate_refined}"

    def test_refined_motions_present_and_accurate(self, tracked_with_full_ba):
        seq, tracker, res = tracked_with_full_ba
        assert len(tracker.map.refined_motions) >= 1
        H_gt = seq.frames[0].box_motions[0]
        for tid, per_frame in tracker.map.refined_motions.items():
            assert len(per_frame) >= 3
            for fid, H in per_frame.items():
                err_t = np.linalg.norm(H[:3, 3] - H_gt[:3, 3])
                assert err_t < 0.1, f"track {tid} frame {fid}: {err_t}"


class TestAltitudeConstraint:
    def test_altitude_pulls_motion_y_toward_zero(self, tracked_with_full_ba):
        """EdgeSE3Altitude (types_dyn_slam3d.h:44-60; Optimizer.cc:450-459):
        a unary prior on each motion's y-translation, sigma2_alti=1, behind
        the reference's (default-off) ALTITUDE_CONSTRAINT flag."""
        from vido_slam_tpu.estimation.assembly import assemble_full_problem
        from vido_slam_tpu.estimation.full_ba import solve_full_ba

        seq, tracker, _ = tracked_with_full_ba
        prob, stat, _ = assemble_full_problem(
            tracker.map, tracker.cam, 8, 800, tracker.max_objects)
        r0 = solve_full_ba(prob, max_iters=6, cg_iters=30, altitude=False)
        r1 = solve_full_ba(prob, max_iters=6, cg_iters=30, altitude=True)
        mv = np.asarray(prob.motion_valid)
        y0 = np.abs(np.asarray(r0.H)[..., 1, 3])[mv]
        y1 = np.abs(np.asarray(r1.H)[..., 1, 3])[mv]
        assert np.isfinite(y1).all()
        # the prior shrinks |y| on average without destroying the solve
        assert y1.mean() <= y0.mean() + 1e-6

pytestmark = pytest.mark.slow  # heavy jit: full tier only
