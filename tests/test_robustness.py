"""Pathological-input robustness: a production tracker must degrade
gracefully, not NaN or crash, on sensor dropouts the reference would hit in
deployment (depth holes, detector blackouts, saturated masks, dead flow,
more objects than motion-estimation slots). Reference behavior anchor: the
per-pixel gates of Frame.cc:36-241 simply skip bad pixels; the object gates
of Tracking.cc:1670-1912 drop degenerate objects."""

import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.config import config_from_dict
from vido_slam_tpu.geometry.se3 import make_se3
from vido_slam_tpu.geometry.so3 import exp_so3
from vido_slam_tpu.io.synthetic import Box, SyntheticScene, SyntheticSequence
from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.tracking import Tracker

W, H = 192, 128


def _cam():
    return Camera.create(fx=160.0, fy=160.0, cx=W / 2, cy=H / 2,
                         width=W, height=H, bf=32.0)


def _cfg(cam):
    return config_from_dict({
        "Camera.width": cam.width, "Camera.height": cam.height,
        "Camera.fx": float(cam.fx), "Camera.fy": float(cam.fy),
        "Camera.cx": float(cam.cx), "Camera.cy": float(cam.cy),
        "Camera.bf": float(cam.bf),
        "ThDepthBG": 60.0, "ThDepthOBJ": 40.0, "WINDOW_SIZE": 6,
    })


def _scene(n_boxes=1):
    cam = _cam()
    boxes = tuple(
        Box(half_extent=jnp.array([1.5, 1.2, 1.5]), label=2 + i,
            pose0=make_se3(jnp.eye(3),
                           jnp.array([-6.0 + 3.0 * i, 0.0, 16.0 + 2.0 * i])),
            motion=make_se3(exp_so3(jnp.zeros(3)),
                            jnp.array([0.3, 0.0, 0.0])))
        for i in range(n_boxes)
    )
    return SyntheticScene(cam=cam, ground_y=1.2, boxes=boxes)


def _run(frames, mutate, n_bg=500, n_obj=1200, max_objects=3):
    scene = frames[0]
    seq = frames[1]
    tracker = Tracker(_cfg(scene.cam), n_bg=n_bg, n_obj=n_obj,
                      max_objects=max_objects, seed=0, local_ba=True,
                      fused_ba=True, ba_max_points=300, ba_iters=5)
    for i, fr in enumerate(seq.frames):
        depth, flow, mask = mutate(i, np.array(fr.depth), np.array(fr.flow),
                                   np.array(fr.mask))
        tracker.track(depth, flow, mask, Tcw_gt=fr.Tcw_gt)
    tracker.finish()
    poses = tracker.map.poses
    assert np.isfinite(poses).all(), "non-finite pose in map"
    # rotations stay orthonormal
    for P in poses:
        assert abs(np.linalg.det(P[:3, :3]) - 1.0) < 1e-2
    return tracker


def _make(n_frames=8, n_boxes=1):
    scene = _scene(n_boxes)
    dT = np.asarray(make_se3(exp_so3(jnp.zeros(3)),
                             jnp.array([0.0, 0.0, -0.3])))
    return scene, SyntheticSequence(scene, [dT], n_frames=n_frames)


pytestmark = pytest.mark.slow


class TestSensorDropouts:
    def test_depth_holes(self):
        """Half the depth pixels invalid (0) in a checkerboard — the
        per-pixel depth gate must keep the tracker finite."""
        rng = np.random.RandomState(0)

        def mutate(i, depth, flow, mask):
            hole = rng.rand(*depth.shape) < 0.5
            depth[hole] = 0.0
            return depth, flow, mask

        _run(_make(), mutate)

    def test_nan_depth_pixels(self):
        """Stray NaNs (sensor artifacts) must not propagate into poses."""
        rng = np.random.RandomState(1)

        def mutate(i, depth, flow, mask):
            bad = rng.rand(*depth.shape) < 0.02
            depth[bad] = np.nan
            return depth, flow, mask

        _run(_make(), mutate)

    def test_detector_blackout(self):
        """The instance detector returns NOTHING for three consecutive
        frames mid-sequence (service failure, run_vido.cc:148-151 warns and
        skips); static tracking must continue."""

        def mutate(i, depth, flow, mask):
            if 3 <= i <= 5:
                mask[:] = 0
            return depth, flow, mask

        _run(_make(), mutate)

    def test_saturated_mask(self):
        """A frame where the detector labels EVERYTHING as object leaves no
        background points; the pose falls back to the motion model."""

        def mutate(i, depth, flow, mask):
            if i == 4:
                mask[:] = 2
            return depth, flow, mask

        _run(_make(), mutate)

    def test_zero_flow(self):
        """Dead flow for one frame: correspondences stall; must not NaN."""

        def mutate(i, depth, flow, mask):
            if i == 3:
                flow[:] = 0.0
            return depth, flow, mask

        _run(_make(), mutate)


class TestObjectBudget:
    def test_more_objects_than_slots(self):
        """4 simultaneous objects with max_objects=3: the fixed top-K
        selection (by point count) must keep the 3 largest and stay
        finite — the reference iterates unbounded object lists, ours is a
        documented fixed-budget deviation."""
        tracker = _run(_make(n_boxes=4), lambda i, d, f, m: (d, f, m),
                       max_objects=3)
        ids = tracker.map.track_ids()
        assert len(ids) <= 8  # no id explosion from slot churn
