"""Fused perception graph (models/perception.py): service-parity output
contract, the one-program SLAM forward, and the fully-fused
perception+tracking per-frame program (Tracker.track_frames)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.config import config_from_dict
from vido_slam_tpu.geometry.camera import convert_depth
from vido_slam_tpu.models.maskrcnn.model import MaskRCNNConfig
from vido_slam_tpu.models.perception import PerceptionModel
from vido_slam_tpu.tracking import Tracker

H, W = 64, 96

pytestmark = pytest.mark.slow  # compiles the 3-net graph


@pytest.fixture(scope="module")
def model():
    return PerceptionModel(H, W, MaskRCNNConfig(input_h=64, input_w=96),
                           seed=0, use_pallas=False)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(0)
    return [jnp.asarray((rng.rand(H, W, 3) * 255).astype(np.float32))
            for _ in range(6)]


class TestPerceptionContract:
    def test_output_shapes_and_service_semantics(self, model, frames):
        out = model(frames[0], frames[1])
        assert out.depth_u16.shape == (H, W)
        assert out.flow.shape == (H, W, 2)
        assert out.mask.shape == (H, W)
        d = np.asarray(out.depth_u16)
        # uint16-normalised inverse depth (run_mono_depth.py:137-146)
        assert d.min() >= 0.0 and d.max() <= 65536.0
        assert np.asarray(out.mask).dtype == np.uint8
        assert np.isfinite(np.asarray(out.flow)).all()

    def test_slam_forward_matches_separate(self, model, frames):
        fwd = model.make_slam_forward("kaist", 500.0, 32.0, scale=1.0)
        depth, flow, mask = fwd(frames[0], frames[1])
        out = model(frames[0], frames[1])
        ref_depth = convert_depth(out.depth_u16, "kaist", 500.0, 32.0,
                                  scale=1.0)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(flow), np.asarray(out.flow),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(mask),
                                      np.asarray(out.mask).astype(np.int32))


class TestTrackFrames:
    def test_matches_separate_pipeline(self, model, frames):
        cfg = config_from_dict({
            "Camera.width": W, "Camera.height": H,
            "Camera.fx": 80.0, "Camera.fy": 80.0,
            "Camera.cx": W / 2, "Camera.cy": H / 2, "Camera.bf": 32.0,
            "ChooseData": 3, "DepthMapFactor": 500, "WINDOW_SIZE": 4,
        })
        kw = dict(n_bg=200, n_obj=400, max_objects=2, seed=0,
                  local_ba=True, fused_ba=True, ba_max_points=100,
                  ba_iters=3)
        t_sep = Tracker(cfg, **kw)
        t_fus = Tracker(cfg, **kw)
        t_fus.attach_perception(model, "kaist",
                                cfg.system.depth_map_factor, cfg.camera.bf)
        perceive = model.make_slam_forward(
            "kaist", cfg.system.depth_map_factor, cfg.camera.bf)
        for i in range(4):
            p_sep = t_sep.track(*perceive(frames[i], frames[i + 1]))
            p_fus = t_fus.track_frames(frames[i], frames[i + 1])
            # same math, different XLA fusion orderings: on pure-noise
            # inputs (random nets, random images) the weakly-constrained
            # solves amplify f32 reassociation — this is a PLUMBING
            # equivalence check, not a numerics-parity one
            np.testing.assert_allclose(np.asarray(p_fus), np.asarray(p_sep),
                                       atol=5e-3)
        assert len(t_fus.map) == len(t_sep.map)

    def test_pair_program_matches_single(self, model, frames):
        """track_frames_pair (two frames per device program) must produce
        the same records/trajectory as two track_frames calls."""
        cfg = config_from_dict({
            "Camera.width": W, "Camera.height": H,
            "Camera.fx": 80.0, "Camera.fy": 80.0,
            "Camera.cx": W / 2, "Camera.cy": H / 2, "Camera.bf": 32.0,
            "ChooseData": 3, "DepthMapFactor": 500, "WINDOW_SIZE": 4,
        })
        kw = dict(n_bg=200, n_obj=400, max_objects=2, seed=0,
                  local_ba=True, fused_ba=True, ba_max_points=100,
                  ba_iters=3, pipelined=True)
        t1 = Tracker(cfg, **kw)
        t2 = Tracker(cfg, **kw)
        for t in (t1, t2):
            t.attach_perception(model, "kaist",
                                cfg.system.depth_map_factor, cfg.camera.bf)
        for i in range(5):
            t1.track_frames(frames[i], frames[i + 1])
        t1.finish()
        t2.track_frames_pair(frames[0], frames[1], frames[2])   # init only
        t2.track_frames_pair(frames[1], frames[2], frames[3])   # frames 1,2
        t2.track_frames_pair(frames[3], frames[4], frames[5])   # frames 3,4
        t2.finish()
        assert len(t2.map) == len(t1.map) == 5
        p1 = t1.map.poses
        p2 = t2.map.poses
        np.testing.assert_allclose(p2, p1, atol=5e-3)
        # timestamps follow the frame index
        ts = [f.timestamp for f in t2.map.frames]
        assert ts == sorted(ts)

    def test_system_facade_fused_path(self, model, frames):
        """System.AttachPerception / TrackFrames (the realtime VO surface)
        runs end-to-end and records frames."""
        from vido_slam_tpu.system import Sensor, System

        cfg = config_from_dict({
            "Camera.width": W, "Camera.height": H,
            "Camera.fx": 80.0, "Camera.fy": 80.0,
            "Camera.cx": W / 2, "Camera.cy": H / 2, "Camera.bf": 32.0,
            "ChooseData": 3, "DepthMapFactor": 500, "WINDOW_SIZE": 4,
        })
        sys_ = System()
        sys_.init_from_config(cfg, Sensor.RGBD, n_bg=200, n_obj=400,
                              max_objects=2, seed=0, local_ba=True,
                              fused_ba=True, ba_max_points=100, ba_iters=3)
        sys_.AttachPerception(model)
        for i in range(3):
            P = sys_.TrackFrames(frames[i], frames[i + 1],
                                 timestamp=i / 10.0)
            assert np.isfinite(np.asarray(P)).all()
        assert len(sys_.map) == 3
        out = sys_.GetFrameOutput(-1)
        assert np.isfinite(out.camera_position).all()
