"""System facade end-to-end: Init from a config file, TrackRGBD with raw
depth conversion, SaveResultsIJRR2020, FrameOutput."""

import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.io.synthetic import SyntheticSequence, simple_scene
from vido_slam_tpu.metrics import ate_rmse
from vido_slam_tpu.system import Sensor, System


@pytest.fixture(scope="module")
def system_run(tmp_path_factory):
    scene = simple_scene(width=256, height=160, moving_box=True, box_speed=0.6)
    from vido_slam_tpu.geometry.se3 import make_se3
    from vido_slam_tpu.geometry.so3 import exp_so3

    dT = np.asarray(make_se3(exp_so3(jnp.array([0.0, 0.01, 0.0])),
                             jnp.array([0.02, 0.0, -0.4])))
    seq = SyntheticSequence(scene, [dT], n_frames=6)

    cfg_yaml = textwrap.dedent(f"""\
        %YAML:1.0
        slam_mode: 0
        ChooseData: 1
        DepthMapFactor: 100
        Camera.width: {scene.cam.width}
        Camera.height: {scene.cam.height}
        Camera.fx: {float(scene.cam.fx)}
        Camera.fy: {float(scene.cam.fy)}
        Camera.cx: {float(scene.cam.cx)}
        Camera.cy: {float(scene.cam.cy)}
        Camera.bf: {float(scene.cam.bf)}
        Camera.fps: 10
        MaxTrackPointBG: 1000
        WINDOW_SIZE: 6
    """)
    d = tmp_path_factory.mktemp("syscfg")
    cfg_path = str(d / "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg_yaml)

    system = System()
    system.Init(cfg_path, Sensor.RGBD, n_bg=1000, n_obj=2000, max_objects=4)

    rng = np.random.RandomState(0)
    for fr in seq.frames:
        # OMD-style raw depth: metric * DepthMapFactor
        raw_depth = fr.depth * 100.0
        gray = rng.rand(*fr.depth.shape).astype(np.float32) * 255
        system.TrackRGBD(gray, raw_depth, fr.flow, fr.mask,
                         mTcw_gt=fr.Tcw_gt)
    return system, seq, str(d)


class TestSystem:
    def test_trajectory(self, system_run):
        system, seq, _ = system_run
        est = system.map.poses
        gt = np.stack([f.Tcw_gt for f in seq.frames])
        assert ate_rmse(est, gt, align=False) < 0.06

    def test_frame_output(self, system_run):
        system, seq, _ = system_run
        out = system.GetFrameOutput()
        assert out.camera_pose.shape == (4, 4)
        assert isinstance(out.objects, list)
        if out.objects:
            ob = out.objects[0]
            assert ob.tracking_id >= 1
            assert ob.speed_kmh > 0

    def test_save_results(self, system_run):
        system, seq, d = system_run
        prefix = os.path.join(d, "res_")
        system.SaveResultsIJRR2020(prefix)
        assert os.path.exists(prefix + "initial_rgbd_new.txt")
        lines = open(prefix + "initial_rgbd_new.txt").read().splitlines()
        assert len(lines) == len(seq.frames)
