"""End-to-end VIO: mono-scaled depth + synthetic IMU -> metric scale
recovery via the staged IMU initialization inside the Tracker."""

import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.config import config_from_dict
from vido_slam_tpu.geometry.se3 import inverse_se3, make_se3
from vido_slam_tpu.geometry.so3 import exp_so3
from vido_slam_tpu.imu.preintegration import GRAVITY_VALUE
from vido_slam_tpu.io.synthetic import SyntheticScene, render_frame, flow_between
from vido_slam_tpu.metrics import ate_rmse
from vido_slam_tpu.system import ImuPoint
from vido_slam_tpu.tracking import Tracker
from vido_slam_tpu.geometry.camera import Camera

SCALE_GT = 2.5
FPS = 10.0
IMU_HZ = 200.0


def analytic_pose(t):
    """Body/camera trajectory with strong acceleration (y-down convention) —
    scale observability needs the visual second differences to dominate VO
    noise, exactly like a real vehicle's start/stop excitation."""
    p = np.array([0.9 * np.sin(1.8 * t), 0.15 * np.sin(1.3 * t), 1.0 * t])
    R = np.asarray(exp_so3(jnp.asarray([0.0, 0.04 * t, 0.0])))
    return R, p


def analytic_acc(t):
    return np.array([
        -0.9 * 1.8 * 1.8 * np.sin(1.8 * t),
        -0.15 * 1.3 * 1.3 * np.sin(1.3 * t),
        0.0,
    ])


@pytest.fixture(scope="module")
def vio_run():
    n_frames = 24
    W, H = 192, 120
    cam = Camera.create(fx=150.0, fy=150.0, cx=W / 2, cy=H / 2,
                        width=W, height=H, bf=30.0)
    scene = SyntheticScene(cam=cam, ground_y=1.5, boxes=())

    g_w = np.array([0.0, GRAVITY_VALUE, 0.0])  # gravity points +y (down)
    omega = np.array([0.0, 0.04, 0.0])

    cfg = config_from_dict({
        "Camera.width": W, "Camera.height": H,
        "Camera.fx": 150.0, "Camera.fy": 150.0,
        "Camera.cx": W / 2, "Camera.cy": H / 2,
        "Camera.bf": 30.0, "Camera.fps": FPS,
        "ThDepthBG": 80.0, "MaxTrackPointBG": 800,
        "WINDOW_SIZE": 8,
        "IMU.NoiseGyro": 1e-4, "IMU.NoiseAcc": 1e-4,
        "IMU.GyroWalk": 1e-6, "IMU.AccWalk": 1e-5,
        "IMU.Frequency": IMU_HZ,
    })
    # Tbc = identity (body == camera)
    tracker = Tracker(cfg, n_bg=800, n_obj=500, max_objects=2, seed=0,
                      local_ba=True, ba_max_points=600, use_imu=True,
                      imu_max_frames=32)

    Tcws = []
    for i in range(n_frames):
        R, p = analytic_pose(i / FPS)
        Tcws.append(np.asarray(inverse_se3(jnp.asarray(
            make_se3(jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32))))))

    imu_t = 0.0
    for i in range(n_frames):
        t = i / FPS
        Tcw = jnp.asarray(Tcws[i])
        depth, mask = render_frame(scene, Tcw, [])
        if i + 1 < n_frames:
            flow = flow_between(scene, Tcw, jnp.asarray(Tcws[i + 1]), depth, mask, [])
        else:
            flow = jnp.zeros(depth.shape + (2,), jnp.float32)
        depth_fed = depth / SCALE_GT  # mono scale ambiguity

        meas = []
        while imu_t <= t + 1e-9:
            R, _ = analytic_pose(imu_t)
            a_b = R.T @ (analytic_acc(imu_t) - g_w)
            meas.append(ImuPoint(a=a_b.astype(np.float32),
                                 w=omega.astype(np.float32), t=imu_t))
            imu_t += 1.0 / IMU_HZ
        tracker.grab_imu_data(meas)
        # the System layer converts raw depth with the current IMU scale
        # (Tracking.cc:316-319); replicate that here
        tracker.track(depth_fed * tracker.imu_scale, flow, mask,
                      Tcw_gt=Tcws[i], timestamp=t)

    return tracker, Tcws


class TestVIO:
    def test_imu_initializes(self, vio_run):
        tracker, _ = vio_run
        assert tracker.imu_initialized

    def test_scale_recovered(self, vio_run):
        tracker, _ = vio_run
        assert tracker.imu_scale == pytest.approx(SCALE_GT, rel=0.1)

    def test_metric_trajectory(self, vio_run):
        tracker, Tcws = vio_run
        est = tracker.map.poses
        gt = np.stack(Tcws)
        # rigid alignment only (no scale): passes only if the metric scale
        # was recovered by the IMU initialization
        ate = ate_rmse(est, gt, align=True, with_scale=False)
        # threshold is generous to feature-sampling randomness; the scale
        # test above is the sharp assertion (without IMU the rigid-aligned
        # ATE of the 2.5x-scaled trajectory would be ~1.4)
        assert ate < 0.25, f"metric ATE {ate}"

    def test_gravity_direction(self, vio_run):
        tracker, _ = vio_run
        g_est = tracker.Rwg @ np.array([0.0, 0.0, -GRAVITY_VALUE])
        g_true = np.array([0.0, GRAVITY_VALUE, 0.0])
        assert np.linalg.norm(g_est - g_true) < 0.5

class TestInitNoLockout:
    """VERDICT r4 item 3: the reference retries InitializeIMU every frame
    with NO upper frame bound (Tracking.cc:1452-1453, gate :939-949). A
    sequence that is degenerate for the first 40+ frames (stationary: scale
    unobservable, init aborts on the collapsed scale, Tracking.cc:1008-1012)
    must STILL initialize once excitation begins — the old
    `n > imu_max_frames` early-return locked VIO out forever."""

    T_SWITCH = 4.4          # stationary until here (44 frames > 32)
    N_STILL = 44
    N_MOVING = 26

    @staticmethod
    def pose(t):
        if t < TestInitNoLockout.T_SWITCH:
            return np.eye(3), np.zeros(3)
        u = t - TestInitNoLockout.T_SWITCH
        p = np.array([0.9 * (1 - np.cos(1.8 * u)),
                      0.15 * (1 - np.cos(1.3 * u)),
                      0.5 * u * u])      # starts from rest: v(0) = 0
        R = np.asarray(exp_so3(jnp.asarray([0.0, 0.04 * u, 0.0])))
        return R, p

    @staticmethod
    def acc_gyro(t):
        if t < TestInitNoLockout.T_SWITCH:
            return np.zeros(3), np.zeros(3)
        u = t - TestInitNoLockout.T_SWITCH
        a = np.array([0.9 * 1.8 * 1.8 * np.cos(1.8 * u),
                      0.15 * 1.3 * 1.3 * np.cos(1.3 * u),
                      1.0])
        return a, np.array([0.0, 0.04, 0.0])

    @pytest.fixture(scope="class")
    def run(self):
        W, H = 192, 120
        cam = Camera.create(fx=150.0, fy=150.0, cx=W / 2, cy=H / 2,
                            width=W, height=H, bf=30.0)
        scene = SyntheticScene(cam=cam, ground_y=1.5, boxes=())
        g_w = np.array([0.0, GRAVITY_VALUE, 0.0])
        cfg = config_from_dict({
            "Camera.width": W, "Camera.height": H,
            "Camera.fx": 150.0, "Camera.fy": 150.0,
            "Camera.cx": W / 2, "Camera.cy": H / 2,
            "Camera.bf": 30.0, "Camera.fps": FPS,
            "ThDepthBG": 80.0, "MaxTrackPointBG": 800,
            "WINDOW_SIZE": 8,
            "IMU.NoiseGyro": 1e-4, "IMU.NoiseAcc": 1e-4,
            "IMU.GyroWalk": 1e-6, "IMU.AccWalk": 1e-5,
            "IMU.Frequency": IMU_HZ,
        })
        tracker = Tracker(cfg, n_bg=800, n_obj=500, max_objects=2, seed=0,
                          local_ba=True, ba_max_points=600, use_imu=True,
                          imu_max_frames=32)
        n_frames = self.N_STILL + self.N_MOVING
        Tcws = []
        for i in range(n_frames):
            R, p = self.pose(i / FPS)
            Tcws.append(np.asarray(inverse_se3(jnp.asarray(make_se3(
                jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32))))))
        init_state_at_still_end = None
        imu_t = 0.0
        for i in range(n_frames):
            t = i / FPS
            Tcw = jnp.asarray(Tcws[i])
            depth, mask = render_frame(scene, Tcw, [])
            if i + 1 < n_frames:
                flow = flow_between(scene, Tcw, jnp.asarray(Tcws[i + 1]),
                                    depth, mask, [])
            else:
                flow = jnp.zeros(depth.shape + (2,), jnp.float32)
            meas = []
            while imu_t <= t + 1e-9:
                R, _ = self.pose(imu_t)
                a_w, w_b = self.acc_gyro(imu_t)
                meas.append(ImuPoint(a=(R.T @ (a_w - g_w)).astype(np.float32),
                                     w=w_b.astype(np.float32), t=imu_t))
                imu_t += 1.0 / IMU_HZ
            tracker.grab_imu_data(meas)
            tracker.track(depth / SCALE_GT * tracker.imu_scale, flow, mask,
                          Tcw_gt=Tcws[i], timestamp=t)
            if i == self.N_STILL - 1:
                init_state_at_still_end = tracker.imu_initialized
        return tracker, init_state_at_still_end

    def test_not_initialized_while_degenerate(self, run):
        _, init_at_still_end = run
        assert init_at_still_end is False  # collapsed scale kept aborting

    def test_initializes_after_excitation(self, run):
        tracker, _ = run
        assert tracker.imu_initialized  # sliding window, no lockout

    def test_scale_recovered_after_late_init(self, run):
        tracker, _ = run
        assert tracker.imu_scale == pytest.approx(SCALE_GT, rel=0.15)


pytestmark = pytest.mark.slow  # heavy jit: full tier only
