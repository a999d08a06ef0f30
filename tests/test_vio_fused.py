"""End-to-end VIO through the FUSED realtime path (VERDICT r2 item 6):
IMU_RGBD via Tracker.track_frames_pair — the live IMU scale rides as a
scalar input of the fused per-pair program (no recompile on IMU init /
scale refinement), preintegration + init hooks run at the pre-dispatch
sync point. Mirrors the separate-route scenario of test_vio_e2e with a
perception stub behind the fused-program seam (forward_from_packed).

Reference: System.cc:65-78 (TrackRGBD VIO overload through the same
surface as VO), Tracking.cc:316-319 (depth conversion with mScale),
:784-887/:937-1077 (preintegration, InitializeIMU, ScaleRefinement).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.config import config_from_dict
from vido_slam_tpu.geometry.camera import Camera, convert_depth
from vido_slam_tpu.geometry.se3 import inverse_se3, make_se3
from vido_slam_tpu.geometry.so3 import exp_so3
from vido_slam_tpu.imu.preintegration import GRAVITY_VALUE
from vido_slam_tpu.io.synthetic import SyntheticScene, render_frame, flow_between
from vido_slam_tpu.metrics import ate_rmse
from vido_slam_tpu.models.perception import PerceptionOutput
from vido_slam_tpu.system import ImuPoint
from vido_slam_tpu.tracking import Tracker

pytestmark = pytest.mark.slow  # heavy jit: full tier only

SCALE_GT = 2.5
FPS = 10.0
IMU_HZ = 200.0
W, H = 192, 120
DM_FACTOR = 500.0
BF = 30.0


def analytic_pose(t):
    p = np.array([0.9 * np.sin(1.8 * t), 0.15 * np.sin(1.3 * t), 1.0 * t])
    R = np.asarray(exp_so3(jnp.asarray([0.0, 0.04 * t, 0.0])))
    return R, p


def analytic_acc(t):
    return np.array([
        -0.9 * 1.8 * 1.8 * np.sin(1.8 * t),
        -0.15 * 1.3 * 1.3 * np.sin(1.3 * t),
        0.0,
    ])


class StubPerception:
    """Stands in for the three nets behind the fused-program seam:
    anything with `_pp` + traceable `forward_from_packed` (+
    `make_slam_forward` for the init frame) can attach. Returns
    precomputed per-frame stacks indexed by the frame id encoded in the
    PREV image's pixel values — the separate-route geometric convention
    (frame k: depth(k), flow(k->k+1), mask(k))."""

    def __init__(self, depth_u16, flows, masks):
        self._pp = (jnp.asarray(depth_u16, jnp.float32),
                    jnp.asarray(flows, jnp.float32),
                    jnp.asarray(masks, jnp.int32))

    def forward_from_packed(self, bufs, prev_bgr, cur_bgr):
        d, f, m = bufs
        idx = jnp.clip(jnp.round(prev_bgr[0, 0, 0]).astype(jnp.int32),
                       0, d.shape[0] - 1)
        return PerceptionOutput(depth_u16=d[idx], flow=f[idx],
                                mask=m[idx].astype(jnp.uint8))

    def make_slam_forward(self, depth_mode, depth_map_factor, bf, scale=1.0):
        def fwd(prev_bgr, cur_bgr):
            out = self.forward_from_packed(
                self._pp, jnp.asarray(prev_bgr, jnp.float32),
                jnp.asarray(cur_bgr, jnp.float32))
            depth = convert_depth(out.depth_u16, depth_mode,
                                  depth_map_factor, bf, scale=scale)
            return depth, out.flow, out.mask.astype(jnp.int32)
        return fwd


@pytest.fixture(scope="module")
def vio_fused_run():
    n_frames = 25  # odd count: pair calls process frames 1,2 | 3,4 | ...
    cam = Camera.create(fx=150.0, fy=150.0, cx=W / 2, cy=H / 2,
                        width=W, height=H, bf=BF)
    scene = SyntheticScene(cam=cam, ground_y=1.5, boxes=())
    g_w = np.array([0.0, GRAVITY_VALUE, 0.0])
    omega = np.array([0.0, 0.04, 0.0])

    cfg = config_from_dict({
        "Camera.width": W, "Camera.height": H,
        "Camera.fx": 150.0, "Camera.fy": 150.0,
        "Camera.cx": W / 2, "Camera.cy": H / 2,
        "Camera.bf": BF, "Camera.fps": FPS,
        "ChooseData": 3, "DepthMapFactor": DM_FACTOR,
        "ThDepthBG": 80.0, "MaxTrackPointBG": 800,
        "WINDOW_SIZE": 8,
        "IMU.NoiseGyro": 1e-4, "IMU.NoiseAcc": 1e-4,
        "IMU.GyroWalk": 1e-6, "IMU.AccWalk": 1e-5,
        "IMU.Frequency": IMU_HZ,
    })

    Tcws = []
    for i in range(n_frames):
        R, p = analytic_pose(i / FPS)
        Tcws.append(np.asarray(inverse_se3(jnp.asarray(make_se3(
            jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32))))))

    # precompute the per-frame stacks the stub serves. Raw "u16" depth is
    # the inverse-depth encoding the kaist rule decodes
    # (Tracking.cc:316-319): raw = F*bf*SCALE_GT/metric, so at scale 1 the
    # converted depth is metric/SCALE_GT (the mono ambiguity) and after
    # IMU init it is metric.
    depth_raws, flows, masks = [], [], []
    for i in range(n_frames):
        Tcw = jnp.asarray(Tcws[i])
        depth, mask = render_frame(scene, Tcw, [])
        if i + 1 < n_frames:
            flow = flow_between(scene, Tcw, jnp.asarray(Tcws[i + 1]),
                                depth, mask, [])
        else:
            flow = jnp.zeros(depth.shape + (2,), jnp.float32)
        d = np.asarray(depth)
        raw = np.where(d > 0, DM_FACTOR * BF * SCALE_GT / np.maximum(d, 1e-6),
                       0.0).astype(np.float32)
        depth_raws.append(raw)
        flows.append(np.asarray(flow))
        masks.append(np.asarray(mask))

    stub = StubPerception(np.stack(depth_raws), np.stack(flows),
                          np.stack(masks))

    tracker = Tracker(cfg, n_bg=800, n_obj=500, max_objects=2, seed=0,
                      local_ba=True, ba_max_points=600, use_imu=True,
                      imu_max_frames=32, pipelined=True, fused_ba=True)
    tracker.attach_perception(stub, "kaist", DM_FACTOR, BF)

    # whole IMU stream up front (the preintegrator consumes per interval)
    meas, t = [], 0.0
    while t <= (n_frames - 1) / FPS + 1e-9:
        R, _ = analytic_pose(t)
        a_b = R.T @ (analytic_acc(t) - g_w)
        meas.append(ImuPoint(a=a_b.astype(np.float32),
                             w=omega.astype(np.float32), t=t))
        t += 1.0 / IMU_HZ
    tracker.grab_imu_data(meas)

    # frame id encoded in the image content (the stub's index channel)
    frames = [np.full((H, W, 3), float(i), np.float32)
              for i in range(n_frames)]
    tracker.track_frames_pair(frames[0], frames[1], frames[2])  # init
    for i in range(1, n_frames - 2, 2):
        tracker.track_frames_pair(frames[i], frames[i + 1], frames[i + 2])
    tracker.finish()
    return tracker, Tcws


class TestVIOFused:
    def test_imu_initializes_and_recovers_scale(self, vio_fused_run):
        tracker, _ = vio_fused_run
        assert tracker.imu_initialized
        assert tracker.imu_scale == pytest.approx(SCALE_GT, rel=0.1)

    def test_metric_trajectory(self, vio_fused_run):
        tracker, Tcws = vio_fused_run
        est = tracker.map.poses
        gt = np.stack(Tcws)[: len(est)]
        # rigid alignment only (no scale): passes only if the IMU
        # initialization recovered the metric scale through the fused path
        ate = ate_rmse(est, gt, align=True, with_scale=False)
        assert ate < 0.25, f"metric ATE {ate}"

    def test_no_recompile_on_scale_change(self, vio_fused_run):
        """The IMU scale is a scalar program INPUT: after init rescales
        the world mid-sequence the pair program must not retrace."""
        tracker, _ = vio_fused_run
        fn = tracker._step_frames2
        if hasattr(fn, "_cache_size"):
            assert fn._cache_size() == 1

    def test_gravity_direction(self, vio_fused_run):
        tracker, _ = vio_fused_run
        g_est = tracker.Rwg @ np.array([0.0, 0.0, -GRAVITY_VALUE])
        g_true = np.array([0.0, GRAVITY_VALUE, 0.0])
        assert np.linalg.norm(g_est - g_true) < 0.5

    def test_records_complete(self, vio_fused_run):
        tracker, Tcws = vio_fused_run
        # pair calls (f1,f2,f3)...(f21,f22,f23) process frames 1..22, so
        # with 25 rendered poses 23 frames are recorded (0..22)
        assert len(tracker.map) == len(Tcws) - 2
        ts = [f.timestamp for f in tracker.map.frames]
        assert ts == sorted(ts) and len(set(ts)) == len(ts)
