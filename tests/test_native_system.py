"""C++ libvido_system.so facade: the C ABI must reproduce the Python
System exactly (same config, same seed -> same trajectory)."""

import ctypes
import os
import textwrap

import numpy as np
import pytest

LIB = os.path.join(os.path.dirname(__file__), "..", "native",
                   "libvido_system.so")


def write_cfg(d, scene):
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
        MaxTrackPointBG: 600
        WINDOW_SIZE: 4
    """)
    p = str(d / "config.yaml")
    with open(p, "w") as f:
        f.write(cfg_yaml)
    return p


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(LIB):
        pytest.skip("libvido_system.so not built (make -C native)")
    L = ctypes.CDLL(LIB)
    L.vido_system_create.restype = ctypes.c_void_p
    L.vido_system_init_ex.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int, ctypes.c_char_p]
    L.vido_system_track.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    L.vido_system_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    L.vido_system_track_imu.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    L.vido_system_get_objects.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]
    L.vido_system_destroy.argtypes = [ctypes.c_void_p]
    return L


class TestNativeSystem:
    def test_matches_python_system(self, lib, tmp_path):
        import jax.numpy as jnp

        from vido_slam_tpu.geometry.se3 import make_se3
        from vido_slam_tpu.geometry.so3 import exp_so3
        from vido_slam_tpu.io.synthetic import SyntheticSequence, simple_scene
        from vido_slam_tpu.system import Sensor, System

        scene = simple_scene(width=256, height=160, moving_box=True,
                             box_speed=0.6)
        dT = np.asarray(make_se3(exp_so3(jnp.array([0.0, 0.01, 0.0])),
                                 jnp.array([0.02, 0.0, -0.4])))
        seq = SyntheticSequence(scene, [dT], n_frames=5)
        cfg = write_cfg(tmp_path, scene)
        kwargs = b'{"n_bg": 600, "n_obj": 1500, "max_objects": 4}'

        sys_c = lib.vido_system_create()
        assert sys_c
        assert lib.vido_system_init_ex(sys_c, cfg.encode(), 2, kwargs) == 0

        sys_py = System()
        sys_py.Init(cfg, Sensor.RGBD, n_bg=600, n_obj=1500, max_objects=4)

        pose = np.zeros(16, np.float32)
        H, W = scene.cam.height, scene.cam.width
        for i, fr in enumerate(seq.frames):
            raw_depth = np.ascontiguousarray(fr.depth * 100.0, np.float32)
            flow = np.ascontiguousarray(fr.flow, np.float32)
            mask = np.ascontiguousarray(fr.mask, np.int32)
            gt = np.ascontiguousarray(fr.Tcw_gt, np.float32)
            rc = lib.vido_system_track(
                sys_c, None,
                raw_depth.ctypes.data_as(ctypes.c_void_p),
                flow.ctypes.data_as(ctypes.c_void_p),
                mask.ctypes.data_as(ctypes.c_void_p),
                gt.ctypes.data_as(ctypes.c_void_p),
                float(i) / 10.0, H, W,
                pose.ctypes.data_as(ctypes.c_void_p),
            )
            assert rc == 0
            p_py = sys_py.TrackRGBD(None, raw_depth, fr.flow, fr.mask,
                                    mTcw_gt=fr.Tcw_gt,
                                    timestamp=float(i) / 10.0)
            np.testing.assert_allclose(pose.reshape(4, 4),
                                       np.asarray(p_py), atol=1e-5)

        # scene-object query (OutPut.h counterpart): same rows as the
        # Python facade's GetFrameOutputArray
        objs = np.zeros((16, 10), np.float64)
        n_obj = lib.vido_system_get_objects(
            sys_c, -1, objs.ctypes.data_as(ctypes.c_void_p), 16)
        assert n_obj >= 0
        py_rows = sys_py.GetFrameOutputArray(-1)
        assert n_obj == py_rows.shape[0]
        if n_obj:
            np.testing.assert_allclose(objs[:n_obj], py_rows, atol=1e-6)

        out = str(tmp_path / "results")
        assert lib.vido_system_save(sys_c, out.encode()) == 0
        assert os.path.isdir(out) or any(
            f.startswith(os.path.basename(out)) for f in os.listdir(tmp_path))
        lib.vido_system_destroy(sys_c)

    def test_vio_overload_accepts_imu(self, lib, tmp_path):
        """The VIO C entry point must run end-to-end (IMU rows marshaled
        into ImuPoint measurements; RGBD sensor ignores them gracefully is
        NOT tested here — we init IMU_RGBD and check poses come back)."""
        import jax.numpy as jnp

        from vido_slam_tpu.geometry.se3 import make_se3
        from vido_slam_tpu.geometry.so3 import exp_so3
        from vido_slam_tpu.io.synthetic import SyntheticSequence, simple_scene

        scene = simple_scene(width=256, height=160)
        dT = np.asarray(make_se3(exp_so3(jnp.zeros(3)),
                                 jnp.array([0.0, 0.0, -0.4])))
        seq = SyntheticSequence(scene, [dT], n_frames=3)
        cfg = write_cfg(tmp_path, scene)
        kwargs = b'{"n_bg": 600, "n_obj": 1500, "max_objects": 4}'
        sys_c = lib.vido_system_create()
        assert sys_c
        assert lib.vido_system_init_ex(sys_c, cfg.encode(), 3, kwargs) == 0

        pose = np.zeros(16, np.float32)
        H, W = scene.cam.height, scene.cam.width
        for i, fr in enumerate(seq.frames):
            raw_depth = np.ascontiguousarray(fr.depth * 100.0, np.float32)
            flow = np.ascontiguousarray(fr.flow, np.float32)
            mask = np.ascontiguousarray(fr.mask, np.int32)
            t = float(i) / 10.0
            # 10 synthetic IMU samples in the inter-frame interval
            ts = t - 0.1 + (np.arange(10) + 1) * 0.01
            imu = np.zeros((10, 7), np.float64)
            imu[:, 1] = -9.79   # gravity along -y in body frame
            imu[:, 6] = ts
            rc = lib.vido_system_track_imu(
                sys_c, None,
                raw_depth.ctypes.data_as(ctypes.c_void_p),
                flow.ctypes.data_as(ctypes.c_void_p),
                mask.ctypes.data_as(ctypes.c_void_p),
                None, t,
                imu.ctypes.data_as(ctypes.c_void_p), 10,
                H, W, pose.ctypes.data_as(ctypes.c_void_p),
            )
            assert rc == 0
        P = pose.reshape(4, 4)
        assert np.isfinite(P).all()
        assert abs(np.linalg.det(P[:3, :3]) - 1.0) < 1e-3
        lib.vido_system_destroy(sys_c)

pytestmark = pytest.mark.slow  # heavy jit: full tier only
