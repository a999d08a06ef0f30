"""Fast-tier smoke coverage for modules whose full test files are `slow`
(heavy jit). Tiny shapes, minimal iteration counts — each test finishes in
seconds on the 8-virtual-device CPU backend. Full behavioural coverage
lives in the slow tier (pytest -m slow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.geometry.se3 import exp_se3, inverse_se3, log_se3, make_se3
from vido_slam_tpu.geometry.so3 import exp_so3, hat, log_so3


class TestGeometrySmoke:
    def test_se3_exp_log_roundtrip(self):
        xi = jnp.asarray([0.1, -0.2, 0.3, 0.02, -0.03, 0.04])
        T = exp_se3(xi)
        np.testing.assert_allclose(np.asarray(log_se3(T)), np.asarray(xi),
                                   atol=1e-5)

    def test_se3_inverse(self):
        T = exp_se3(jnp.asarray([0.4, 0.1, -0.2, 0.1, 0.2, -0.1]))
        np.testing.assert_allclose(
            np.asarray(T @ inverse_se3(T)), np.eye(4), atol=1e-6)

    def test_so3_hat_antisymmetric(self):
        w = jnp.asarray([1.0, 2.0, 3.0])
        H = np.asarray(hat(w))
        np.testing.assert_allclose(H, -H.T)
        np.testing.assert_allclose(
            np.asarray(log_so3(exp_so3(w * 0.1))), np.asarray(w) * 0.1,
            atol=1e-6)


class TestEstimationSmoke:
    def test_lm_quadratic(self):
        from vido_slam_tpu.estimation.lm import lm_solve

        target = jnp.asarray([1.0, -2.0, 0.5])

        def resid(x):
            return (x - target)[:, None]  # (N, d=1)

        res = lm_solve(resid, jnp.zeros(3), max_iters=10)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(target),
                                   atol=1e-4)

    def test_ransac_tiny(self):
        from vido_slam_tpu.estimation.ransac import pnp_ransac
        from vido_slam_tpu.geometry.camera import Camera

        cam = Camera(fx=jnp.float32(100.0), fy=jnp.float32(100.0),
                     cx=jnp.float32(32.0), cy=jnp.float32(32.0),
                     dist=jnp.zeros(5), width=64, height=64,
                     bf=jnp.float32(10.0), fps=10.0)
        rng = np.random.RandomState(0)
        N = 48
        X = rng.rand(N, 3) * 2 + np.array([0, 0, 4.0])
        t = np.array([0.1, 0.0, 0.0])
        Xc = X - t
        uv = np.stack([Xc[:, 0] / Xc[:, 2] * 100 + 32,
                       Xc[:, 1] / Xc[:, 2] * 100 + 32], 1)
        res = pnp_ransac(
            jax.random.PRNGKey(0), jnp.asarray(X.astype(np.float32)),
            jnp.asarray(uv.astype(np.float32)), jnp.ones(N, bool), cam,
            obs_pc=jnp.asarray(Xc.astype(np.float32)),
            num_hypotheses=32, threshold=1.0)
        assert int(res.num_inliers) >= N - 2
        np.testing.assert_allclose(np.asarray(res.T[:3, 3]), -t, atol=0.05)

    def test_ransac_wraps_small_point_budget(self):
        """More hypotheses than points: tiled-shuffle sampling still works."""
        from vido_slam_tpu.estimation.ransac import pnp_ransac
        from vido_slam_tpu.geometry.camera import Camera

        cam = Camera(fx=jnp.float32(100.0), fy=jnp.float32(100.0),
                     cx=jnp.float32(32.0), cy=jnp.float32(32.0),
                     dist=jnp.zeros(5), width=64, height=64,
                     bf=jnp.float32(10.0), fps=10.0)
        rng = np.random.RandomState(1)
        N = 24
        X = rng.rand(N, 3) * 2 + np.array([0, 0, 4.0])
        uv = np.stack([X[:, 0] / X[:, 2] * 100 + 32,
                       X[:, 1] / X[:, 2] * 100 + 32], 1)
        res = pnp_ransac(
            jax.random.PRNGKey(0), jnp.asarray(X.astype(np.float32)),
            jnp.asarray(uv.astype(np.float32)), jnp.ones(N, bool), cam,
            obs_pc=jnp.asarray(X.astype(np.float32)),
            num_hypotheses=64, threshold=1.0)
        assert int(res.num_inliers) >= N - 2


class TestFrontendSmoke:
    def test_update_mask_tiny(self):
        from vido_slam_tpu.frontend.association import update_mask

        last = jnp.zeros((24, 32), jnp.int32).at[4:20, 4:20].set(3)
        cur = jnp.zeros((24, 32), jnp.int32)
        flow = jnp.zeros((24, 32, 2), jnp.float32)
        out = update_mask(cur, last, flow)
        # label 3 has >= MIN_RECOVER_PX=100 px in last, none in cur -> recover
        assert int(jnp.sum(out == 3)) > 0

    def test_sceneflow_static_scene(self):
        from vido_slam_tpu.frontend.sceneflow import scene_flow_world
        from vido_slam_tpu.geometry.camera import Camera

        cam = Camera(fx=jnp.float32(100.0), fy=jnp.float32(100.0),
                     cx=jnp.float32(32.0), cy=jnp.float32(32.0),
                     dist=jnp.zeros(5), width=64, height=64,
                     bf=jnp.float32(10.0), fps=10.0)
        N = 16
        uv = jnp.tile(jnp.asarray([[20.0, 24.0]]), (N, 1))
        depth = jnp.full((N,), 5.0)
        T = jnp.eye(4)
        sem = jnp.ones((N,), jnp.int32)
        flow3d, sf_norm, valid = scene_flow_world(
            cam, uv, depth, T, uv, depth, T, sem, sem, jnp.ones(N, bool))
        np.testing.assert_allclose(np.asarray(flow3d), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sf_norm), 0.0, atol=1e-6)


class TestImuSmoke:
    def test_preintegration_static(self):
        from vido_slam_tpu.imu.preintegration import (
            ImuCalib, init_preintegration, integrate_measurements)

        calib = ImuCalib.from_config(
            np.eye(4), 1e-3, 1e-2, 1e-5, 1e-4, 100.0)
        n = 5
        acc = jnp.tile(jnp.asarray([[0.0, 0.0, 9.79]]), (n, 1))
        gyr = jnp.zeros((n, 3))
        dts = jnp.full((n,), 0.01)
        st = integrate_measurements(init_preintegration(), acc, gyr, dts,
                                    calib)
        np.testing.assert_allclose(np.asarray(st.dR), np.eye(3), atol=1e-6)


class TestModelBlocksSmoke:
    def test_correlation_tiny(self):
        from vido_slam_tpu.ops.correlation import correlation

        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
        out = correlation(a, a, 1)
        assert out.shape == (1, 8, 8, 49)
        # center tap of self-correlation = mean of squares
        np.testing.assert_allclose(
            np.asarray(out[0, 4, 4, 24]),
            float(jnp.mean(a[0, 4, 4] ** 2)), rtol=1e-5)

    def test_nms_basic(self):
        from vido_slam_tpu.ops.nms import nms

        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                            jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep_idx, keep_ok = nms(boxes, scores, jnp.ones(3, bool), 0.5, 3)
        kept = set(np.asarray(keep_idx)[np.asarray(keep_ok)].tolist())
        assert kept == {0, 2}


class TestDetectionSolverSmoke:
    def test_warmup_multistep_schedule(self):
        """WarmupMultiStepLR semantics (maskrcnn_benchmark/solver/
        lr_scheduler.py): linear warmup from base/3, then gamma decay at
        each milestone."""
        from vido_slam_tpu.parallel.train import warmup_multistep_schedule

        lr = warmup_multistep_schedule(
            base_lr=0.01, warmup_iters=500, steps=(1000, 2000), gamma=0.1)
        np.testing.assert_allclose(float(lr(0)), 0.01 / 3.0, rtol=1e-5)
        np.testing.assert_allclose(float(lr(250)),
                                   0.01 * (1.0 / 3 + 2.0 / 3 * 0.5), rtol=1e-5)
        np.testing.assert_allclose(float(lr(500)), 0.01, rtol=1e-5)
        np.testing.assert_allclose(float(lr(999)), 0.01, rtol=1e-5)
        np.testing.assert_allclose(float(lr(1000)), 0.001, rtol=1e-5)
        np.testing.assert_allclose(float(lr(2500)), 0.0001, rtol=1e-5)

    def test_detection_optimizer_bias_rules(self):
        """SGD solver: biases get 2x lr and no weight decay
        (solver/build.py make_optimizer; defaults.py:397,402)."""
        import optax
        from vido_slam_tpu.parallel.train import make_detection_optimizer

        opt = make_detection_optimizer(
            base_lr=0.01, warmup_iters=0, weight_decay=0.0, momentum=0.0)
        params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
        state = opt.init(params)
        grads = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
        updates, _ = opt.update(grads, state, params)
        # bias update = 2x weight update (BIAS_LR_FACTOR)
        np.testing.assert_allclose(
            np.asarray(updates["b"])[0],
            2.0 * np.asarray(updates["w"])[0, 0], rtol=1e-6)
        # no decay at wd=0: update direction is -lr * grad
        np.testing.assert_allclose(np.asarray(updates["w"])[0, 0],
                                   -0.01, rtol=1e-5)
