import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.estimation import (
    estimate_camera_pose,
    estimate_object_motion,
    object_motion_optimization,
    pose_optimization,
)
from vido_slam_tpu.estimation.lm import lm_solve
from vido_slam_tpu.estimation.ransac import pnp_ransac
from vido_slam_tpu.geometry import se3, so3
from vido_slam_tpu.geometry.camera import Camera


def make_cam():
    return Camera.create(fx=816.402, fy=817.38, cx=608.2658, cy=266.688,
                         width=1280, height=560, bf=387.57)


def synthetic_scene(key, n=200, depth_range=(5.0, 40.0)):
    """Random world points visible from identity camera."""
    cam = make_cam()
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (n,), minval=50.0, maxval=cam.width - 50.0)
    v = jax.random.uniform(k2, (n,), minval=50.0, maxval=cam.height - 50.0)
    z = jax.random.uniform(k3, (n,), minval=depth_range[0], maxval=depth_range[1])
    pts = cam.backproject(jnp.stack([u, v], -1), z)
    return cam, pts


def small_pose(tx=0.3, ty=-0.1, tz=0.5, rx=0.01, ry=0.03, rz=-0.02):
    return se3.make_se3(
        so3.exp_so3(jnp.array([rx, ry, rz])), jnp.array([tx, ty, tz])
    )


class TestLM:
    def test_quadratic(self):
        # fit y = a*x + b
        x = jnp.linspace(0, 1, 50)
        y = 2.0 * x + 1.0

        def residual(p):
            return (p[0] * x + p[1] - y)[:, None]

        res = lm_solve(residual, jnp.zeros(2), max_iters=50)
        np.testing.assert_allclose(res.x, [2.0, 1.0], atol=1e-4)

    def test_huber_downweights_outliers(self):
        x = jnp.linspace(0, 1, 50)
        y = 2.0 * x + 1.0
        y = y.at[0].set(100.0)  # gross outlier

        def residual(p):
            return (p[0] * x + p[1] - y)[:, None]

        res_plain = lm_solve(residual, jnp.zeros(2), max_iters=50)
        res_huber = lm_solve(residual, jnp.zeros(2), max_iters=50, huber_delta=0.1)
        err_plain = abs(float(res_plain.x[0]) - 2.0)
        err_huber = abs(float(res_huber.x[0]) - 2.0)
        assert err_huber < err_plain / 10

    def test_mask_removes_blocks(self):
        x = jnp.linspace(0, 1, 50)
        y = 2.0 * x + 1.0
        y = y.at[0].set(100.0)
        mask = jnp.ones(50, bool).at[0].set(False)

        def residual(p):
            return (p[0] * x + p[1] - y)[:, None]

        res = lm_solve(residual, jnp.zeros(2), mask=mask, max_iters=50)
        np.testing.assert_allclose(res.x, [2.0, 1.0], atol=1e-3)


class TestGNAndDogleg:
    """g2o ships three optimization algorithms (optimization_algorithm_
    {levenberg,gauss_newton,dogleg}.h); the reference pipeline constructs
    only Levenberg — GN/Dogleg are API-completeness counterparts and must
    reach the same optimum as LM on a well-conditioned problem."""

    def _fit(self, solver, **kw):
        from vido_slam_tpu.estimation.lm import dogleg_solve, gn_solve
        x = jnp.linspace(0, 1, 50)
        y = 2.0 * jnp.exp(-1.3 * x) + 0.05 * jnp.sin(37 * x)

        def residual(p):
            return (p[0] * jnp.exp(-p[1] * x) - y)[:, None]

        return solver(residual, jnp.asarray([1.0, 0.0]), max_iters=50, **kw)

    def test_gn_matches_lm(self):
        from vido_slam_tpu.estimation.lm import gn_solve
        r_lm = self._fit(lm_solve)
        r_gn = self._fit(gn_solve)
        np.testing.assert_allclose(r_gn.x, r_lm.x, atol=1e-3)
        assert abs(float(r_gn.cost) - float(r_lm.cost)) < 1e-6

    def test_dogleg_matches_lm(self):
        from vido_slam_tpu.estimation.lm import dogleg_solve
        r_lm = self._fit(lm_solve)
        r_dl = self._fit(dogleg_solve)
        np.testing.assert_allclose(r_dl.x, r_lm.x, atol=1e-3)

    def test_dogleg_trust_region_bounds_first_step(self):
        from vido_slam_tpu.estimation.lm import dogleg_solve
        # a tiny trust radius must still converge (radius grows on good steps)
        r = self._fit(dogleg_solve, trust_radius=1e-3)
        np.testing.assert_allclose(r.x, [2.0107, 1.3137], atol=5e-3)

    def test_gn_respects_mask_and_huber(self):
        from vido_slam_tpu.estimation.lm import gn_solve
        x = jnp.linspace(0, 1, 50)
        y = (2.0 * x + 1.0).at[0].set(100.0)
        mask = jnp.ones(50, bool).at[0].set(False)

        def residual(p):
            return (p[0] * x + p[1] - y)[:, None]

        r = gn_solve(residual, jnp.zeros(2), mask=mask, max_iters=50)
        np.testing.assert_allclose(r.x, [2.0, 1.0], atol=1e-3)


class TestPoseOptimization:
    def test_recovers_exact_pose(self):
        cam, pts_w = synthetic_scene(jax.random.PRNGKey(0))
        T_true = small_pose()
        obs = cam.project(se3.transform_points(T_true, pts_w))
        valid = jnp.ones(pts_w.shape[0], bool)
        # start from a perturbed pose
        T0 = se3.compose(se3.exp_se3(jnp.array([0.05, -0.02, 0.1, 0.005, -0.01, 0.002])), T_true)
        est = pose_optimization(T0, pts_w, obs, valid, cam)
        np.testing.assert_allclose(np.array(est.T), np.array(T_true), atol=2e-3)
        assert int(est.num_inliers) > 190

    def test_outliers_rejected(self):
        cam, pts_w = synthetic_scene(jax.random.PRNGKey(1))
        T_true = small_pose()
        obs = cam.project(se3.transform_points(T_true, pts_w))
        # corrupt 20% of observations
        n_bad = 40
        obs = obs.at[:n_bad].add(jnp.full((n_bad, 2), 30.0))
        valid = jnp.ones(pts_w.shape[0], bool)
        est = pose_optimization(T_true, pts_w, obs, valid, cam)
        assert not bool(jnp.any(est.inliers[:n_bad]))
        assert int(est.num_inliers) >= 150
        np.testing.assert_allclose(np.array(est.T), np.array(T_true), atol=5e-3)


class TestRansac:
    def test_finds_pose_with_outliers(self):
        cam, pts_w = synthetic_scene(jax.random.PRNGKey(2), n=300)
        T_true = small_pose(tx=1.0, tz=2.0, ry=0.05)
        obs = cam.project(se3.transform_points(T_true, pts_w))
        # 30% outliers
        key = jax.random.PRNGKey(3)
        noise = jax.random.uniform(key, (90, 2), minval=-200, maxval=200)
        obs = obs.at[:90].add(noise)
        valid = jnp.ones(300, bool)
        rr = pnp_ransac(jax.random.PRNGKey(4), pts_w, obs, valid, cam)
        assert int(rr.num_inliers) > 180
        # inliers should be (mostly) the uncorrupted points
        assert int(jnp.sum(rr.inliers[:90])) < 10
        np.testing.assert_allclose(np.array(rr.T), np.array(T_true), atol=0.05)

    def test_respects_valid_mask(self):
        cam, pts_w = synthetic_scene(jax.random.PRNGKey(5), n=100)
        T_true = small_pose()
        obs = cam.project(se3.transform_points(T_true, pts_w))
        valid = jnp.zeros(100, bool).at[:50].set(True)
        rr = pnp_ransac(jax.random.PRNGKey(6), pts_w, obs, valid, cam)
        assert int(rr.num_inliers) <= 50


class TestEstimateCameraPose:
    def test_pipeline_beats_bad_motion_model(self):
        cam, pts_w = synthetic_scene(jax.random.PRNGKey(7), n=400)
        T_true = small_pose(tx=0.5, tz=1.0)
        obs = cam.project(se3.transform_points(T_true, pts_w))
        valid = jnp.ones(400, bool)
        T_mm = jnp.eye(4)  # wrong motion model
        est = estimate_camera_pose(jax.random.PRNGKey(8), pts_w, obs, valid, cam, T_mm)
        np.testing.assert_allclose(np.array(est.T), np.array(T_true), atol=5e-3)

    def test_pipeline_uses_good_motion_model(self):
        cam, pts_w = synthetic_scene(jax.random.PRNGKey(9), n=50)
        T_true = small_pose()
        obs = cam.project(se3.transform_points(T_true, pts_w))
        valid = jnp.ones(50, bool)
        est = estimate_camera_pose(jax.random.PRNGKey(10), pts_w, obs, valid, cam, T_true)
        np.testing.assert_allclose(np.array(est.T), np.array(T_true), atol=1e-3)


class TestObjectMotion:
    def test_recovers_object_motion(self):
        cam, pts_w = synthetic_scene(jax.random.PRNGKey(11), n=150, depth_range=(8.0, 20.0))
        Tcw = small_pose(tx=0.1, tz=0.3)
        # object moves in world frame
        H_true = se3.make_se3(
            so3.exp_so3(jnp.array([0.0, 0.02, 0.0])), jnp.array([0.8, 0.0, -0.4])
        )
        pts_moved = se3.transform_points(H_true, pts_w)
        obs = cam.project(se3.transform_points(Tcw, pts_moved))
        valid = jnp.ones(150, bool)
        est = estimate_object_motion(
            jax.random.PRNGKey(12), Tcw, pts_w, obs, valid, cam,
            jnp.eye(4), jnp.bool_(False),
        )
        np.testing.assert_allclose(np.array(est.T), np.array(H_true), atol=5e-3)
        assert int(est.num_inliers) > 140

    def test_motion_model_hypothesis_wins_when_exact(self):
        cam, pts_w = synthetic_scene(jax.random.PRNGKey(13), n=60, depth_range=(8.0, 20.0))
        Tcw = small_pose()
        H_true = se3.make_se3(jnp.eye(3), jnp.array([0.5, 0.0, 0.0]))
        obs = cam.project(se3.transform_points(Tcw, se3.transform_points(H_true, pts_w)))
        valid = jnp.ones(60, bool)
        est = estimate_object_motion(
            jax.random.PRNGKey(14), Tcw, pts_w, obs, valid, cam,
            H_true, jnp.bool_(True),
        )
        np.testing.assert_allclose(np.array(est.T), np.array(H_true), atol=1e-3)

pytestmark = pytest.mark.slow  # heavy jit: full tier only


class TestPoseLMPallasParity:
    """Fused Pallas unary-reprojection LM (estimation/lm_pallas.py) vs the
    lm_solve-driven XLA path — camera (Huber) and object (P = K*Tcw, no
    kernel) variants, interpret mode on the CPU test backend."""

    def _scene(self, seed, n=400):
        import jax
        key = jax.random.PRNGKey(seed)
        cam = Camera.create(fx=408.2, fy=408.7, cx=304.1, cy=133.3,
                            width=640, height=192, bf=193.8)
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (n,), minval=30.0, maxval=610.0)
        v = jax.random.uniform(k2, (n,), minval=20.0, maxval=172.0)
        z = jax.random.uniform(k3, (n,), minval=5.0, maxval=40.0)
        pts = cam.backproject(jnp.stack([u, v], -1), z)
        return cam, pts

    def test_camera_matches_xla(self):
        import jax
        from vido_slam_tpu.estimation.lm_pallas import pose_lm_batched_pallas
        from vido_slam_tpu.estimation.pose import (
            HUBER_DELTA_POSE, pose_optimization)
        from vido_slam_tpu.geometry import se3, so3

        cam, pts = self._scene(0)
        T_true = se3.make_se3(so3.exp_so3(jnp.array([0.01, 0.03, -0.02])),
                              jnp.array([0.3, -0.1, 0.5]))
        obs = cam.project(se3.transform_points(T_true, pts))
        k = jax.random.PRNGKey(5)
        obs = obs + 0.05 * jax.random.normal(k, obs.shape)
        valid = jnp.ones(pts.shape[0], bool)
        T0 = se3.make_se3(so3.exp_so3(jnp.array([0.0, 0.02, 0.0])),
                          jnp.array([0.25, 0.0, 0.45]))
        ref = pose_optimization(T0, pts, obs, valid, cam)
        pb = pose_lm_batched_pallas(
            T0[None], jnp.eye(4)[None], pts[None], obs[None], valid[None],
            cam, huber_delta=HUBER_DELTA_POSE, max_iters=100,
            interpret=True)
        dT = se3.compose(se3.inverse_se3(ref.T), pb.T[0])
        assert float(jnp.linalg.norm(se3.log_se3(dT))) < 1e-4
        np.testing.assert_allclose(np.asarray(pb.chi2[0]),
                                   np.asarray(ref.chi2), atol=1e-4)

    def test_object_batch_matches_xla(self):
        import jax
        from vido_slam_tpu.estimation.lm_pallas import pose_lm_batched_pallas
        from vido_slam_tpu.estimation.pose import (
            RP_THRES, object_motion_optimization)
        from vido_slam_tpu.geometry import se3, so3

        cam, pts = self._scene(2, n=300)
        Tcw = se3.make_se3(so3.exp_so3(jnp.array([0.0, 0.05, 0.0])),
                           jnp.array([0.1, 0.0, 0.3]))
        K = 3
        Hs, obss, valids, H0s = [], [], [], []
        for b in range(K):
            H_true = se3.make_se3(
                so3.exp_so3(jnp.array([0.0, 0.01 * b, 0.0])),
                jnp.array([0.4 + 0.1 * b, 0.0, -0.2]))
            pw = se3.transform_points(H_true, pts)
            obs = cam.project(se3.transform_points(Tcw, pw))
            obs = obs + 0.03 * jax.random.normal(
                jax.random.PRNGKey(10 + b), obs.shape)
            obss.append(obs)
            valids.append(jnp.arange(pts.shape[0]) % (b + 2) != 0)
            H0s.append(se3.make_se3(jnp.eye(3),
                                    jnp.array([0.35 + 0.1 * b, 0.0, -0.15])))
        # per-object observations differ -> pass batched obs
        pb = pose_lm_batched_pallas(
            jnp.stack(H0s), jnp.broadcast_to(Tcw, (K, 4, 4)), pts,
            jnp.stack(obss), jnp.stack(valids), cam, huber_delta=None,
            max_iters=100, interpret=True)
        for b in range(K):
            ref = object_motion_optimization(H0s[b], Tcw, pts, obss[b],
                                             valids[b], cam)
            dT = se3.compose(se3.inverse_se3(ref.T), pb.T[b])
            assert float(jnp.linalg.norm(se3.log_se3(dT))) < 1e-4, b
            ref_inl = ref.inliers
            pal_inl = (pb.chi2[b] <= RP_THRES) & valids[b]
            assert int(jnp.sum(ref_inl != pal_inl)) <= 3, b


def test_ransac_matmul_scoring_matches_vmapped():
    """The (N,4)@(4,3H) matmul scoring path must count EXACTLY like the
    per-hypothesis _score (same projection guard, threshold, z gate)."""
    import jax
    from vido_slam_tpu.estimation.ransac import _score, _score_counts_all
    from vido_slam_tpu.geometry import se3, so3

    cam = Camera.create(fx=408.2, fy=408.7, cx=304.1, cy=133.3,
                        width=640, height=192, bf=193.8)
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    N, H = 700, 64
    u = jax.random.uniform(k1, (N,), minval=10.0, maxval=630.0)
    v = jax.random.uniform(k2, (N,), minval=10.0, maxval=182.0)
    z = jax.random.uniform(k3, (N,), minval=2.0, maxval=60.0)
    X = cam.backproject(jnp.stack([u, v], -1), z)
    T_true = se3.make_se3(so3.exp_so3(jnp.array([0.02, -0.03, 0.01])),
                          jnp.array([0.2, 0.1, -0.4]))
    obs = cam.project(se3.transform_points(T_true, X))
    obs = obs + 0.3 * jax.random.normal(k4, obs.shape)
    valid = jnp.arange(N) % 5 != 0
    xi = jax.random.normal(jax.random.PRNGKey(9), (H, 6)) * 0.05
    Ts = jax.vmap(lambda d: se3.compose(se3.exp_se3(d), T_true))(xi)
    counts = _score_counts_all(Ts, X, obs, cam, valid, 0.4)
    _, ref = jax.vmap(lambda T: _score(T, X, obs, cam, valid, 0.4))(Ts)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref))
