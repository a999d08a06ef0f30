import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.geometry import (
    se3,
    so3,
)
from vido_slam_tpu.geometry.camera import Camera, convert_depth


def rand_rotvec(key, batch=(), scale=1.0):
    return jax.random.normal(key, batch + (3,)) * scale


class TestSO3:
    def test_exp_identity(self):
        R = so3.exp_so3(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_orthonormal(self):
        key = jax.random.PRNGKey(0)
        w = rand_rotvec(key, (32,))
        R = so3.exp_so3(w)
        eye = jnp.broadcast_to(jnp.eye(3), (32, 3, 3))
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(32), atol=1e-5)

    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(1)
        w = rand_rotvec(key, (64,), scale=0.8)
        w2 = so3.log_so3(so3.exp_so3(w))
        np.testing.assert_allclose(w, w2, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([1e-9, -1e-9, 1e-10])
        R = so3.exp_so3(w)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)
        np.testing.assert_allclose(so3.log_so3(R), w, atol=1e-7)

    def test_exp_matches_scipy_rodrigues(self):
        # closed-form check against an independent implementation
        w = np.array([0.3, -0.5, 0.7], np.float64)
        theta = np.linalg.norm(w)
        k = w / theta
        K = np.array(
            [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
        )
        R_ref = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        R = so3.exp_so3(jnp.asarray(w, jnp.float32))
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_right_jacobian_finite_diff(self):
        # Jr relates additive tangent perturbation to group perturbation:
        # exp(w + dw) ≈ exp(w) exp(Jr(w) dw)
        w = jnp.array([0.2, -0.4, 0.1])
        Jr = so3.right_jacobian_so3(w)
        eps = 1e-4
        for i in range(3):
            dw = jnp.zeros(3).at[i].set(eps)
            lhs = so3.exp_so3(w + dw)
            rhs = so3.exp_so3(w) @ so3.exp_so3(Jr @ dw)
            np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_right_jacobian_inverse(self):
        key = jax.random.PRNGKey(2)
        w = rand_rotvec(key, (16,), scale=0.5)
        J = so3.right_jacobian_so3(w)
        Jinv = so3.right_jacobian_inv_so3(w)
        eye = jnp.broadcast_to(jnp.eye(3), (16, 3, 3))
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-5)

    def test_hat_vee(self):
        w = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(so3.vee(so3.hat(w)), w)

    def test_normalize_rotation(self):
        key = jax.random.PRNGKey(3)
        R = so3.exp_so3(rand_rotvec(key))
        noisy = R + 0.01 * jax.random.normal(jax.random.PRNGKey(4), (3, 3))
        Rn = so3.normalize_rotation(noisy)
        np.testing.assert_allclose(Rn @ Rn.T, np.eye(3), atol=1e-5)
        assert float(jnp.linalg.det(Rn)) == pytest.approx(1.0, abs=1e-5)

    def test_grad_through_exp(self):
        # gradients must be finite at and near zero rotation
        f = lambda w: jnp.sum(so3.exp_so3(w) ** 2)
        g0 = jax.grad(f)(jnp.zeros(3))
        assert np.all(np.isfinite(g0))
        g1 = jax.grad(f)(jnp.array([1e-6, 0.0, 0.0]))
        assert np.all(np.isfinite(g1))


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (32, 6)) * 0.7
        xi2 = se3.log_se3(se3.exp_se3(xi))
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_inverse(self):
        key = jax.random.PRNGKey(6)
        T = se3.exp_se3(jax.random.normal(key, (8, 6)))
        eye = jnp.broadcast_to(jnp.eye(4), (8, 4, 4))
        np.testing.assert_allclose(T @ se3.inverse_se3(T), eye, atol=1e-5)

    def test_transform_points(self):
        T = se3.make_se3(so3.exp_so3(jnp.array([0.0, 0.0, jnp.pi / 2])), jnp.array([1.0, 0.0, 0.0]))
        p = jnp.array([1.0, 0.0, 0.0])
        out = se3.transform_points(T, p)
        np.testing.assert_allclose(out, [1.0, 1.0, 0.0], atol=1e-6)

    def test_transform_points_batched(self):
        key = jax.random.PRNGKey(7)
        T = se3.exp_se3(jax.random.normal(key, (6,)))
        pts = jax.random.normal(jax.random.PRNGKey(8), (10, 3))
        out = se3.transform_points(T, pts)
        hom = jnp.concatenate([pts, jnp.ones((10, 1))], axis=-1)
        expect = (T @ hom.T).T[:, :3]
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_adjoint(self):
        # T exp(xi) T^-1 = exp(Ad_T xi)
        key = jax.random.PRNGKey(9)
        T = se3.exp_se3(jax.random.normal(key, (6,)) * 0.5)
        xi = jax.random.normal(jax.random.PRNGKey(10), (6,)) * 0.1
        lhs = T @ se3.exp_se3(xi) @ se3.inverse_se3(T)
        rhs = se3.exp_se3(se3.adjoint_se3(T) @ xi)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)


class TestCamera:
    def make(self):
        return Camera.create(fx=816.402, fy=817.38, cx=608.2658, cy=266.688,
                             width=1280, height=560, bf=387.57)

    def test_project_backproject(self):
        cam = self.make()
        uv = jnp.array([[100.0, 200.0], [640.0, 280.0], [1000.0, 50.0]])
        depth = jnp.array([5.0, 10.0, 33.0])
        pts = cam.backproject(uv, depth)
        uv2 = cam.project(pts)
        np.testing.assert_allclose(uv, uv2, atol=1e-3)
        np.testing.assert_allclose(pts[:, 2], depth)

    def test_in_bounds(self):
        cam = self.make()
        uv = jnp.array([[0.0, 0.0], [-1.0, 5.0], [1279.5, 100.0], [1280.0, 100.0]])
        np.testing.assert_array_equal(cam.in_bounds(uv), [True, False, True, False])

    def test_convert_depth_kaist(self):
        # KAIST: scale * bf / (d / factor), Tracking.cc:318
        raw = jnp.array([[1000.0, 0.0], [-5.0, 500.0]])
        out = convert_depth(raw, "kaist", depth_map_factor=500.0, bf=387.57, scale=1.0)
        np.testing.assert_allclose(out[0, 0], 387.57 / 2.0, rtol=1e-6)
        assert out[0, 1] == 0.0  # zero raw -> invalid
        assert out[1, 0] == 0.0  # negative raw -> invalid
        np.testing.assert_allclose(out[1, 1], 387.57, rtol=1e-6)

    def test_convert_depth_kitti_omd(self):
        raw = jnp.array([250.0])
        kitti = convert_depth(raw, "kitti", 500.0, bf=387.57)
        np.testing.assert_allclose(kitti, 387.57 * 2.0, rtol=1e-6)
        omd = convert_depth(raw, "omd", 500.0, bf=0.0)
        np.testing.assert_allclose(omd, 0.5, rtol=1e-6)

pytestmark = pytest.mark.slow  # heavy jit: full tier only
