"""Joint flow+pose optimization (PoseOptimizationFlow2Cam/Flow2 parity)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.estimation.flow_joint import (
    estimate_camera_pose_joint,
    estimate_object_motion_joint,
    flow_joint_optimization,
)
from vido_slam_tpu.geometry import se3, so3
from vido_slam_tpu.geometry.camera import Camera


def make_cam():
    return Camera.create(fx=816.402, fy=817.38, cx=608.2658, cy=266.688,
                         width=1280, height=560, bf=387.57)


def scene(key, n=200):
    cam = make_cam()
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (n,), minval=50.0, maxval=cam.width - 50.0)
    v = jax.random.uniform(k2, (n,), minval=50.0, maxval=cam.height - 50.0)
    z = jax.random.uniform(k3, (n,), minval=5.0, maxval=40.0)
    uv = jnp.stack([u, v], -1)
    pts = cam.backproject(uv, z)  # world == last camera frame (Twl = I)
    return cam, pts, uv


def pose(tx=0.3, ty=-0.1, tz=0.5, rx=0.01, ry=0.03, rz=-0.02):
    return se3.make_se3(
        so3.exp_so3(jnp.array([rx, ry, rz])), jnp.array([tx, ty, tz])
    )


class TestFlowJoint:
    def test_recovers_pose_and_denoises_flow(self):
        key = jax.random.PRNGKey(0)
        cam, pts, obs_last = scene(key)
        T_true = pose()
        proj_true = cam.project(se3.transform_points(T_true, pts))
        flow_true = proj_true - obs_last
        # measured flow: gaussian noise + 10% gross outliers
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        noise = jax.random.normal(k1, flow_true.shape) * 0.5
        flow_meas = flow_true + noise
        out = jax.random.uniform(k2, (pts.shape[0],)) < 0.10
        flow_meas = jnp.where(out[:, None], flow_meas + 40.0, flow_meas)
        valid = jnp.ones(pts.shape[0], bool)

        T_init = pose(tx=0.25, ty=-0.05, tz=0.4, ry=0.02)
        est = flow_joint_optimization(T_init, pts, obs_last, flow_meas,
                                      valid, cam)
        # pose error small
        dT = se3.compose(se3.inverse_se3(T_true), est.T)
        assert float(jnp.linalg.norm(se3.log_se3(dT))) < 5e-3
        # optimized flow is closer to truth than the measurement (inliers)
        inl = np.asarray(est.inliers)
        e_meas = np.linalg.norm(np.asarray(flow_meas - flow_true), axis=-1)
        e_opt = np.linalg.norm(np.asarray(est.flow - flow_true), axis=-1)
        # (with the reference weights — prior 0.3 vs projection 0.1 — the
        # prior dominates, so the correction is real but moderate)
        assert e_opt[inl].mean() < 0.8 * e_meas[inl].mean()
        # gross outliers rejected
        assert np.asarray(out)[inl].sum() == 0
        assert int(est.num_inliers) > 150

    def test_prior_anchors_outlier_flow(self):
        # an outlier point (fails the chi2 gate) keeps its flow prior only,
        # so the optimized flow relaxes back toward the measurement
        key = jax.random.PRNGKey(2)
        cam, pts, obs_last = scene(key, n=50)
        T_true = pose()
        flow = cam.project(se3.transform_points(T_true, pts)) - obs_last
        flow = flow.at[7].add(jnp.asarray([60.0, -25.0]))  # gross outlier
        valid = jnp.ones(50, bool)
        est = flow_joint_optimization(T_true, pts, obs_last, flow, valid, cam)
        assert not bool(est.inliers[7])
        np.testing.assert_allclose(np.asarray(est.flow[7]),
                                   np.asarray(flow[7]), atol=0.5)
        # non-outlier points unaffected by it
        dT = se3.compose(se3.inverse_se3(T_true), est.T)
        assert float(jnp.linalg.norm(se3.log_se3(dT))) < 1e-3

    def test_camera_wrapper_matches_and_returns_flow(self):
        key = jax.random.PRNGKey(3)
        cam, pts, obs_last = scene(key)
        T_true = pose()
        cur_uv = cam.project(se3.transform_points(T_true, pts))
        cur_uv = cur_uv + jax.random.normal(key, cur_uv.shape) * 0.3
        valid = jnp.ones(pts.shape[0], bool)
        z_cur = se3.transform_points(T_true, pts)[:, 2]
        est, flow = estimate_camera_pose_joint(
            jax.random.PRNGKey(4), pts, obs_last, cur_uv, valid, cam,
            jnp.eye(4), cam.backproject(cur_uv, z_cur),
        )
        dT = se3.compose(se3.inverse_se3(T_true), est.T)
        assert float(jnp.linalg.norm(se3.log_se3(dT))) < 5e-3
        assert flow.shape == cur_uv.shape

    def test_object_wrapper_recovers_motion(self):
        key = jax.random.PRNGKey(5)
        cam, pts, obs_last = scene(key)
        Tcw = pose(tx=0.1, tz=0.2)  # camera moved
        H = pose(tx=0.8, ty=0.0, tz=0.3, ry=0.01)  # object world motion
        pw_cur = se3.transform_points(H, pts)
        pc_cur = se3.transform_points(Tcw, pw_cur)
        cur_uv = cam.project(pc_cur)
        valid = jnp.ones(pts.shape[0], bool)
        est, _ = estimate_object_motion_joint(
            jax.random.PRNGKey(6), Tcw, pts, obs_last, cur_uv, valid, cam,
            jnp.eye(4), jnp.asarray(False), cam.backproject(cur_uv, pc_cur[:, 2]),
        )
        dH = se3.compose(se3.inverse_se3(H), est.T)
        assert float(jnp.linalg.norm(se3.log_se3(dH))) < 1e-2

pytestmark = pytest.mark.slow  # heavy jit: full tier only


def test_proj_jacobian_matches_jacfwd():
    """The closed-form left-perturbation jacobian in _proj_and_jac must
    equal the autodiff jacobian of xi -> project(exp(xi) T X)."""
    import jax
    from vido_slam_tpu.estimation.flow_joint import _proj_and_jac
    from vido_slam_tpu.geometry.se3 import compose, exp_se3
    from vido_slam_tpu.geometry.camera import Camera

    cam = Camera.create(fx=200.0, fy=210.0, cx=96.0, cy=60.0,
                        width=192, height=120, bf=30.0)
    rng = np.random.RandomState(3)
    T = np.asarray(exp_se3(jnp.asarray(
        [0.2, -0.1, 0.3, 0.05, -0.02, 0.04], jnp.float32)))
    pts = jnp.asarray(rng.uniform(-2, 2, (40, 3)) + [0, 0, 8.0],
                      jnp.float32)
    proj, J, z = _proj_and_jac(jnp.asarray(T), pts, cam)

    def f(xi, X):
        Tn = compose(exp_se3(xi), jnp.asarray(T))
        pc = Tn[:3, :3] @ X + Tn[:3, 3]
        return cam.project(pc[None])[0]

    Jref = jax.vmap(lambda X: jax.jacfwd(f)(jnp.zeros(6), X))(pts)
    pref = jax.vmap(lambda X: f(jnp.zeros(6), X))(pts)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(pref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(J), np.asarray(Jref),
                               rtol=1e-4, atol=1e-4)


class TestFlowJointPallasParity:
    """The fused Pallas 4-round solver (estimation/flow_joint_pallas.py)
    must reproduce the XLA flow_joint_optimization: same constants, gates,
    accept/reject policy — parity asserted on final pose, flows, and the
    inlier set (interpret mode on the CPU test backend)."""

    def _problem(self, seed, B):
        key = jax.random.PRNGKey(seed)
        cam, pts, obs_last = scene(key, n=300)
        Ts, valids, flows = [], [], []
        for b in range(B):
            T_true = pose(tx=0.3 + 0.05 * b, ry=0.03 - 0.01 * b)
            proj_true = cam.project(se3.transform_points(T_true, pts))
            flow_true = proj_true - obs_last
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 7 * b + 1))
            noise = jax.random.normal(k1, flow_true.shape) * 0.3
            fm = flow_true + noise
            out = jax.random.uniform(k2, (pts.shape[0],)) < 0.08
            fm = jnp.where(out[:, None], fm + 30.0, fm)
            flows.append(fm)
            valids.append(jnp.ones(pts.shape[0], bool))
            Ts.append(pose(tx=0.25 + 0.05 * b, ry=0.02))
        return (cam, pts, obs_last, jnp.stack(Ts), jnp.stack(flows),
                jnp.stack(valids))

    @pytest.mark.parametrize("B", [1, 3])
    def test_matches_xla(self, B):
        from vido_slam_tpu.estimation.flow_joint_pallas import (
            flow_joint_batched_pallas)

        cam, pts, obs_last, T_init, flow_meas, valid = self._problem(11, B)
        ref = jax.vmap(
            lambda T0, fm, va: flow_joint_optimization(
                T0, pts, obs_last, fm, va, cam)
        )(T_init, flow_meas, valid)
        out = flow_joint_batched_pallas(T_init, pts, obs_last, flow_meas,
                                        valid, cam, interpret=True)
        # final poses agree
        for b in range(B):
            dT = se3.compose(se3.inverse_se3(ref.T[b]), out.T[b])
            assert float(jnp.linalg.norm(se3.log_se3(dT))) < 1e-4, b
        # inlier sets agree except at most a handful of gate-boundary points
        diff = jnp.sum(ref.inliers != out.inliers)
        assert int(diff) <= max(3, int(0.01 * ref.inliers.size))
        # flows of common inliers agree
        both = ref.inliers & out.inliers
        err = jnp.abs(ref.flow - out.flow)[both]
        assert float(jnp.max(err)) < 1e-2
