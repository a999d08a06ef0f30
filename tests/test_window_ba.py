import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.estimation.window_ba import solve_window_ba
from vido_slam_tpu.geometry import se3, so3
from vido_slam_tpu.geometry.camera import Camera


def build_problem(key, W=6, P=60, pose_noise=0.02, point_noise=0.05,
                  obs_noise=0.0, drop_frac=0.0):
    """Ground-truth trajectory + points; noisy initialisation; exact obs."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # GT camera path: forward motion with small rotation
    step = se3.make_se3(
        so3.exp_so3(jnp.array([0.0, 0.02, 0.0])), jnp.array([0.1, 0.0, 0.5])
    )
    Twc_gt = [jnp.eye(4)]
    for _ in range(W - 1):
        Twc_gt.append(se3.compose(Twc_gt[-1], step))
    Twc_gt = jnp.stack(Twc_gt)

    # GT points in front of the trajectory
    X_gt = jax.random.uniform(
        k1, (P, 3), minval=jnp.array([-5.0, -2.0, 3.0]),
        maxval=jnp.array([5.0, 2.0, 25.0]),
    )

    # exact camera-frame observations
    Tcw_gt = se3.inverse_se3(Twc_gt)
    obs = jnp.einsum("wij,pj->wpi", Tcw_gt[:, :3, :3], X_gt) + Tcw_gt[:, None, :3, 3]
    if obs_noise > 0:
        obs = obs + obs_noise * jax.random.normal(k2, obs.shape)
    obs_valid = obs[..., 2] > 0.5
    if drop_frac > 0:
        obs_valid = obs_valid & (jax.random.uniform(k3, obs_valid.shape) > drop_frac)

    # noisy initial poses (first pose exact: gauge) and points
    xi = pose_noise * jax.random.normal(k4, (W, 6))
    xi = xi.at[0].set(0.0)
    Twc0 = se3.compose(Twc_gt, se3.exp_se3(xi))
    X0 = X_gt + point_noise * jax.random.normal(k5, (P, 3))

    # exact odometry measurements
    odom = se3.compose(se3.inverse_se3(Twc_gt[:-1]), Twc_gt[1:])
    odom_valid = jnp.ones(W - 1, bool)
    point_valid = jnp.sum(obs_valid, axis=0) >= 3
    return Twc_gt, X_gt, Twc0, X0, odom, odom_valid, obs, obs_valid, point_valid


class TestWindowBA:
    def test_recovers_exact_solution(self):
        (Twc_gt, X_gt, Twc0, X0, odom, odom_valid, obs, obs_valid,
         point_valid) = build_problem(jax.random.PRNGKey(0))
        res = solve_window_ba(
            Twc0, odom, odom_valid, X0, obs, obs_valid, point_valid, max_iters=30
        )
        np.testing.assert_allclose(np.asarray(res.Twc), np.asarray(Twc_gt), atol=3e-3)
        err = np.linalg.norm(
            np.asarray(res.points - X_gt)[np.asarray(point_valid)], axis=-1
        )
        assert err.max() < 2e-2

    def test_reduces_cost_with_noise(self):
        (Twc_gt, X_gt, Twc0, X0, odom, odom_valid, obs, obs_valid,
         point_valid) = build_problem(
            jax.random.PRNGKey(1), obs_noise=0.01, drop_frac=0.3
        )
        res = solve_window_ba(
            Twc0, odom, odom_valid, X0, obs, obs_valid, point_valid, max_iters=30
        )
        # pose error must improve vs initialisation
        def pose_err(T):
            d = se3.log_se3(se3.compose(se3.inverse_se3(Twc_gt), T))
            return float(jnp.linalg.norm(d))

        assert pose_err(res.Twc) < 0.5 * pose_err(Twc0)

    def test_gauge_fixed_first_pose(self):
        (Twc_gt, X_gt, Twc0, X0, odom, odom_valid, obs, obs_valid,
         point_valid) = build_problem(jax.random.PRNGKey(2))
        res = solve_window_ba(
            Twc0, odom, odom_valid, X0, obs, obs_valid, point_valid, max_iters=10
        )
        np.testing.assert_allclose(np.asarray(res.Twc[0]), np.eye(4), atol=1e-5)

    def test_handles_padding(self):
        # front-pad 2 invalid frames: all-eye poses, no odom, no obs
        (Twc_gt, X_gt, Twc0, X0, odom, odom_valid, obs, obs_valid,
         point_valid) = build_problem(jax.random.PRNGKey(3), W=4)
        pad = 2
        W = 4 + pad
        eye = jnp.tile(jnp.eye(4), (pad, 1, 1))
        Twc0p = jnp.concatenate([eye, Twc0])
        odom_p = jnp.concatenate([jnp.tile(jnp.eye(4), (pad, 1, 1)), odom])
        odom_v = jnp.concatenate([jnp.zeros(pad, bool), odom_valid])
        obs_p = jnp.concatenate([jnp.zeros((pad,) + obs.shape[1:]), obs])
        obs_vp = jnp.concatenate([jnp.zeros((pad,) + obs_valid.shape[1:], bool), obs_valid])
        frame_valid = jnp.concatenate([jnp.zeros(pad, bool), jnp.ones(4, bool)])
        res = solve_window_ba(
            Twc0p, odom_p, odom_v, X0, obs_p, obs_vp, point_valid, frame_valid,
            max_iters=20,
        )
        assert np.all(np.isfinite(np.asarray(res.Twc)))
        np.testing.assert_allclose(
            np.asarray(res.Twc[pad:]), np.asarray(Twc_gt), atol=5e-3
        )

    def test_robust_to_outlier_observations(self):
        (Twc_gt, X_gt, Twc0, X0, odom, odom_valid, obs, obs_valid,
         point_valid) = build_problem(jax.random.PRNGKey(4))
        # corrupt 5% of observations grossly
        key = jax.random.PRNGKey(5)
        corrupt = jax.random.uniform(key, obs_valid.shape) < 0.05
        obs_c = jnp.where(corrupt[..., None], obs + 5.0, obs)
        res = solve_window_ba(
            Twc0, odom, odom_valid, X0, obs_c, obs_valid, point_valid, max_iters=30
        )
        d = se3.log_se3(se3.compose(se3.inverse_se3(Twc_gt), res.Twc))
        assert float(jnp.linalg.norm(d)) < 0.05
