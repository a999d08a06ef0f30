import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.estimation.imu_init import (
    estimate_gravity_direction,
    estimate_gyro_bias,
    inertial_optimization,
    initialize_imu,
    linear_alignment,
)
from vido_slam_tpu.geometry.so3 import exp_so3
from vido_slam_tpu.imu.preintegration import (
    GRAVITY_VALUE,
    ImuCalib,
    PreintegrationState,
    bias_corrected_deltas,
    init_preintegration,
    integrate_measurements,
    prepare_segments,
)


def calib():
    return ImuCalib.from_config(
        np.eye(4), noise_gyro=1e-3, noise_acc=1e-3,
        gyro_walk=1e-5, acc_walk=1e-4, freq=200.0,
    )


def simulate_imu(n=100, dt=0.005, omega=(0.1, -0.2, 0.3), acc_b=(0.5, 0.1, -9.79)):
    """Constant body-frame angular velocity and acceleration."""
    w = np.asarray(omega, np.float32)
    a = np.asarray(acc_b, np.float32)
    accs = np.tile(a, (n, 1))
    gyros = np.tile(w, (n, 1))
    dts = np.full(n, dt, np.float32)
    return accs, gyros, dts


def dense_integration(accs, gyros, dts, bias=np.zeros(6)):
    """Euler-ish ground truth with the same midpoint scheme, in float64."""
    import scipy.spatial.transform as st

    dR = np.eye(3)
    dV = np.zeros(3)
    dP = np.zeros(3)
    for a, w, dt in zip(accs, gyros, dts):
        a = a - bias[3:]
        w = w - bias[:3]
        dP = dP + dV * dt + 0.5 * dR @ a * dt * dt
        dV = dV + dR @ a * dt
        dR = dR @ st.Rotation.from_rotvec(w * dt).as_matrix()
    return dR, dV, dP


class TestPreintegration:
    def test_matches_dense_integration(self):
        accs, gyros, dts = simulate_imu()
        st = integrate_measurements(
            init_preintegration(),
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts), calib(),
        )
        dR, dV, dP = dense_integration(accs, gyros, dts)
        np.testing.assert_allclose(np.asarray(st.dR), dR, atol=1e-4)
        np.testing.assert_allclose(np.asarray(st.dV), dV, atol=1e-4)
        np.testing.assert_allclose(np.asarray(st.dP), dP, atol=1e-4)
        np.testing.assert_allclose(float(st.dT), dts.sum(), rtol=1e-5)

    def test_compose_matches_joint_integration(self):
        """compose_preints(A, B) == integrating A's and B's samples as one
        segment: deltas exactly, bias Jacobians and covariance to first
        order."""
        from vido_slam_tpu.imu.preintegration import compose_preints

        rng = np.random.default_rng(0)
        n1, n2 = 37, 23
        accs = rng.normal(0, 2.0, (n1 + n2, 3)).astype(np.float32) + \
            np.asarray([0.0, 0.0, -9.79], np.float32)
        gyros = rng.normal(0, 0.4, (n1 + n2, 3)).astype(np.float32)
        dts = np.full(n1 + n2, 0.005, np.float32)
        c = calib()
        stA = integrate_measurements(
            init_preintegration(), jnp.asarray(accs[:n1]),
            jnp.asarray(gyros[:n1]), jnp.asarray(dts[:n1]), c)
        stB = integrate_measurements(
            init_preintegration(), jnp.asarray(accs[n1:]),
            jnp.asarray(gyros[n1:]), jnp.asarray(dts[n1:]), c)
        stAB = compose_preints(stA, stB)
        ref = integrate_measurements(
            init_preintegration(), jnp.asarray(accs), jnp.asarray(gyros),
            jnp.asarray(dts), c)
        np.testing.assert_allclose(np.asarray(stAB.dR), np.asarray(ref.dR),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(stAB.dV), np.asarray(ref.dV),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(stAB.dP), np.asarray(ref.dP),
                                   atol=1e-4)
        assert abs(float(stAB.dT) - float(ref.dT)) < 1e-6
        for name in ("JRg", "JVg", "JVa", "JPg", "JPa"):
            np.testing.assert_allclose(
                np.asarray(getattr(stAB, name)),
                np.asarray(getattr(ref, name)), atol=2e-3, err_msg=name)
        CA = np.asarray(stAB.C)[:9, :9]
        CR = np.asarray(ref.C)[:9, :9]
        # covariances agree to linearisation accuracy (relative per block)
        for sl in (slice(0, 3), slice(3, 6), slice(6, 9)):
            na = np.linalg.norm(CA[sl, sl])
            nr = np.linalg.norm(CR[sl, sl])
            assert abs(na - nr) <= 0.05 * max(nr, 1e-12), (sl, na, nr)

    def test_padding_noop(self):
        accs, gyros, dts = simulate_imu(n=50)
        a_pad = np.concatenate([accs, np.random.randn(30, 3).astype(np.float32)])
        g_pad = np.concatenate([gyros, np.random.randn(30, 3).astype(np.float32)])
        d_pad = np.concatenate([dts, np.zeros(30, np.float32)])
        s1 = integrate_measurements(
            init_preintegration(), jnp.asarray(accs), jnp.asarray(gyros),
            jnp.asarray(dts), calib())
        s2 = integrate_measurements(
            init_preintegration(), jnp.asarray(a_pad), jnp.asarray(g_pad),
            jnp.asarray(d_pad), calib())
        np.testing.assert_allclose(np.asarray(s1.dR), np.asarray(s2.dR), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.C), np.asarray(s2.C), atol=1e-9)

    def test_covariance_grows(self):
        accs, gyros, dts = simulate_imu()
        st = integrate_measurements(
            init_preintegration(), jnp.asarray(accs), jnp.asarray(gyros),
            jnp.asarray(dts), calib())
        C = np.asarray(st.C)
        assert np.all(np.linalg.eigvalsh(C[:9, :9]) >= -1e-12)
        assert np.trace(C[:9, :9]) > 0
        assert np.trace(C[9:, 9:]) > 0

    def test_bias_correction_first_order(self):
        accs, gyros, dts = simulate_imu()
        st = integrate_measurements(
            init_preintegration(), jnp.asarray(accs), jnp.asarray(gyros),
            jnp.asarray(dts), calib())
        db = np.array([1e-3, -2e-3, 1e-3, 5e-3, -1e-3, 2e-3], np.float32)
        dR_j, dV_j, dP_j = bias_corrected_deltas(st, jnp.asarray(db))
        # reintegrate with the bias actually applied
        dR_t, dV_t, dP_t = dense_integration(accs, gyros, dts, bias=db)
        np.testing.assert_allclose(np.asarray(dR_j), dR_t, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dV_j), dV_t, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dP_j), dP_t, atol=2e-3)

    def test_prepare_segments(self):
        times = np.arange(0.0, 0.1, 0.005)
        accs = np.tile([0.0, 0.0, 1.0], (len(times), 1))
        gyros = np.zeros((len(times), 3))
        a, w, dt = prepare_segments(times, accs, gyros, 0.012, 0.043, 16)
        assert dt.sum() == pytest.approx(0.043 - 0.012, abs=1e-6)
        assert np.all(dt >= 0)


def make_vio_problem(n_frames=12, dt=0.1, scale_gt=2.5, with_bias=False):
    """Body moves with known velocity under gravity; camera poses observed
    at wrong scale (monocular): twb_obs = twb_true / scale_gt."""
    rng = np.random.RandomState(0)
    g_w = np.array([0.0, 0.0, -GRAVITY_VALUE])  # world gravity (z-down world)
    # gravity direction rotation gt: k rotations away from canonical
    Rwg_gt = np.asarray(exp_so3(jnp.array([0.05, -0.08, 0.0])))
    g_vec = Rwg_gt @ g_w

    bg = np.array([0.002, -0.001, 0.003]) if with_bias else np.zeros(3)

    Rwb = [np.eye(3)]
    twb = [np.zeros(3)]
    vel = [np.array([1.0, 0.2, 0.1])]
    omega = np.array([0.1, -0.05, 0.2])
    acc_w = np.array([0.3, -0.1, 0.05])  # constant world acceleration
    cal = calib()

    pre = []
    m_per = 20
    sub = dt / m_per
    for i in range(n_frames - 1):
        R = Rwb[-1]
        st = init_preintegration()
        a_list, w_list, dt_list = [], [], []
        Rk = R.copy()
        vk = vel[-1].copy()
        pk = twb[-1].copy()
        for k in range(m_per):
            # body-frame measured acc = R^T (a_w - g); gyro = omega + bias
            a_b = Rk.T @ (acc_w - g_vec)
            a_list.append(a_b)
            w_list.append(omega + bg)
            dt_list.append(sub)
            pk = pk + vk * sub + 0.5 * acc_w * sub * sub
            vk = vk + acc_w * sub
            Rk = Rk @ np.asarray(exp_so3(jnp.asarray(omega * sub)))
        st = integrate_measurements(
            init_preintegration(),
            jnp.asarray(np.stack(a_list), jnp.float32),
            jnp.asarray(np.stack(w_list), jnp.float32),
            jnp.asarray(np.asarray(dt_list), jnp.float32),
            cal,
        )
        pre.append(st)
        Rwb.append(Rk)
        twb.append(pk)
        vel.append(vk)

    Rwb = np.stack(Rwb)
    twb = np.stack(twb)
    return {
        "Rwb": jnp.asarray(Rwb, jnp.float32),
        "twb": jnp.asarray(twb / scale_gt, jnp.float32),  # mono scale error
        "pre": pre,
        "scale_gt": scale_gt,
        "Rwg_gt": Rwg_gt,
        "bg_gt": bg,
        "vel_gt": np.stack(vel),
    }


def stack_pre(pre):
    dts = jnp.stack([p.dT for p in pre])
    return dict(
        dts=dts,
        dR=jnp.stack([p.dR for p in pre]),
        dV=jnp.stack([p.dV for p in pre]),
        dP=jnp.stack([p.dP for p in pre]),
        JRg=jnp.stack([p.JRg for p in pre]),
        JVg=jnp.stack([p.JVg for p in pre]),
        JVa=jnp.stack([p.JVa for p in pre]),
        JPg=jnp.stack([p.JPg for p in pre]),
        JPa=jnp.stack([p.JPa for p in pre]),
        C9=jnp.stack([p.C[:9, :9] for p in pre]),
    )


class TestInertialInit:
    def test_linear_alignment_recovers_scale(self):
        prob = make_vio_problem()
        pp = stack_pre(prob["pre"])
        pv = jnp.ones(len(prob["pre"]), bool)
        Rwg0 = estimate_gravity_direction(prob["Rwb"], pp["dV"], pv)
        U, s, Rwg, _ = linear_alignment(
            prob["Rwb"], prob["twb"], pp["dts"], pp["dV"], pp["dP"], pv, Rwg0
        )
        # single tangent linearisation: ~10%% accurate; iterating and the LM
        # polish (initialize_imu) tighten it further
        assert float(s) == pytest.approx(prob["scale_gt"], rel=0.12)

    def test_full_init_recovers_scale_and_gravity(self):
        prob = make_vio_problem()
        pp = stack_pre(prob["pre"])
        pv = jnp.ones(len(prob["pre"]), bool)
        res = initialize_imu(prob["Rwb"], prob["twb"], **pp, pair_valid=pv)
        assert float(res.scale) == pytest.approx(prob["scale_gt"], rel=0.02)
        g_est = np.asarray(res.Rwg) @ np.array([0, 0, -GRAVITY_VALUE])
        g_true = prob["Rwg_gt"] @ np.array([0, 0, -GRAVITY_VALUE])
        assert np.linalg.norm(g_est - g_true) < 0.15
        # velocity vertices live in the mono (scaled) frame
        v_mono = prob["vel_gt"] / prob["scale_gt"]
        v_err = np.linalg.norm(np.asarray(res.velocities) - v_mono, axis=1)
        assert v_err.mean() < 0.05

    def test_full_init_recovers_gyro_bias(self):
        prob = make_vio_problem(with_bias=True)
        pp = stack_pre(prob["pre"])
        pv = jnp.ones(len(prob["pre"]), bool)
        res = initialize_imu(prob["Rwb"], prob["twb"], **pp, pair_valid=pv)
        np.testing.assert_allclose(
            np.asarray(res.bg), prob["bg_gt"], atol=5e-4
        )
        assert float(res.scale) == pytest.approx(prob["scale_gt"], rel=0.05)

    def test_gyro_bias_stage(self):
        prob = make_vio_problem(with_bias=True)
        pp = stack_pre(prob["pre"])
        pv = jnp.ones(len(prob["pre"]), bool)
        bg = estimate_gyro_bias(prob["Rwb"], pp["dR"], pp["JRg"], pv)
        np.testing.assert_allclose(np.asarray(bg), prob["bg_gt"], atol=5e-4)

pytestmark = pytest.mark.slow  # heavy jit: full tier only
