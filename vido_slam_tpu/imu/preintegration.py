"""IMU preintegration — ORB-SLAM3's IMU::Preintegrated (reference
vido_slam/src/ImuTypes.cc:245-302 IntegrateNewMeasurement, include/
ImuTypes.h:32-230) as a `lax.scan` over fixed-size measurement buckets.

State per frame interval: delta rotation/velocity/position (dR, dV, dP),
bias Jacobians (JRg, JVg, JPg, JVa, JPa), 15x15 covariance C (order:
[rot, vel, pos, bg, ba]) and total time dT. The midpoint update order is
position -> velocity -> rotation, exactly as the reference. Padded
measurement slots carry dt = 0, which makes the update a no-op — the
fixed-shape masking pattern.

GRAVITY_VALUE = 9.79 (ImuTypes.h:29). Noise scaling follows
Tracking::ParseIMUParamFile (Tracking.cc:174-275): discrete noise =
density * sqrt(freq), discrete walk = walk / sqrt(freq).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vido_slam_tpu.geometry.so3 import (
    exp_so3,
    hat,
    normalize_rotation,
    right_jacobian_so3,
)

GRAVITY_VALUE = 9.79
_HI = lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


class ImuCalib(NamedTuple):
    Tbc: jnp.ndarray       # (4, 4) camera->body
    # discrete-time noise std (already * sqrt(freq) / / sqrt(freq))
    sigma_g: jnp.ndarray
    sigma_a: jnp.ndarray
    sigma_gw: jnp.ndarray
    sigma_aw: jnp.ndarray

    @classmethod
    def from_config(cls, Tbc, noise_gyro, noise_acc, gyro_walk, acc_walk, freq):
        sf = float(np.sqrt(freq))
        return cls(
            Tbc=jnp.asarray(Tbc, jnp.float32),
            sigma_g=jnp.float32(noise_gyro * sf),
            sigma_a=jnp.float32(noise_acc * sf),
            sigma_gw=jnp.float32(gyro_walk / sf),
            sigma_aw=jnp.float32(acc_walk / sf),
        )

    @property
    def Nga(self) -> jnp.ndarray:
        d = jnp.concatenate([
            jnp.full(3, self.sigma_g ** 2), jnp.full(3, self.sigma_a ** 2)
        ])
        return jnp.diag(d)

    @property
    def NgaWalk(self) -> jnp.ndarray:
        d = jnp.concatenate([
            jnp.full(3, self.sigma_gw ** 2), jnp.full(3, self.sigma_aw ** 2)
        ])
        return jnp.diag(d)


class PreintegrationState(NamedTuple):
    dR: jnp.ndarray    # (3, 3)
    dV: jnp.ndarray    # (3,)
    dP: jnp.ndarray    # (3,)
    JRg: jnp.ndarray   # (3, 3)
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    C: jnp.ndarray     # (15, 15)
    dT: jnp.ndarray    # scalar
    bias: jnp.ndarray  # (6,) [bg, ba] used at integration time


def init_preintegration(bias: jnp.ndarray | None = None) -> PreintegrationState:
    z33 = jnp.zeros((3, 3))
    return PreintegrationState(
        dR=jnp.eye(3),
        dV=jnp.zeros(3),
        dP=jnp.zeros(3),
        JRg=z33, JVg=z33, JVa=z33, JPg=z33, JPa=z33,
        C=jnp.zeros((15, 15)),
        dT=jnp.float32(0.0),
        bias=jnp.zeros(6) if bias is None else jnp.asarray(bias),
    )


def _integrate_one(state: PreintegrationState, acc, gyro, dt, calib: ImuCalib):
    """One midpoint update (ImuTypes.cc:245-301). dt == 0 is a no-op."""
    bg = state.bias[:3]
    ba = state.bias[3:]
    a = acc - ba
    w = gyro - bg

    dR, dV, dP = state.dR, state.dV, state.dP

    # position/velocity first (use pre-update dR)
    dP_new = dP + dV * dt + 0.5 * dt * dt * (dR @ a)
    dV_new = dV + dt * (dR @ a)

    Wacc = hat(a)
    A = jnp.eye(9)
    B = jnp.zeros((9, 6))
    A = A.at[3:6, 0:3].set(-_mm(dR, Wacc) * dt)
    A = A.at[6:9, 0:3].set(-0.5 * dt * dt * _mm(dR, Wacc))
    A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
    B = B.at[3:6, 3:6].set(dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * dt * dt * dR)

    # bias jacobians (pre-update dR)
    JPa_new = state.JPa + state.JVa * dt - 0.5 * dt * dt * dR
    JPg_new = state.JPg + state.JVg * dt - 0.5 * dt * dt * _mm(_mm(dR, Wacc), state.JRg)
    JVa_new = state.JVa - dR * dt
    JVg_new = state.JVg - dt * _mm(_mm(dR, Wacc), state.JRg)

    # rotation update
    dRi = exp_so3(w * dt)
    rightJ = right_jacobian_so3(w * dt)
    dR_new = normalize_rotation(_mm(dR, dRi))
    A = A.at[0:3, 0:3].set(dRi.T)
    B = B.at[0:3, 0:3].set(rightJ * dt)

    C9 = state.C[:9, :9]
    C9_new = _mm(_mm(A, C9), A.T) + _mm(_mm(B, calib.Nga), B.T)
    C_new = state.C.at[:9, :9].set(C9_new)
    C_new = C_new.at[9:, 9:].add(calib.NgaWalk)

    JRg_new = _mm(dRi.T, state.JRg) - rightJ * dt

    new = PreintegrationState(
        dR=dR_new, dV=dV_new, dP=dP_new,
        JRg=JRg_new, JVg=JVg_new, JVa=JVa_new, JPg=JPg_new, JPa=JPa_new,
        C=C_new, dT=state.dT + dt, bias=state.bias,
    )
    # dt == 0 (padding) leaves the state untouched
    keep = dt > 0
    return jax.tree.map(lambda n, o: jnp.where(keep, n, o), new, state)


@jax.jit
def integrate_measurements(
    state: PreintegrationState,
    accs: jnp.ndarray,   # (M, 3)
    gyros: jnp.ndarray,  # (M, 3)
    dts: jnp.ndarray,    # (M,) with 0 for padding slots
    calib: ImuCalib,
) -> PreintegrationState:
    def body(st, x):
        a, w, dt = x
        return _integrate_one(st, a, w, dt, calib), None

    out, _ = lax.scan(body, state, (accs, gyros, dts))
    return out


def bias_corrected_deltas(
    state: PreintegrationState, new_bias: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(dR, dV, dP) under an updated bias (ImuTypes.cc:347-368):
    dR' = dR Exp(JRg dbg); dV' = dV + JVg dbg + JVa dba; likewise dP."""
    db = new_bias - state.bias
    dbg, dba = db[:3], db[3:]
    dR = normalize_rotation(_mm(state.dR, exp_so3(state.JRg @ dbg)))
    dV = state.dV + state.JVg @ dbg + state.JVa @ dba
    dP = state.dP + state.JPg @ dbg + state.JPa @ dba
    return dR, dV, dP


def prepare_segments(
    times: np.ndarray,   # (M,) measurement timestamps
    accs: np.ndarray,    # (M, 3)
    gyros: np.ndarray,   # (M, 3)
    t0: float,
    t1: float,
    max_segments: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side bucketing of raw IMU samples into integration segments for
    the interval [t0, t1], with boundary interpolation like
    Tracking::PreintegrateIMU (Tracking.cc:784-887): the first and last
    segments linearly interpolate the measurement to the frame boundary.
    Returns fixed-size (max_segments, ...) arrays padded with dt = 0."""
    sel = np.nonzero((times > t0) & (times < t1))[0]
    a_out = np.zeros((max_segments, 3), np.float32)
    w_out = np.zeros((max_segments, 3), np.float32)
    dt_out = np.zeros(max_segments, np.float32)
    if sel.size == 0:
        return a_out, w_out, dt_out
    ts = np.concatenate([[t0], times[sel], [t1]])
    aa = np.concatenate([[accs[sel[0]]], accs[sel], [accs[sel[-1]]]])
    ww = np.concatenate([[gyros[sel[0]]], gyros[sel], [gyros[sel[-1]]]])
    n = min(len(ts) - 1, max_segments)
    for i in range(n):
        dt = ts[i + 1] - ts[i]
        a_out[i] = 0.5 * (aa[i] + aa[i + 1])
        w_out[i] = 0.5 * (ww[i] + ww[i + 1])
        dt_out[i] = dt
    return a_out, w_out, dt_out


def compose_preints(a: PreintegrationState, b: PreintegrationState):
    """Compose two consecutive preintegrated segments into one covering
    both intervals (the algebra behind ImuTypes' MergePrevious,
    ImuTypes.cc — here used to build LONGER-baseline preintegration pairs
    for the inertial initialization: consecutive 0.1 s camera-rate pairs
    make the visual-inertial alignment an errors-in-variables problem whose
    scale estimate attenuates toward 0 under cm-level VO noise; composing
    K pairs grows the kinematic signal ~K^2 while the VO noise stays
    constant). Host-side numpy; states must share the integration bias.

      dR = dR_a dR_b
      dV = dV_a + dR_a dV_b
      dP = dP_a + dV_a dT_b + dR_a dP_b

    Bias Jacobians by the chain rule through dR_a Exp(JRg_a db); the 9x9
    covariance propagates with the same linear maps
    (C' = A1 C_a A1^T + A2 C_b A2^T).
    """
    import numpy as np

    Ra = np.asarray(a.dR, np.float64)
    Rb = np.asarray(b.dR, np.float64)
    Va, Vb = np.asarray(a.dV, np.float64), np.asarray(b.dV, np.float64)
    Pa, Pb = np.asarray(a.dP, np.float64), np.asarray(b.dP, np.float64)
    dTb = float(b.dT)

    def _hat(v):
        return np.array([[0.0, -v[2], v[1]],
                         [v[2], 0.0, -v[0]],
                         [-v[1], v[0], 0.0]])

    dR = Ra @ Rb
    dV = Va + Ra @ Vb
    dP = Pa + Va * dTb + Ra @ Pb

    JRg_a = np.asarray(a.JRg, np.float64)
    JRg_b = np.asarray(b.JRg, np.float64)
    JVg = (np.asarray(a.JVg, np.float64)
           + Ra @ (np.asarray(b.JVg, np.float64) - _hat(Vb) @ JRg_a))
    JVa_ = np.asarray(a.JVa, np.float64) + Ra @ np.asarray(b.JVa, np.float64)
    JPg = (np.asarray(a.JPg, np.float64) + np.asarray(a.JVg, np.float64) * dTb
           + Ra @ (np.asarray(b.JPg, np.float64) - _hat(Pb) @ JRg_a))
    JPa_ = (np.asarray(a.JPa, np.float64) + np.asarray(a.JVa, np.float64) * dTb
            + Ra @ np.asarray(b.JPa, np.float64))
    JRg = Rb.T @ JRg_a + JRg_b

    I3 = np.eye(3)
    A1 = np.zeros((9, 9))
    A1[0:3, 0:3] = Rb.T
    A1[3:6, 0:3] = -Ra @ _hat(Vb)
    A1[3:6, 3:6] = I3
    A1[6:9, 0:3] = -Ra @ _hat(Pb)
    A1[6:9, 3:6] = dTb * I3
    A1[6:9, 6:9] = I3
    A2 = np.zeros((9, 9))
    A2[0:3, 0:3] = I3
    A2[3:6, 3:6] = Ra
    A2[6:9, 6:9] = Ra
    Ca = np.asarray(a.C, np.float64)[:9, :9]
    Cb = np.asarray(b.C, np.float64)[:9, :9]
    C9 = A1 @ Ca @ A1.T + A2 @ Cb @ A2.T
    C = np.zeros((15, 15))
    C[:9, :9] = C9

    # plain numpy fields: this runs on the HOST in per-frame init retries —
    # jnp conversions here would each be a serialized put RPC on a tunneled
    # TPU transport (measured: the VIO bench row fell to 0.3 FPS from ~90
    # composes x 11 fields per attempt); consumers re-pack as needed
    return PreintegrationState(
        dR=dR.astype(np.float32), dV=dV.astype(np.float32),
        dP=dP.astype(np.float32),
        JRg=JRg.astype(np.float32), JVg=JVg.astype(np.float32),
        JVa=JVa_.astype(np.float32), JPg=JPg.astype(np.float32),
        JPa=JPa_.astype(np.float32), C=C.astype(np.float32),
        dT=np.float32(float(a.dT) + dTb), bias=np.asarray(a.bias),
    )
