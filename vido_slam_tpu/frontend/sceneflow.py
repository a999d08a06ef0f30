"""3D scene flow of object points — Tracking::GetSceneFlowObj
(reference vido_slam/src/Tracking.cc:1582-1668), vectorised.

Scene flow of a tracked point = its world position unprojected from the
current frame minus its world position unprojected from the previous frame.
Points whose semantic label is <= 0 in either frame are invalidated.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.geometry.se3 import inverse_se3

_HI = lax.Precision.HIGHEST


def unproject_to_world(
    cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray, Tcw: jnp.ndarray
) -> jnp.ndarray:
    """Pixels + depth + camera pose (world->cam) -> world points (N, 3).

    Frame::UnprojectStereo* (Frame.cc:689-886): X_w = Twc * backproject(uv, d).
    """
    pc = cam.backproject(uv, depth)
    Twc = inverse_se3(Tcw)
    return jnp.einsum("ij,nj->ni", Twc[:3, :3], pc, precision=_HI) + Twc[:3, 3]


@jax.jit
def scene_flow_world(
    cam: Camera,
    uv_pre: jnp.ndarray,
    depth_pre: jnp.ndarray,
    Tcw_pre: jnp.ndarray,
    uv_cur: jnp.ndarray,
    depth_cur: jnp.ndarray,
    Tcw_cur: jnp.ndarray,
    sem_pre: jnp.ndarray,
    sem_cur: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (flow3d (N,3), sf_norm_xz (N,), valid (N,)).

    sf_norm uses only the x/z components, matching Tracking.cc:1746
    (the y component — vertical — is excluded from the dynamics test).
    """
    Xp = unproject_to_world(cam, uv_pre, depth_pre, Tcw_pre)
    Xc = unproject_to_world(cam, uv_cur, depth_cur, Tcw_cur)
    flow3d = Xc - Xp
    sf_norm = jnp.sqrt(flow3d[:, 0] ** 2 + flow3d[:, 2] ** 2)
    ok = valid & (sem_pre > 0) & (sem_cur > 0)
    return flow3d, sf_norm, ok
