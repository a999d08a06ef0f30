"""Pinhole camera model with radial-tangential distortion, pure JAX.

Mirrors the reference's camera handling (intrinsics/distortion parsed in
vido_slam/src/Tracking.cc:43-86; per-pixel depth->metric conversion in
Tracking.cc:299-322) as vectorised array ops. Points are (..., 3) camera-frame
coordinates; pixels are (..., 2) as (u, v).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Intrinsics + distortion. All scalars float32 device-friendly."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    # radial-tangential (OpenCV order): k1, k2, p1, p2, k3
    dist: jnp.ndarray  # (5,)
    width: int
    height: int
    bf: jnp.ndarray  # baseline * fx (Camera.bf)
    fps: float

    @classmethod
    def create(cls, fx, fy, cx, cy, dist=None, width=0, height=0, bf=0.0, fps=10.0):
        if dist is None:
            dist = jnp.zeros(5, dtype=jnp.float32)
        return cls(
            fx=jnp.float32(fx),
            fy=jnp.float32(fy),
            cx=jnp.float32(cx),
            cy=jnp.float32(cy),
            dist=jnp.asarray(dist, dtype=jnp.float32),
            width=int(width),
            height=int(height),
            bf=jnp.float32(bf),
            fps=float(fps),
        )

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [
                [self.fx, 0.0, self.cx],
                [0.0, self.fy, self.cy],
                [0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )

    def project(self, pts_cam: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
        """Camera-frame points (..., 3) -> pixels (..., 2). No distortion
        (the SLAM core operates on already-rectified pixel measurements, as the
        reference does: distortion coefficients are parsed but the tracking
        math projects with K only — cf. Optimizer.cc cam_project)."""
        z = pts_cam[..., 2]
        z_safe = jnp.where(jnp.abs(z) < eps, jnp.full_like(z, eps), z)
        u = self.fx * pts_cam[..., 0] / z_safe + self.cx
        v = self.fy * pts_cam[..., 1] / z_safe + self.cy
        return jnp.stack([u, v], axis=-1)

    def backproject(self, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3).

        Mirrors Frame::UnprojectStereoStat (reference vido_slam/src/Frame.cc:689+).
        """
        x = (uv[..., 0] - self.cx) * depth / self.fx
        y = (uv[..., 1] - self.cy) * depth / self.fy
        return jnp.stack([x, y, depth], axis=-1)

    def distort(self, xy_norm: jnp.ndarray) -> jnp.ndarray:
        """Apply radial-tangential distortion to normalized coords (..., 2)."""
        k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
        x, y = xy_norm[..., 0], xy_norm[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def in_bounds(self, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
        """Boolean mask (...,) of pixels inside the image."""
        u, v = uv[..., 0], uv[..., 1]
        return (
            (u >= margin)
            & (u < self.width - margin)
            & (v >= margin)
            & (v < self.height - margin)
        )


def convert_depth(
    raw: jnp.ndarray,
    dataset: str,
    depth_map_factor: float,
    bf: float,
    scale: float = 1.0,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Raw network/stereo depth image -> metric depth, vectorised.

    Reference semantics (Tracking.cc:299-322), per dataset:
      OMD:   d / DepthMapFactor
      KITTI: bf / (d / DepthMapFactor)           (stereo disparity)
      KAIST: scale * bf / (d / DepthMapFactor)   (normalized inverse depth)
    Negative raw values clamp to 0 (invalid).
    """
    raw = jnp.where(raw < 0, 0.0, raw)
    d = raw / depth_map_factor
    if dataset == "omd":
        out = d
    elif dataset == "kitti":
        out = bf / jnp.maximum(d, eps)
    elif dataset == "kaist":
        out = scale * bf / jnp.maximum(d, eps)
    else:
        raise ValueError(f"unknown dataset {dataset!r}")
    # raw==0 stays invalid (depth 0), not inf
    return jnp.where(raw <= 0, 0.0, out)
