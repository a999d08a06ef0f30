"""Synthetic RGB-D + flow + mask sequence generator for deterministic tests.

The reference's offline mode reads precomputed depth/flow/mask from disk
(demo/run_vido_slam.cc:118-122) — that seam is the natural place to inject
ground-truth synthetic data. This module renders a world of a ground plane
plus moving axis-aligned boxes by ray casting, producing for every frame
exactly the inputs `TrackRGBD` consumes:

  depth  (H, W)    metric depth (0 where no surface)
  flow   (H, W, 2) forward optical flow to the next frame
  mask   (H, W)    int32 instance labels (0 = background)

plus ground-truth camera poses and per-object SE(3) world-frame motions, so
end-to-end camera ATE and object-motion error can be asserted exactly.
Convention: camera looks down +z, y points down (as the reference's KITTI/
KAIST setups); world frame = first camera frame.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.geometry.se3 import inverse_se3, make_se3
from vido_slam_tpu.geometry.so3 import exp_so3


class Box(NamedTuple):
    """Axis-aligned box in its own object frame, moved by a per-frame pose."""

    half_extent: jnp.ndarray  # (3,)
    label: int                # instance label (> 0)
    # pose of object frame in world at t=0 and per-step world-frame motion
    pose0: jnp.ndarray        # (4, 4) object->world
    motion: jnp.ndarray       # (4, 4) world-frame per-step rigid motion H


class SyntheticScene(NamedTuple):
    cam: Camera
    ground_y: float           # y of the ground plane (y down: positive below)
    boxes: Tuple[Box, ...]


def _ray_dirs(cam: Camera) -> jnp.ndarray:
    """(H, W, 3) unit-free ray directions in camera frame (z=1)."""
    H, W = cam.height, cam.width
    uu = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = (uu - cam.cx) / cam.fx
    y = (vv - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def _plane_depth(Tcw: jnp.ndarray, dirs: jnp.ndarray, ground_y: float) -> jnp.ndarray:
    """Ray-plane intersection: world plane y = ground_y. Returns z-depth."""
    Twc = inverse_se3(Tcw)
    R, t = Twc[:3, :3], Twc[:3, 3]
    # world ray: origin t, direction R @ d; solve (t + s*Rd).y = ground_y
    dy = jnp.einsum("j,hwj->hw", R[1], dirs)
    s = (ground_y - t[1]) / jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
    valid = (s > 0.1) & (dy > 1e-6)  # plane must be below/ahead
    return jnp.where(valid, s, jnp.inf)  # s is z-depth since dirs.z == 1


def _box_depth(
    T_ow: jnp.ndarray, Tcw: jnp.ndarray, dirs: jnp.ndarray, half: jnp.ndarray
) -> jnp.ndarray:
    """Ray-AABB intersection in the object frame. Returns z-depth map."""
    Twc = inverse_se3(Tcw)
    T_oc = inverse_se3(T_ow) @ Twc  # camera->object
    R, t = T_oc[:3, :3], T_oc[:3, 3]
    d = jnp.einsum("ij,hwj->hwi", R, dirs)
    o = t
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t0 = (-half - o) * inv_d
    t1 = (half - o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax > jnp.maximum(tmin, 0.1))
    return jnp.where(hit, tmin, jnp.inf)


def render_frame(
    scene: SyntheticScene, Tcw: jnp.ndarray, box_poses: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (depth (H,W), mask (H,W) int32) for one frame."""
    dirs = _ray_dirs(scene.cam)
    depth = _plane_depth(Tcw, dirs, scene.ground_y)
    mask = jnp.zeros(depth.shape, jnp.int32)
    for box, T_ow in zip(scene.boxes, box_poses):
        zb = _box_depth(T_ow, Tcw, dirs, box.half_extent)
        closer = zb < depth
        depth = jnp.where(closer, zb, depth)
        mask = jnp.where(closer, box.label, mask)
    depth = jnp.where(jnp.isinf(depth), 0.0, depth)
    return depth, mask


def flow_between(
    scene: SyntheticScene,
    Tcw_a: jnp.ndarray,
    Tcw_b: jnp.ndarray,
    depth_a: jnp.ndarray,
    mask_a: jnp.ndarray,
    box_motions: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Forward flow a->b: unproject with depth_a, move object points by their
    world-frame motion H, project into frame b."""
    cam = scene.cam
    dirs = _ray_dirs(cam)
    pc = dirs * depth_a[..., None]
    Twc = inverse_se3(Tcw_a)
    pw = jnp.einsum("ij,hwj->hwi", Twc[:3, :3], pc) + Twc[:3, 3]
    for box, H in zip(scene.boxes, box_motions):
        moved = jnp.einsum("ij,hwj->hwi", H[:3, :3], pw) + H[:3, 3]
        pw = jnp.where((mask_a == box.label)[..., None], moved, pw)
    pb = jnp.einsum("ij,hwj->hwi", Tcw_b[:3, :3], pw) + Tcw_b[:3, 3]
    uvb = cam.project(pb)
    H_, W_ = depth_a.shape
    uu = jax.lax.broadcasted_iota(jnp.float32, (H_, W_), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (H_, W_), 0)
    flow = uvb - jnp.stack([uu, vv], axis=-1)
    return jnp.where((depth_a > 0)[..., None], flow, 0.0)


class SyntheticFrame(NamedTuple):
    depth: np.ndarray
    flow: np.ndarray
    mask: np.ndarray
    Tcw_gt: np.ndarray
    box_poses: List[np.ndarray]    # object->world per box
    box_motions: List[np.ndarray]  # world-frame motion to the NEXT frame


class SyntheticSequence:
    """Renders a full sequence with ground truth."""

    def __init__(
        self,
        scene: SyntheticScene,
        cam_motions: Sequence[np.ndarray],  # per-step camera motion in camera frame
        n_frames: int,
    ):
        self.scene = scene
        self.frames: List[SyntheticFrame] = []

        # pose chains in float64 numpy (host): avoids accumulating f32/bf16
        # rounding over long sequences
        Tcw = np.eye(4)
        box_poses = [np.asarray(b.pose0, np.float64) for b in scene.boxes]
        Tcws = []
        poses_t = []
        for t in range(n_frames):
            Tcws.append(jnp.asarray(Tcw, jnp.float32))
            poses_t.append([jnp.asarray(p, jnp.float32) for p in box_poses])
            dT = np.asarray(cam_motions[min(t, len(cam_motions) - 1)], np.float64)
            Tcw = dT @ Tcw
            box_poses = [
                np.asarray(b.motion, np.float64) @ p
                for b, p in zip(scene.boxes, box_poses)
            ]

        for t in range(n_frames):
            depth, mask = render_frame(scene, Tcws[t], poses_t[t])
            if t + 1 < n_frames:
                motions = [b.motion for b in scene.boxes]
                flow = flow_between(
                    scene, Tcws[t], Tcws[t + 1], depth, mask, motions
                )
            else:
                flow = jnp.zeros(depth.shape + (2,), jnp.float32)
            self.frames.append(
                SyntheticFrame(
                    depth=np.asarray(depth),
                    flow=np.asarray(flow),
                    mask=np.asarray(mask),
                    Tcw_gt=np.asarray(Tcws[t]),
                    box_poses=[np.asarray(p) for p in poses_t[t]],
                    box_motions=[np.asarray(b.motion) for b in scene.boxes],
                )
            )

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i) -> SyntheticFrame:
        return self.frames[i]


def simple_scene(
    width: int = 256,
    height: int = 160,
    moving_box: bool = True,
    box_speed: float = 0.8,
) -> SyntheticScene:
    """A canned test scene: ground plane + one (optionally moving) box."""
    cam = Camera.create(
        fx=200.0, fy=200.0, cx=width / 2, cy=height / 2,
        width=width, height=height, bf=40.0,
    )
    motion = (
        make_se3(exp_so3(jnp.zeros(3)), jnp.array([box_speed, 0.0, 0.0]))
        if moving_box
        else jnp.eye(4)
    )
    box = Box(
        half_extent=jnp.array([2.0, 1.5, 2.0]),
        label=2,
        pose0=make_se3(jnp.eye(3), jnp.array([-4.0, 0.0, 12.0])),
        motion=motion,
    )
    return SyntheticScene(cam=cam, ground_y=1.5, boxes=(box,))


def render_rgb(
    scene: SyntheticScene,
    Tcw: jnp.ndarray,
    box_poses: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Render an (H, W, 3) float32 RGB frame in [0, 255] by ray casting:
    procedurally textured ground plane (road + lane markings + world-space
    noise), shaded boxes, sky gradient. All textures are functions of WORLD
    coordinates, so a moving camera/boxes produce temporally consistent
    image motion — realistic content for the perception nets (the VERDICT-r2
    bench-realism item: noise input exercises NMS/mask occupancy and the
    flow/depth nets on degenerate content)."""
    cam = scene.cam
    dirs = _ray_dirs(cam)
    Twc = inverse_se3(Tcw)
    Rw, tw = Twc[:3, :3], Twc[:3, 3]

    depth = _plane_depth(Tcw, dirs, scene.ground_y)
    hit_label = jnp.zeros(depth.shape, jnp.int32)  # 0 ground, i+1 box i
    for i, (box, T_ow) in enumerate(zip(scene.boxes, box_poses)):
        zb = _box_depth(T_ow, Tcw, dirs, box.half_extent)
        closer = zb < depth
        depth = jnp.where(closer, zb, depth)
        hit_label = jnp.where(closer, i + 1, hit_label)

    # world-space hit points (for texturing)
    pc = dirs * jnp.where(jnp.isinf(depth), 1.0, depth)[..., None]
    pw = jnp.einsum("ij,hwj->hwi", Rw, pc) + tw

    # ground: asphalt gray + checker variation + dashed center line at x=0
    gx, gz = pw[..., 0], pw[..., 2]
    checker = (jnp.floor(gx * 0.5) + jnp.floor(gz * 0.5)) % 2.0
    noise = 0.5 + 0.25 * (jnp.sin(gx * 7.3) * jnp.cos(gz * 5.1)
                          + jnp.sin(gx * 2.9 + gz * 3.7))
    base = 0.32 + 0.08 * checker + 0.06 * noise
    lane = (jnp.abs(gx) < 0.15) & ((jnp.floor(gz * 0.8) % 2.0) < 1.0)
    ground = jnp.stack([
        jnp.where(lane, 0.85, base),
        jnp.where(lane, 0.80, base),
        jnp.where(lane, 0.30, base * 1.05),
    ], axis=-1)

    # boxes: per-instance base color, shaded by which face the ray entered
    # (approximated by the dominant axis of the object-frame offset)
    color = ground
    palette = jnp.asarray([
        [0.75, 0.15, 0.12], [0.12, 0.35, 0.75], [0.15, 0.6, 0.2],
        [0.8, 0.55, 0.1], [0.5, 0.2, 0.6], [0.1, 0.6, 0.6],
    ], jnp.float32)
    for i, (box, T_ow) in enumerate(zip(scene.boxes, box_poses)):
        T_wo_inv = inverse_se3(T_ow)
        po = jnp.einsum("ij,hwj->hwi", T_wo_inv[:3, :3], pw) + T_wo_inv[:3, 3]
        a = jnp.abs(po / jnp.maximum(box.half_extent, 1e-6))
        face = jnp.argmax(a, axis=-1)               # 0 x, 1 y, 2 z
        shade = jnp.where(face == 1, 1.0, jnp.where(face == 0, 0.75, 0.55))
        stripe = 0.9 + 0.1 * jnp.sign(jnp.sin(po[..., 0] * 6.0))
        c = palette[i % palette.shape[0]] * (shade * stripe)[..., None]
        color = jnp.where((hit_label == i + 1)[..., None], c, color)

    # sky where no surface: vertical gradient
    vv = jax.lax.broadcasted_iota(jnp.float32, depth.shape, 0)
    tsky = vv / depth.shape[0]
    sky = jnp.stack([0.45 + 0.2 * tsky, 0.6 + 0.15 * tsky,
                     0.85 - 0.05 * tsky], axis=-1)
    color = jnp.where(jnp.isinf(depth)[..., None], sky, color)
    return jnp.clip(color, 0.0, 1.0) * 255.0


# ---------------------------------------------------------------------------
# Analytic driving trajectory — the continuous-time model behind the bench
# clip, with ACCELERATION so a visual-inertial alignment is well-posed
# (constant velocity makes scale unobservable: InitializeIMU aborts on the
# collapsed scale, Tracking.cc:1008-1012). The speed and yaw profiles are
# periodic with the clip length, so when the bench replays the clip
# cyclically the IMU stream stays velocity- and attitude-continuous across
# the wrap (only position resets, which an IMU does not measure).
# ---------------------------------------------------------------------------

DRIVING_FPS = 10.0        # KAIST camera rate (kaist_config.yaml:22)
DRIVING_V0 = 6.0          # m/s mean forward speed (0.6 m/frame)
DRIVING_V1 = 1.5          # m/s speed oscillation amplitude
DRIVING_PSI1 = 0.02       # rad yaw oscillation amplitude
DRIVING_PERIOD = 2.4      # s = 24 frames at 10 fps (the clip length)
DRIVING_GRAVITY = 9.79    # GRAVITY_VALUE (ImuTypes.h:29); y points DOWN


def _yaw_mat(psi: float) -> np.ndarray:
    c, s = np.cos(psi), np.sin(psi)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], np.float64)


def driving_pose(t: float) -> np.ndarray:
    """GT camera pose Tcw (world->camera, 4x4 float64) of the driving clip
    at time t: forward along +z_w with speed v(t) = V0 + V1 sin(w t) and a
    small yaw oscillation psi(t) = PSI1 sin(w t)."""
    w = 2.0 * np.pi / DRIVING_PERIOD
    s = DRIVING_V0 * t - DRIVING_V1 / w * (np.cos(w * t) - 1.0)
    psi = DRIVING_PSI1 * np.sin(w * t)
    Twc = np.eye(4)
    Twc[:3, :3] = _yaw_mat(psi)
    Twc[:3, 3] = [0.0, 0.0, s]
    return np.linalg.inv(Twc)


def driving_imu(t: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Ideal body-frame IMU of the driving trajectory at times t (n,):
    accelerometer specific force f_b = R_bw (a_w - g_w) with gravity
    g_w = (0, +G, 0) (y down), gyro = body angular rate (0, psi'(t), 0).
    Exactly consistent with driving_pose — the analytic derivative, not a
    finite difference. Returns (acc (n, 3), gyro (n, 3)) float32."""
    t = np.asarray(t, np.float64)
    w = 2.0 * np.pi / DRIVING_PERIOD
    a_fwd = DRIVING_V1 * w * np.cos(w * t)              # d v / dt along z_w
    psi = DRIVING_PSI1 * np.sin(w * t)
    dpsi = DRIVING_PSI1 * w * np.cos(w * t)
    a_w = np.stack([np.zeros_like(t), np.zeros_like(t), a_fwd], -1)
    g_w = np.array([0.0, DRIVING_GRAVITY, 0.0])
    acc = np.empty((t.shape[0], 3))
    for i in range(t.shape[0]):                          # R_bw = R_wb^T
        acc[i] = _yaw_mat(psi[i]).T @ (a_w[i] - g_w)
    gyro = np.stack([np.zeros_like(t), dpsi, np.zeros_like(t)], -1)
    return acc.astype(np.float32), gyro.astype(np.float32)


def driving_clip(
    height: int = 192,
    width: int = 640,
    n_frames: int = 24,
    fx: float = 408.2,
    fy: float = 408.7,
    return_poses: bool = False,
):
    """Deterministic synthetic driving clip (n_frames, H, W, 3) float32 RGB
    0..255: camera driving forward over a textured road with three moving
    vehicles-as-boxes, following the analytic `driving_pose` trajectory
    (accelerating + gently yawing, so the clip supports VIO benching). The
    default realistic bench input (bench.py) — flow, depth and detector
    occupancy run on coherent moving content instead of i.i.d. noise.
    With return_poses=True also returns the GT Tcw stack (n_frames, 4, 4)."""
    cam = Camera.create(fx=fx, fy=fy, cx=width / 2, cy=height * 0.55,
                        width=width, height=height, bf=193.8)

    boxes = (
        Box(half_extent=jnp.asarray([0.9, 0.7, 2.0]), label=1,
            pose0=make_se3(jnp.eye(3), jnp.asarray([-2.5, 0.8, 14.0])),
            motion=make_se3(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.5]))),
        Box(half_extent=jnp.asarray([0.9, 0.7, 2.0]), label=2,
            pose0=make_se3(jnp.eye(3), jnp.asarray([2.5, 0.8, 30.0])),
            motion=make_se3(jnp.eye(3), jnp.asarray([0.0, 0.0, -0.9]))),
        Box(half_extent=jnp.asarray([1.2, 1.0, 2.6]), label=3,
            pose0=make_se3(jnp.eye(3), jnp.asarray([0.0, 0.6, 45.0])),
            motion=make_se3(jnp.eye(3), jnp.asarray([0.02, 0.0, 0.3]))),
    )
    scene = SyntheticScene(cam=cam, ground_y=1.5, boxes=boxes)

    frames = []
    Tcws = [driving_pose(k / DRIVING_FPS) for k in range(n_frames)]
    poses = [np.asarray(b.pose0, np.float64) for b in boxes]
    # render on the CPU backend (one jitted program per frame): eager
    # small-op rendering is minutes-slow, and on a tunneled TPU transport
    # it would be hundreds of serialized RPCs per frame
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        render = jax.jit(lambda T, ps: render_rgb(scene, T, ps))
        for k in range(n_frames):
            frames.append(np.asarray(render(
                jnp.asarray(Tcws[k], jnp.float32),
                tuple(jnp.asarray(p, jnp.float32) for p in poses))))
            poses = [np.asarray(b.motion, np.float64) @ p
                     for b, p in zip(boxes, poses)]
    clip = np.stack(frames).astype(np.float32)
    if return_poses:
        return clip, np.stack(Tcws).astype(np.float32)
    return clip


def depth_noise(rng: "np.random.RandomState", z: "np.ndarray") -> "np.ndarray":
    """The reference's optional measurement-noise model for depth readings
    (Frame.cc:714,841,868): z += N(0, sigma) with sigma = z^2/(725*0.5)*0.15.
    The shipped pipeline calls ObtainFlowDepth* with addnoise=0, so this is
    an evaluation utility (robustness studies), not on the tracking path."""
    sigma = z * z / (725.0 * 0.5) * 0.15
    return z + rng.randn(*z.shape).astype(z.dtype) * sigma
