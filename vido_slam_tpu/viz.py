"""Headless visualization — replaces the reference's Pangolin viewer
(vido_slam/src/viewer/VidoViewer.cc) and cvplot metric plots
(Tracking::PlotMetricError, Tracking.cc:3676-3933) with matplotlib
renderings written to disk. The interactive viewer thread (which gates the
reference pipeline on a pause button, VidoViewer.cc:12/Tracking.cc:729-731)
is intentionally replaced by a non-blocking recorder: headless by design.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from vido_slam_tpu.metrics import camera_centers
from vido_slam_tpu.slam_map import SlamMap


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_trajectory(
    slam_map: SlamMap, path: str, gt: Optional[np.ndarray] = None,
    use_refined: bool = False,
) -> None:
    """Top-down (x-z) trajectory + object tracks — the viewer's birdeye view."""
    plt = _mpl()
    poses = (slam_map.refined_poses if use_refined and
             slam_map.refined_poses is not None else slam_map.poses)
    c = camera_centers(poses)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.plot(c[:, 0], c[:, 2], "b-", label="estimate")
    if gt is not None:
        cg = camera_centers(gt)
        ax.plot(cg[:, 0], cg[:, 2], "k--", label="ground truth")
    # object centroids colored by track id
    for tid in slam_map.track_ids():
        pts = []
        for f in slam_map.frames:
            for ob in f.objects:
                if ob.track_id == tid and ob.status:
                    pts.append(ob.centroid)
        if pts:
            pts = np.stack(pts)
            ax.plot(pts[:, 0], pts[:, 2], "o-", ms=3, label=f"object {tid}")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    ax.grid(True, alpha=0.3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_metric_error(slam_map: SlamMap, path: str) -> Dict[str, float]:
    """PlotMetricError (Tracking.cc:3676-3933): per-frame camera RPE curves
    plus per-object motion error curves; returns the summary means."""
    plt = _mpl()
    gt = slam_map.gt_poses
    if gt is None:
        raise ValueError("no ground-truth poses recorded")
    est = slam_map.poses
    T = est.shape[0]
    t_err, r_err = [], []
    for i in range(1, T):
        rel_e = est[i] @ np.linalg.inv(est[i - 1])
        rel_g = gt[i] @ np.linalg.inv(gt[i - 1])
        dE = np.linalg.inv(rel_g) @ rel_e
        t_err.append(np.linalg.norm(dE[:3, 3]))
        cos = np.clip((np.trace(dE[:3, :3]) - 1) / 2, -1, 1)
        r_err.append(np.degrees(np.arccos(cos)))

    fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    axes[0].plot(t_err, "b-")
    axes[0].set_ylabel("RPE trans [m]")
    axes[0].grid(True, alpha=0.3)
    axes[1].plot(r_err, "r-")
    axes[1].set_ylabel("RPE rot [deg]")
    axes[1].set_xlabel("frame")
    axes[1].grid(True, alpha=0.3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return {
        "rpe_trans_mean": float(np.mean(t_err)) if t_err else 0.0,
        "rpe_rot_deg_mean": float(np.mean(r_err)) if r_err else 0.0,
    }


def plot_object_motion_errors(
    slam_map: SlamMap, gt_motions: Dict[int, Dict[int, np.ndarray]],
    path: str, body_frame: bool = True,
) -> Dict[int, Dict[str, float]]:
    """Per-object motion-error curves — the object half of PlotMetricError
    (Tracking.cc:3676-3933). `gt_motions[track_id][frame_id]` is the GT
    world-frame motion H_gt for that frame (build with
    metrics.gt_object_motion from consecutive GT object poses, or parse
    FrameRecord.obj_gt). Errors use metrics.object_motion_error (body-frame
    when an object pose is known is the reference default; here the
    world-frame error unless the caller pre-conjugates). Returns per-object
    mean errors."""
    from vido_slam_tpu.metrics import object_motion_error

    del body_frame  # conjugation is the caller's choice via gt_motions
    plt = _mpl()
    fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    summary: Dict[int, Dict[str, float]] = {}
    for tid, gtm in sorted(gt_motions.items()):
        xs, te, re = [], [], []
        for f in slam_map.frames:
            if f.frame_id not in gtm:
                continue
            for ob in f.objects:
                if ob.track_id == tid and ob.status:
                    e = object_motion_error(ob.motion, gtm[f.frame_id])
                    xs.append(f.frame_id)
                    te.append(e["trans_err"])
                    re.append(e["rot_err_deg"])
        if not xs:
            continue
        axes[0].plot(xs, te, "o-", ms=3, label=f"object {tid}")
        axes[1].plot(xs, re, "o-", ms=3, label=f"object {tid}")
        summary[tid] = {"t_mean": float(np.mean(te)),
                        "r_deg_mean": float(np.mean(re))}
    axes[0].set_ylabel("obj motion err t [m]")
    axes[1].set_ylabel("obj motion err R [deg]")
    axes[1].set_xlabel("frame")
    for ax in axes:
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return summary


def save_speed_plot(slam_map: SlamMap, path: str) -> None:
    """Per-object speed over time (the viewer's speed overlay)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(10, 4))
    for tid in slam_map.track_ids():
        xs, ys = [], []
        for f in slam_map.frames:
            for ob in f.objects:
                if ob.track_id == tid and ob.status:
                    xs.append(f.frame_id)
                    ys.append(ob.speed_kmh)
        if xs:
            ax.plot(xs, ys, "o-", ms=3, label=f"object {tid}")
    ax.set_xlabel("frame")
    ax.set_ylabel("speed [km/h]")
    ax.grid(True, alpha=0.3)
    ax.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def _draw_scene(ax, slam_map: SlamMap, upto: Optional[int] = None,
                max_points: int = 2000, box_half: float = 1.2) -> None:
    """Draw trajectory + map points + object boxes up to frame `upto`
    (exclusive; None = all frames) onto a 3D axes."""
    n = len(slam_map.frames) if upto is None else upto
    c = camera_centers(slam_map.poses[:n])
    ax.plot(c[:, 0], c[:, 2], -c[:, 1], "b-", lw=2, label="camera")

    last = slam_map.frames[n - 1]
    pts = last.stat_3d[last.stat_valid][:max_points]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=1, c="gray",
                   alpha=0.4, label="map points")

    edges = [(0, 1), (1, 3), (3, 2), (2, 0), (4, 5), (5, 7), (7, 6),
             (6, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
    for tid in slam_map.track_ids():
        cents = []
        for f in slam_map.frames[:n]:
            for ob in f.objects:
                if ob.track_id == tid and ob.status:
                    cents.append(np.asarray(ob.centroid))
        if not cents:
            continue
        cents = np.stack(cents)
        ax.plot(cents[:, 0], cents[:, 2], -cents[:, 1], "o-", ms=2,
                label=f"object {tid}")
        # wireframe box at the latest centroid
        cx, cy, cz = cents[-1]
        corners = np.array([
            [cx + sx * box_half, cy + sy * box_half, cz + sz * box_half]
            for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
        ])
        for a, b in edges:
            ax.plot([corners[a, 0], corners[b, 0]],
                    [corners[a, 2], corners[b, 2]],
                    [-corners[a, 1], -corners[b, 1]], "r-", lw=0.8)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_zlabel("-y [m]")
    ax.legend(loc="upper left", fontsize=8)


def plot_scene_3d(slam_map: SlamMap, path: str,
                  max_points: int = 2000, box_half: float = 1.2) -> None:
    """Headless counterpart of the Pangolin 3D viewer
    (src/viewer/VidoViewer.cc DrawTrajectory/DrawObjects/DrawMapPoints):
    camera trajectory, static map points of the last frame, per-track
    object centroids with wireframe 3D boxes."""
    plt = _mpl()
    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(111, projection="3d")
    _draw_scene(ax, slam_map, None, max_points, box_half)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def render_scene_animation(slam_map: SlamMap, path: str, *,
                           stride: int = 1, fps: int = 10,
                           max_points: int = 2000, box_half: float = 1.2,
                           figsize: float = 6.0, dpi: int = 80) -> int:
    """Animated 3D scene over the sequence — the VidoViewer's continuously
    evolving render (VidoViewer.cc:28-37 SetCurrentPose/SetMapPoints/
    SetObjects per frame) as a headless GIF recording. Each animation frame
    draws the trajectory, the map points and the object boxes as of that
    SLAM frame. Returns the number of rendered frames."""
    plt = _mpl()
    from PIL import Image

    n = len(slam_map.frames)
    frames = []
    fig = plt.figure(figsize=(figsize, figsize))
    for i in range(1, n + 1, max(stride, 1)):
        fig.clf()
        ax = fig.add_subplot(111, projection="3d")
        _draw_scene(ax, slam_map, i, max_points, box_half)
        ax.set_title(f"frame {i - 1}")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(Image.fromarray(buf.copy()))
    plt.close(fig)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=int(1000 / max(fps, 1)), loop=0)
    return len(frames)


def flow_to_rgb(flow: np.ndarray, normalize: bool = True) -> np.ndarray:
    """Optical-flow visualization with the flow_net runner's HSV recipe
    (reference flow_net/src/run.py:123-166): hue = flow angle (OpenCV
    half-degrees), saturation = min-max-normalised magnitude, value = 255.
    flow (H, W, 2) -> uint8 RGB (H, W, 3); cv2-free."""
    u = np.nan_to_num(np.asarray(flow[..., 0], np.float32))
    v = np.nan_to_num(np.asarray(flow[..., 1], np.float32))
    mag = np.sqrt(u * u + v * v)
    ang = np.arctan2(v, u)          # cv2.cartToPolar range [0, 2pi)
    ang = np.where(ang < 0, ang + 2 * np.pi, ang)
    h_deg = ang * 180.0 / np.pi / 2.0               # [0, 180) like cv2 HSV
    if normalize:
        lo, hi = mag.min(), mag.max()
        sat = (mag - lo) / max(hi - lo, 1e-12) * 255.0
    else:
        sat = np.clip(mag, 0, 255)
    # HSV (cv2 layout: h in [0,180), s/v in [0,255]) -> RGB
    from matplotlib.colors import hsv_to_rgb

    hsv = np.stack([h_deg / 180.0, sat / 255.0, np.ones_like(sat)], axis=-1)
    return (hsv_to_rgb(hsv) * 255.0).astype(np.uint8)


def draw_frame_overlay(image: np.ndarray, slam_map: SlamMap,
                       frame_idx: int = -1, path: str = None) -> np.ndarray:
    """DisplayDynamicImage equivalent: the input frame annotated with the
    tracked object points (colored per track id) and static features
    (VidoViewer.cc image panel; Tracking.cc's 'Static and Dynamic Features'
    debug view). Returns an (H, W, 3) uint8 array; saves if path given."""
    img = np.asarray(image)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    img = img.astype(np.uint8).copy()
    f = slam_map.frames[frame_idx]
    H, W = img.shape[:2]

    def put(uv, color):
        u = np.clip(np.round(uv[:, 0]).astype(int), 1, W - 2)
        v = np.clip(np.round(uv[:, 1]).astype(int), 1, H - 2)
        for du in (-1, 0, 1):
            for dv in (-1, 0, 1):
                img[v + dv, u + du] = color

    put(f.stat_uv[f.stat_valid], (0, 255, 0))
    palette = [(255, 0, 0), (0, 128, 255), (255, 0, 255), (255, 255, 0),
               (0, 255, 255), (128, 0, 255), (255, 128, 0), (0, 0, 255)]
    labs = f.obj_label
    for i, tid in enumerate(sorted(set(labs[labs > 0].tolist()))):
        m = (labs == tid) & f.obj_valid
        put(f.obj_uv[m], palette[i % len(palette)])
    if path is not None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        _mpl().imsave(path, img)
    return img


# matplotlib backends with no display window — LiveViewer must no-op on
# all of these, not just "agg" (module:// covers inline/notebook shims)
_NON_INTERACTIVE_BACKENDS = ("agg", "cairo", "pdf", "pgf", "ps", "svg",
                             "template")


class LiveViewer:
    """Minimal interactive live 3D viewer — the on-demand counterpart of
    VidoViewer (VidoViewer.cc Run loop: trajectory + map points + object
    boxes redrawn as the map evolves, plus the annotated video image panel
    via DisplayDynamicImage), with the pause semantics INVERTED as the
    headless design requires (SURVEY section 1): the reference starts
    paused and gates GrabImageRGBD on the viewer's button
    (VidoViewer.cc:12, Tracking.cc:729-731); this viewer starts RUNNING
    and pausing (space key) only freezes the display refresh — the
    pipeline is never blocked.

    Falls back to a no-op when no interactive matplotlib backend is
    available (headless hosts), so `--view` is always safe to pass;
    `disabled_reason` records why (None while healthy).
    """

    def __init__(self, every: int = 5, max_points: int = 2000):
        self.every = max(int(every), 1)
        self.max_points = max_points
        self.paused = False
        self.disabled_reason = None
        self._n = 0
        self._ok = False
        self._img_ax = None
        try:
            import matplotlib
            import matplotlib.pyplot as plt

            backend = matplotlib.get_backend().lower()
            if (backend in _NON_INTERACTIVE_BACKENDS
                    or backend.startswith("module://")):
                raise RuntimeError(f"non-interactive backend {backend!r}")
            plt.ion()
            self._plt = plt
            self._fig = plt.figure(figsize=(12, 7))
            # left: annotated video image (DisplayDynamicImage panel);
            # right: 3D trajectory/points/boxes
            self._img_ax = self._fig.add_subplot(1, 2, 1)
            self._img_ax.set_axis_off()
            self._ax = self._fig.add_subplot(1, 2, 2, projection="3d")
            self._fig.canvas.mpl_connect("key_press_event", self._on_key)
            self._fig.suptitle("vido_slam_tpu live (space: pause/run)")
            self._ok = True
        except Exception as e:  # headless: record why and no-op
            self.disabled_reason = str(e)

    def _on_key(self, event):
        if event.key == " ":
            self.paused = not self.paused

    def update(self, slam_map: SlamMap, image: np.ndarray = None) -> None:
        """Call once per tracked frame; redraws every `every` frames unless
        paused. `image` (H, W[, 3] RGB), when given, is annotated with the
        tracked features (draw_frame_overlay) and shown beside the 3D axes.
        Never raises and never blocks beyond one GUI event tick."""
        self._n += 1
        if not self._ok or self.paused or self._n % self.every:
            return
        try:
            self._ax.cla()
            _draw_scene(self._ax, slam_map, None, self.max_points)
            if image is not None and self._img_ax is not None:
                self._img_ax.cla()
                self._img_ax.set_axis_off()
                self._img_ax.imshow(
                    draw_frame_overlay(image, slam_map))
            self._fig.canvas.draw_idle()
            self._plt.pause(0.001)
        except Exception as e:
            self._ok = False
            self.disabled_reason = str(e)

    def close(self) -> None:
        if self._ok:
            self._plt.ioff()
            self._plt.close(self._fig)
