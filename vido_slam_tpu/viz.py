"""Headless visualization — replaces the reference's Pangolin viewer
(vido_slam/src/viewer/VidoViewer.cc) and cvplot metric plots
(Tracking::PlotMetricError, Tracking.cc:3676-3933) with matplotlib
renderings written to disk. The interactive viewer thread (which gates the
reference pipeline on a pause button, VidoViewer.cc:12/Tracking.cc:729-731)
is intentionally replaced by a non-blocking recorder: headless by design.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from vido_slam_tpu.metrics import camera_centers, object_motion_error, rpe_camera
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
