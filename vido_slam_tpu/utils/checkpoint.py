"""Checkpoint / resume — the aux subsystem the reference lacks for SLAM
state (SURVEY §5: torch checkpoints for network weights only; no SLAM-state
snapshots). Here both sides are first-class:

  - model parameters (flat dicts of arrays) via orbax when available, with
    an npz fallback;
  - SLAM session snapshots: the map's FrameRecords + the tracker's device
    state, so a run can resume mid-sequence.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def save_params(path: str, params: Dict[str, jnp.ndarray]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), dict(params), force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    np.savez(path + ".npz", **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str) -> Dict[str, jnp.ndarray]:
    if os.path.exists(path + ".npz"):
        with np.load(path + ".npz") as z:
            return {k: jnp.asarray(z[k]) for k in z.files}
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return {k: jnp.asarray(v) for k, v in restored.items()}


def save_torch_state_dict(path: str, sd) -> None:
    """Convert + save a torch checkpoint (state_dict or raw file path) into
    our parameter layout (models/layers.convert_state_dict)."""
    from vido_slam_tpu.models.layers import convert_state_dict

    if isinstance(sd, str):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=True)
    save_params(path, convert_state_dict(sd))


def save_session(path: str, tracker) -> None:
    """Snapshot the whole SLAM session (map + device tracking state)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state_np = jax.tree.map(np.asarray, tracker.state) if tracker.state else None
    payload = {
        "frames": tracker.map.frames,
        "refined_poses": tracker.map.refined_poses,
        "refined_motions": tracker.map.refined_motions,
        "lba_time": tracker.map.lba_time,
        "frame_id": tracker.frame_id,
        "imu_scale": tracker.imu_scale,
        "imu_initialized": tracker.imu_initialized,
        "imu_bias": tracker.imu_bias,
        "state": state_np,
        "object_tracker": {
            "max_id": tracker.object_tracker.max_id,
            "prev_sem_to_id": tracker.object_tracker.prev_sem_to_id,
            "first_tracked_frame": tracker.object_tracker.first_tracked_frame,
        },
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_session(path: str, tracker) -> None:
    """Restore a snapshot into a freshly constructed Tracker (same config)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    tracker.map.frames = payload["frames"]
    tracker.map.refined_poses = payload["refined_poses"]
    tracker.map.refined_motions = payload["refined_motions"]
    tracker.map.lba_time = payload["lba_time"]
    tracker.frame_id = payload["frame_id"]
    tracker.imu_scale = payload["imu_scale"]
    tracker.imu_initialized = payload["imu_initialized"]
    tracker.imu_bias = payload["imu_bias"]
    ot = payload["object_tracker"]
    tracker.object_tracker.max_id = ot["max_id"]
    tracker.object_tracker.prev_sem_to_id = ot["prev_sem_to_id"]
    tracker.object_tracker.first_tracked_frame = ot["first_tracked_frame"]
    if payload["state"] is not None:
        tracker.state = jax.tree.map(jnp.asarray, payload["state"])
