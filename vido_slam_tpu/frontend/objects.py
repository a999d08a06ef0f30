"""Dynamic-object segmentation and tracking — Tracking::DynObjTracking
(reference vido_slam/src/Tracking.cc:1670-1912), TPU-first.

The reference groups object points by semantic label with nested host loops.
Here the per-label statistics (counts, boundary fraction, scene-flow
distribution, mean depth, last-frame label histogram) are computed in one
jitted pass using segment-sum bincounts over a fixed number of semantic bins;
only the tiny tracking-id bookkeeping (global `max_id` counter and
label-inheritance, Tracking.cc:1836-1900) stays on the host, exactly the
split the reference's design implies.

Per-point motion labels follow the reference's convention:
  -1 outlier / rejected, 0 static background, >0 global object tracking id.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Upper bound on distinct semantic/instance values in a mask image. The mask
# is mono8 in the reference (run_mask_rcnn.py:83-127), so 256 covers it.
MAX_SEM = 256

# Reference constants (Tracking.cc:1710, 1790, 1746)
BOUNDARY_ROWS = 10
BOUNDARY_COLS = 20
BOUNDARY_FRAC = 0.5
MIN_OBJ_POINTS = 150


class ObjectStats(NamedTuple):
    """Per-semantic-bin statistics and decisions; all arrays length MAX_SEM."""

    count: jnp.ndarray          # points per bin (valid, non-outlier)
    mean_depth: jnp.ndarray
    static_frac: jnp.ndarray    # fraction of points with small scene flow
    boundary_frac: jnp.ndarray
    is_boundary: jnp.ndarray    # bool: rejected, mostly on image border
    is_static: jnp.ndarray      # bool: scene-flow says not moving
    is_rejected: jnp.ndarray    # bool: too far or too few points
    is_tracked: jnp.ndarray     # bool: a live dynamic object this frame
    assoc_prev_sem: jnp.ndarray  # most-common last-frame semantic label


@partial(jax.jit, static_argnames=("height", "width"))
def compute_object_stats(
    uv: jnp.ndarray,        # (N, 2) current object-point pixels
    sem: jnp.ndarray,       # (N,) int32 current semantic labels
    sem_prev: jnp.ndarray,  # (N,) int32 last-frame semantic labels (aligned)
    sf_norm: jnp.ndarray,   # (N,) scene-flow xz-norm
    depth: jnp.ndarray,     # (N,)
    valid: jnp.ndarray,     # (N,) bool (excludes outliers)
    *,
    height: int,
    width: int,
    sf_mg_thres: float = 0.12,   # SFMgThres
    sf_ds_thres: float = 0.3,    # SFDsThres
    th_depth_obj: float = 60.0,  # ThDepthOBJ
) -> ObjectStats:
    sem_c = jnp.clip(sem, 0, MAX_SEM - 1)
    w = valid & (sem_c > 0)
    ones = w.astype(jnp.float32)

    def bincount(values):
        return jnp.zeros(MAX_SEM, jnp.float32).at[sem_c].add(values)

    count = bincount(ones)
    safe_count = jnp.maximum(count, 1.0)

    on_boundary = (
        (uv[:, 1] < BOUNDARY_ROWS)
        | (uv[:, 1] > height - BOUNDARY_ROWS)
        | (uv[:, 0] < BOUNDARY_COLS)
        | (uv[:, 0] > width - BOUNDARY_COLS)
    )
    boundary_frac = bincount(ones * on_boundary) / safe_count
    static_frac = bincount(ones * (sf_norm < sf_mg_thres)) / safe_count
    mean_depth = bincount(ones * depth) / safe_count

    present = count > 0
    is_boundary = present & (boundary_frac > BOUNDARY_FRAC)
    is_static = present & ~is_boundary & (static_frac > sf_ds_thres)
    is_rejected = (
        present
        & ~is_boundary
        & ~is_static
        & ((mean_depth > th_depth_obj) | (count < MIN_OBJ_POINTS))
    )
    is_tracked = present & ~is_boundary & ~is_static & ~is_rejected

    # association histogram: rows = current bin, cols = last-frame label
    prev_c = jnp.clip(sem_prev, 0, MAX_SEM - 1)
    hist = jnp.zeros((MAX_SEM, MAX_SEM), jnp.float32).at[sem_c, prev_c].add(ones)
    assoc_prev_sem = jnp.argmax(hist, axis=1).astype(jnp.int32)

    return ObjectStats(
        count=count,
        mean_depth=mean_depth,
        static_frac=static_frac,
        boundary_frac=boundary_frac,
        is_boundary=is_boundary,
        is_static=is_static,
        is_rejected=is_rejected,
        is_tracked=is_tracked,
        assoc_prev_sem=assoc_prev_sem,
    )


@jax.jit
def assign_point_labels(
    sem: jnp.ndarray,
    valid: jnp.ndarray,
    stats: ObjectStats,
    bin_track_id: jnp.ndarray,  # (MAX_SEM,) int32 tracking id per bin (host)
) -> jnp.ndarray:
    """Per-point motion labels from the per-bin decisions (-1/0/id)."""
    sem_c = jnp.clip(sem, 0, MAX_SEM - 1)
    lab = jnp.where(stats.is_tracked[sem_c], bin_track_id[sem_c], -1)
    lab = jnp.where(stats.is_static[sem_c], 0, lab)
    lab = jnp.where(valid & (sem_c > 0), lab, -1)
    return lab.astype(jnp.int32)


class TrackedObject(NamedTuple):
    sem_value: int     # semantic bin value this frame
    track_id: int      # global tracking id (nModLabel)


class ObjectTracker:
    """Host-side tracking-id bookkeeping (Tracking.cc:1836-1900).

    Keeps the global `max_id` counter, last frame's (semantic value ->
    tracking id) table and per-object status; assigns ids to the current
    frame's tracked bins by label inheritance.
    """

    def __init__(self):
        self.max_id = 1
        self.prev_sem_to_id: dict[int, int] = {}
        self.first_tracked_frame = True

    def assign_ids(self, stats: ObjectStats) -> tuple[np.ndarray, List[TrackedObject]]:
        tracked_bins = np.nonzero(np.asarray(stats.is_tracked))[0]
        assoc = np.asarray(stats.assoc_prev_sem)
        bin_track_id = np.zeros(MAX_SEM, np.int32)
        objects: List[TrackedObject] = []
        new_table: dict[int, int] = {}
        for b in tracked_bins:
            prev_lab = int(assoc[b])
            if not self.first_tracked_frame and prev_lab in self.prev_sem_to_id:
                tid = self.prev_sem_to_id[prev_lab]
            else:
                tid = self.max_id
                self.max_id += 1
            bin_track_id[b] = tid
            new_table[int(b)] = tid
            objects.append(TrackedObject(sem_value=int(b), track_id=tid))
        if len(tracked_bins) > 0:
            self.first_tracked_frame = False
        self.prev_sem_to_id = new_table
        return bin_track_id, objects

    def mark_failed(self, sem_value: int) -> None:
        """Motion estimation failed (<50 inliers, Tracking.cc:1218-1228):
        clear bObjStat so next frame cannot inherit this object's id."""
        self.prev_sem_to_id.pop(int(sem_value), None)
