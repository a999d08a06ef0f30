"""Slot-persistent feature renewal — Tracking::RenewFrameInfo
(reference vido_slam/src/Tracking.cc:2959-3289), TPU-first.

The reference keeps tracked inliers and tops features back up to the budget
(MaxTrackPointBG / MaxTrackPointOBJ) with fresh detections, deduplicating
new picks that fall within 1 px of a kept point (Tracking.cc:3025-3075's
O(N*M) scan).

TPU design: feature arrays have FIXED slots. A surviving track stays in its
slot (so slot index == tracklet identity across frames — this is what makes
window-BA assembly trivial); fresh candidates fill the invalid slots via a
rank-matching gather (r-th invalid slot takes the r-th valid candidate).
Dedup uses an occupancy image instead of the quadratic scan.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from vido_slam_tpu.frontend.features import FeatureSet


@partial(jax.jit, static_argnames=("height", "width"))
def dedup_against(
    fresh: FeatureSet, keep_uv: jnp.ndarray, keep_valid: jnp.ndarray,
    height: int, width: int,
) -> FeatureSet:
    """Invalidate fresh candidates landing on a kept point's pixel.

    Builds an occupancy grid from kept positions (rounded), then gathers it
    at the fresh positions — the vectorised equivalent of the reference's
    min_dist < 1 px scan.
    """
    H, W = height, width
    occ = jnp.zeros((H, W), jnp.bool_)
    r = jnp.clip(jnp.round(keep_uv[:, 1]).astype(jnp.int32), 0, H - 1)
    c = jnp.clip(jnp.round(keep_uv[:, 0]).astype(jnp.int32), 0, W - 1)
    occ = occ.at[r, c].max(keep_valid)
    fr = jnp.clip(jnp.round(fresh.uv[:, 1]).astype(jnp.int32), 0, H - 1)
    fc = jnp.clip(jnp.round(fresh.uv[:, 0]).astype(jnp.int32), 0, W - 1)
    clash = occ[fr, fc]
    return fresh._replace(valid=fresh.valid & ~clash)


@jax.jit
def fill_invalid_slots(
    kept: FeatureSet, fresh: FeatureSet
) -> Tuple[FeatureSet, jnp.ndarray]:
    """Fill invalid slots of `kept` with valid candidates from `fresh`.

    Returns (renewed FeatureSet, is_new (N,) bool). Slot alignment of
    surviving tracks is preserved; the r-th invalid slot receives the r-th
    valid fresh candidate (candidates in priority order).
    """
    n = kept.valid.shape[0]
    # order fresh candidates: valid ones first, stable
    order = jnp.argsort(~fresh.valid, stable=True)
    f_uv = fresh.uv[order]
    f_depth = fresh.depth[order]
    f_flow = fresh.flow[order]
    f_sem = fresh.sem[order]
    f_valid = fresh.valid[order]
    num_fresh = jnp.sum(f_valid)

    invalid = ~kept.valid
    rank = jnp.cumsum(invalid) - 1  # rank among invalid slots
    cand = jnp.clip(rank, 0, f_uv.shape[0] - 1)
    take = invalid & (rank < num_fresh)

    uv = jnp.where(take[:, None], f_uv[cand], kept.uv)
    depth = jnp.where(take, f_depth[cand], kept.depth)
    flow = jnp.where(take[:, None], f_flow[cand], kept.flow)
    sem = jnp.where(take, f_sem[cand], kept.sem)
    valid = kept.valid | take
    return (
        FeatureSet(uv=uv, depth=depth, flow=flow, sem=sem, valid=valid),
        take,
    )


@partial(jax.jit, static_argnames=("height", "width"))
def renew_features(
    tracked: FeatureSet,
    tracked_inlier: jnp.ndarray,  # (N,) bool: survived pose optimization
    fresh: FeatureSet,            # candidates sampled from the current frame
    *,
    height: int,
    width: int,
) -> Tuple[FeatureSet, jnp.ndarray]:
    """Keep inlier tracks in place, refill the rest from fresh samples.

    Returns (renewed features, is_new mask)."""
    kept = tracked._replace(valid=tracked.valid & tracked_inlier)
    fresh_d = dedup_against(fresh, kept.uv, kept.valid, height, width)
    return fill_invalid_slots(kept, fresh_d)
