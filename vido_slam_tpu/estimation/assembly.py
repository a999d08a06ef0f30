"""Window-BA problem assembly from the map — the counterpart of the
reference's tracklet builders GetStaticTrack / GetDynamicTrackNew
(vido_slam/src/Tracking.cc:2514-2957) plus the input-marshalling loops of
PartialBatchOptimization (Optimizer.cc:43-300).

Because feature slots are persistent (a surviving track stays in its slot,
see frontend/renewal.py), a static tracklet inside a window is a maximal run
of a slot with `stat_is_new == False` after its start. This module walks the
window's FrameRecords once with vectorised numpy, groups observations into
tracks, applies the length >= 3 gate (FeaLengthThresSta, Optimizer.cc:211),
and emits the fixed-shape arrays `solve_window_ba` consumes.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.slam_map import SlamMap

MIN_TRACK_LEN = 3  # FeaLengthThresSta / FeaLengthThresDyn


class WindowProblem(NamedTuple):
    frame_ids: List[int]     # map frame ids in window order
    Twc0: np.ndarray         # (W, 4, 4)
    odom: np.ndarray         # (W-1, 4, 4)
    odom_valid: np.ndarray   # (W-1,)
    X0: np.ndarray           # (P, 3)
    obs: np.ndarray          # (W, P, 3) camera-frame measurements
    obs_valid: np.ndarray    # (W, P)
    point_valid: np.ndarray  # (P,)
    # bookkeeping for write-back: the (frame_idx_in_window, slot) of each
    # track's first observation, -1 padded
    track_start: np.ndarray  # (P, 2) int32
    slots: np.ndarray        # (W, P) int32 slot of each observation, -1 pad
    pad: int                 # number of front-pad frames


def assemble_full_problem(
    slam_map: SlamMap,
    cam: Camera,
    max_frames: int,
    max_static: int,
    max_objects_per_frame: int,
):
    """Build the FullBatchOptimization inputs (Optimizer.cc:1235-2178):
    the static window problem over the WHOLE sequence plus the dynamic
    side — slot-aligned dynamic point observations, per-frame object motion
    slots keyed by tracking id, ternary links for slots continuing from the
    previous frame, and smoothness links between consecutive motions of the
    same object. Returns (FullBAProblem, static WindowProblem, motion_ids)
    where motion_ids (F, K) holds each motion slot's tracking id (-1 pad)."""
    import jax.numpy as jnp

    from vido_slam_tpu.estimation.full_ba import FullBAProblem

    F = max_frames
    n = min(len(slam_map), F)
    recs = slam_map.frames[len(slam_map) - n:]
    pad = F - n
    K = max_objects_per_frame
    Nd = recs[0].obj_uv.shape[0]

    stat = assemble_static_window(slam_map, cam, F, max_static)

    frame_valid = np.zeros(F, bool)
    frame_valid[pad:] = True

    dobs = np.zeros((F, Nd, 3), np.float32)
    dobs_valid = np.zeros((F, Nd), bool)
    D0 = np.zeros((F, Nd, 3), np.float32)
    tern_valid = np.zeros((F, Nd), bool)
    midx = np.zeros((F, Nd), np.int32)
    H0 = np.tile(np.eye(4, dtype=np.float32), (F, K, 1, 1))
    motion_valid = np.zeros((F, K), bool)
    smooth_valid = np.zeros((F, K), bool)
    motion_ids = np.full((F, K), -1, np.int32)

    prev_labels = None
    prev_valid = None
    for fi, rec in enumerate(recs):
        f = pad + fi
        # motion slots for this frame, ordered by track id
        obs_ok = [ob for ob in rec.objects if ob.status][:K]
        tid_to_k = {}
        for k, ob in enumerate(obs_ok):
            H0[f, k] = ob.motion
            motion_valid[f, k] = True
            motion_ids[f, k] = ob.track_id
            tid_to_k[ob.track_id] = k
        if fi > 0:
            for k in range(K):
                tid = motion_ids[f, k]
                if tid >= 0 and tid in motion_ids[f - 1]:
                    smooth_valid[f, k] = True

        labels = rec.obj_label
        valid = rec.obj_valid & (labels > 0)
        # map point label (track id) to this frame's motion slot
        k_of = np.full(labels.shape[0], -1, np.int32)
        for tid, k in tid_to_k.items():
            k_of[labels == tid] = k
        use = valid & (k_of >= 0)
        dobs[f][use] = _backproject_np(
            cam, rec.obj_uv[use], rec.obj_depth[use]
        )
        dobs_valid[f] = use
        D0[f] = rec.obj_3d
        midx[f][use] = k_of[use]
        if prev_labels is not None:
            cont = use & ~rec.obj_is_new & (prev_labels == labels) & prev_valid
            tern_valid[f] = cont
        prev_labels = labels
        prev_valid = use

    prob = FullBAProblem(
        Twc0=jnp.asarray(stat.Twc0),
        frame_valid=jnp.asarray(frame_valid),
        odom=jnp.asarray(stat.odom),
        odom_valid=jnp.asarray(stat.odom_valid),
        X0=jnp.asarray(stat.X0),
        sobs=jnp.asarray(stat.obs),
        sobs_valid=jnp.asarray(stat.obs_valid),
        spoint_valid=jnp.asarray(stat.point_valid),
        D0=jnp.asarray(D0),
        dobs=jnp.asarray(dobs),
        dobs_valid=jnp.asarray(dobs_valid),
        tern_valid=jnp.asarray(tern_valid),
        midx=jnp.asarray(midx),
        H0=jnp.asarray(H0),
        motion_valid=jnp.asarray(motion_valid),
        smooth_valid=jnp.asarray(smooth_valid),
    )
    return prob, stat, motion_ids


def _backproject_np(cam: Camera, uv: np.ndarray, depth: np.ndarray) -> np.ndarray:
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    x = (uv[..., 0] - cx) * depth / fx
    y = (uv[..., 1] - cy) * depth / fy
    return np.stack([x, y, depth], axis=-1)


def assemble_static_window(
    slam_map: SlamMap,
    cam: Camera,
    window_size: int,
    max_points: int,
) -> WindowProblem:
    """Build the fixed-shape static window problem from the last
    min(len(map), window_size) frames, front-padded to window_size."""
    n_frames = len(slam_map)
    w = min(n_frames, window_size)
    recs = slam_map.frames[n_frames - w:]
    W = window_size
    pad = W - w
    N = recs[0].stat_uv.shape[0]

    valid = np.stack([r.stat_valid for r in recs])          # (w, N)
    is_new = np.stack([r.stat_is_new for r in recs])
    uv = np.stack([r.stat_uv for r in recs])
    depth = np.stack([r.stat_depth for r in recs])
    p3d = np.stack([r.stat_3d for r in recs])

    # segment start frame per (frame, slot): first window frame restarts all
    seg_start = np.zeros((w, N), np.int32)
    for t in range(1, w):
        seg_start[t] = np.where(is_new[t], t, seg_start[t - 1])
        # a slot that is invalid at t breaks the chain for later frames
        seg_start[t] = np.where(
            valid[t] & ~valid[t - 1] & ~is_new[t], t, seg_start[t]
        )
    key = seg_start.astype(np.int64) * N + np.arange(N)[None, :]

    flat_valid = valid.reshape(-1)
    flat_key = key.reshape(-1)
    obs_keys = flat_key[flat_valid]
    uniq, inverse, counts = np.unique(
        obs_keys, return_inverse=True, return_counts=True
    )
    keep = counts >= MIN_TRACK_LEN
    # rank kept tracks by length, cap at max_points
    kept_ids = np.nonzero(keep)[0]
    order = kept_ids[np.argsort(-counts[kept_ids], kind="stable")][:max_points]
    P = max_points
    track_of_uniq = np.full(uniq.shape[0], -1, np.int64)
    track_of_uniq[order] = np.arange(order.shape[0])

    obs = np.zeros((W, P, 3), np.float32)
    obs_valid = np.zeros((W, P), bool)
    slots = np.full((W, P), -1, np.int32)
    X0 = np.zeros((P, 3), np.float32)
    track_start = np.full((P, 2), -1, np.int32)
    point_valid = np.zeros(P, bool)
    point_valid[: order.shape[0]] = True

    # scatter observations
    frame_idx = np.repeat(np.arange(w), N)[flat_valid]
    slot_idx = np.tile(np.arange(N), w)[flat_valid]
    tr = track_of_uniq[inverse]
    sel = tr >= 0
    fi = frame_idx[sel] + pad
    tr_s = tr[sel]
    xc = _backproject_np(
        cam, uv[frame_idx[sel], slot_idx[sel]], depth[frame_idx[sel], slot_idx[sel]]
    )
    obs[fi, tr_s] = xc
    obs_valid[fi, tr_s] = True
    slots[fi, tr_s] = slot_idx[sel]

    # first observation of each track initialises the point + bookkeeping
    sl_s = slot_idx[sel]
    first = np.full(P, W + 1, np.int32)
    np.minimum.at(first, tr_s, fi)
    is_first = fi == first[tr_s]
    t_f, f_f, s_f = tr_s[is_first], fi[is_first], sl_s[is_first]
    track_start[t_f] = np.stack([f_f, s_f], axis=-1)
    X0[t_f] = p3d[f_f - pad, s_f]

    Twc0 = np.stack(
        [np.eye(4, dtype=np.float32)] * pad
        + [np.linalg.inv(r.Tcw).astype(np.float32) for r in recs]
    )
    odom = np.tile(np.eye(4, dtype=np.float32), (W - 1, 1, 1))
    odom_valid = np.zeros(W - 1, bool)
    for i in range(1, w):
        m = recs[i].cam_motion
        if m is not None:
            odom[pad + i - 1] = m
            odom_valid[pad + i - 1] = True

    return WindowProblem(
        frame_ids=[r.frame_id for r in recs],
        Twc0=Twc0,
        odom=odom,
        odom_valid=odom_valid,
        X0=X0,
        obs=obs,
        obs_valid=obs_valid,
        point_valid=point_valid,
        track_start=track_start,
        slots=slots,
        pad=pad,
    )
