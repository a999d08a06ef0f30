"""dp-sharded multi-sequence SLAM tracking — the SURVEY §2.4 "batch-sharded
mesh axis for multi-sequence KAIST eval" on the SLAM side.

The reference's distributed evaluation exists only around Mask R-CNN
(DistributedSampler + all_gather inference,
maskrcnn_benchmark/engine/inference.py:11-86); the SLAM core itself is a
single-process loop. The TPU-native counterpart batches S independent
sequences through the SAME per-frame tracking step (`tracking._track_step`,
the fused GrabImageRGBD/Track program) via vmap, shards the sequence axis
over the mesh's `dp` axis with GSPMD, and scans over time — S full SLAM
trackers advance in lockstep, one program launch per evaluation, XLA
placing each sequence's state on its dp shard.

Semantics: identical to running `Tracker` per sequence with the same seed
(key schedule replicated from Tracker.initialize/_next_key) in light-record
fused-BA mode — asserted by tests/test_parallel.py against the
single-device Tracker on the same inputs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vido_slam_tpu.config import Config
from vido_slam_tpu.frontend.features import (
    sample_background_features,
    sample_object_points,
)
from vido_slam_tpu.frontend.objects import MAX_SEM
from vido_slam_tpu.geometry.camera import Camera
from vido_slam_tpu.tracking import TrackState, _track_step


class MultiSeqResult(NamedTuple):
    Tcw: jnp.ndarray        # (S, T, 4, 4) per-frame refined camera poses
    ba_Twc: jnp.ndarray     # (S, W, 4, 4) final window poses per sequence
    n_inliers: jnp.ndarray  # (S, T) static-track health diagnostic


def init_track_state(
    key: jnp.ndarray,
    cam: Camera,
    depth: jnp.ndarray,
    flow: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    n_bg: int,
    n_obj: int,
    window: int,
    th_depth_bg: float,
    th_depth_obj: float,
) -> TrackState:
    """Functional Tracking::Initialization (Tracking.cc:1512-1580) —
    the device-state half of Tracker.initialize, same key schedule
    (split -> sample key, split -> state key)."""
    key, k_sample = jax.random.split(key)
    key, k_state = jax.random.split(key)
    stat = sample_background_features(
        k_sample, mask, depth, flow, None, n=n_bg, th_depth=th_depth_bg)
    obj = sample_object_points(
        mask, depth, flow, n=n_obj, th_depth=th_depth_obj)
    Tcw = jnp.eye(4)
    obs0 = cam.backproject(stat.uv, stat.depth)
    return TrackState(
        stat=stat,
        obj=obj,
        Tcw=Tcw,
        velocity=jnp.eye(4),
        has_velocity=jnp.bool_(False),
        bin_motion=jnp.tile(jnp.eye(4), (MAX_SEM, 1, 1)),
        bin_has_motion=jnp.zeros(MAX_SEM, bool),
        last_mask=mask,
        last_flow=flow,
        ba_obs=jnp.zeros((window, n_bg, 3)).at[-1].set(obs0),
        ba_obs_valid=jnp.zeros((window, n_bg), bool).at[-1].set(stat.valid),
        ba_age=stat.valid.astype(jnp.int32),
        ba_Twc=jnp.tile(jnp.eye(4), (window, 1, 1)),
        ba_odom=jnp.tile(jnp.eye(4), (window, 1, 1)),
        ba_odom_valid=jnp.zeros(window, bool),
        ba_nframes=jnp.int32(1),
        key=k_state,
    )


def _make_seq_runner(cam: Camera, cfg: Config, n_bg: int, n_obj: int,
                     max_objects: int, ba_points: int, ba_iters: int):
    s = cfg.system
    step = partial(
        _track_step,
        cam=cam,
        use_fast=False,
        joint_flow=False,
        n_bg=n_bg,
        n_obj=n_obj,
        max_objects=max_objects,
        th_depth_bg=s.th_depth_bg,
        th_depth_obj=s.th_depth_obj,
        sf_mg_thres=s.sf_mg_thres,
        sf_ds_thres=s.sf_ds_thres,
        height=cam.height,
        width=cam.width,
        fused_ba=True,
        ba_window=s.window_size,
        ba_points=ba_points,
        ba_iters=ba_iters,
        record_light=True,
        lm_pallas=False,
    )
    gray = jnp.zeros((cam.height, cam.width), jnp.float32)

    def run_sequence(key, depths, flows, masks):
        """depths (T, H, W), flows (T, H, W, 2), masks (T, H, W) int32 ->
        per-frame poses. Frame 0 initialises; frames 1..T-1 scan."""
        state0 = init_track_state(
            key, cam, depths[0], flows[0], masks[0],
            n_bg=n_bg, n_obj=n_obj, window=s.window_size,
            th_depth_bg=s.th_depth_bg, th_depth_obj=s.th_depth_obj)

        def body(state, inp):
            d, f, m = inp
            new_state, out = step(state, d, f, m, gray)
            n_inl = jnp.sum(new_state.ba_obs_valid[-1])
            # new_state.Tcw is the BA-refined newest pose — what
            # Tracker.track() returns per frame (recs[-1].Tcw after
            # _apply_fused_ba)
            return new_state, (new_state.Tcw, n_inl)

        final, (Tcws, n_inl) = jax.lax.scan(
            body, state0, (depths[1:], flows[1:], masks[1:]))
        Tcws = jnp.concatenate([jnp.eye(4)[None], Tcws])
        n_inl = jnp.concatenate(
            [jnp.sum(state0.stat.valid)[None], n_inl])
        return Tcws, final.ba_Twc, n_inl

    return run_sequence


def multi_sequence_tracking(
    mesh: Mesh,
    cfg: Config,
    depths: jnp.ndarray,   # (S, T, H, W) float32 metric depth
    flows: jnp.ndarray,    # (S, T, H, W, 2)
    masks: jnp.ndarray,    # (S, T, H, W) int32 semantic instance mask
    *,
    seeds=None,            # (S,) int seeds (default arange)
    n_bg: int = 800,
    n_obj: int = 500,
    max_objects: int = 4,
    ba_points: int = 400,
    ba_iters: int = 5,
) -> MultiSeqResult:
    """Run S sequences dp-sharded over the mesh in ONE jitted program.

    The sequence axis is placed on `dp` (NamedSharding P("dp")); each
    sequence's full TrackState lives on its shard and never crosses the
    interconnect — the only collective is the implicit result gather."""
    cam = Camera.create(
        fx=cfg.camera.fx, fy=cfg.camera.fy, cx=cfg.camera.cx,
        cy=cfg.camera.cy, width=cfg.camera.width, height=cfg.camera.height,
        bf=cfg.camera.bf, fps=cfg.camera.fps)
    S = depths.shape[0]
    if seeds is None:
        seeds = jnp.arange(S)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))

    # GSPMD needs the dp axis divisible by the mesh's dp size: pad by
    # replicating the last sequence (padded results are sliced off)
    dp = mesh.shape["dp"]
    Sp = -(-S // dp) * dp
    if Sp != S:
        def padrep(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (Sp - S,) + x.shape[1:])])
        keys, depths, flows, masks = map(padrep, (keys, depths, flows, masks))

    run_seq = _make_seq_runner(cam, cfg, n_bg, n_obj, max_objects,
                               ba_points, ba_iters)
    sh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=rep)
    def run_all(keys, depths, flows, masks):
        Tcws, ba_Twc, n_inl = jax.vmap(run_seq)(keys, depths, flows, masks)
        return MultiSeqResult(Tcw=Tcws, ba_Twc=ba_Twc, n_inliers=n_inl)

    args = jax.device_put((keys, depths, flows, masks), sh)
    res = run_all(*args)
    return MultiSeqResult(Tcw=res.Tcw[:S], ba_Twc=res.ba_Twc[:S],
                          n_inliers=res.n_inliers[:S])
