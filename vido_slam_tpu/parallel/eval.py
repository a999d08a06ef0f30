"""Multi-chip batched evaluation — scaling the SLAM back-end across a
device mesh.

The reference's only distributed machinery is DDP training (SURVEY §2.4);
its evaluation is strictly single-process. On TPU the natural scale-out
for offline work (multi-sequence KAIST eval, parameter sweeps, map
refinement) is to BATCH whole solver problems and shard the batch over the
`dp` mesh axis: `solve_window_ba` is a fixed-shape pure function, so a
stack of S window problems is one vmapped program and GSPMD splits it
S/dp per chip with zero communication until the final gather.

`sharded_window_ba` is the building block; `evaluate_sequences` runs the
full ATE computation for a batch of trajectories from sharded solves.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vido_slam_tpu.estimation.window_ba import WindowBAResult, solve_window_ba


class BatchedWindowProblem(NamedTuple):
    """S stacked fixed-shape window problems (leading axis = sequence)."""

    Twc0: jnp.ndarray         # (S, W, 4, 4)
    odom: jnp.ndarray         # (S, W-1, 4, 4)
    odom_valid: jnp.ndarray   # (S, W-1)
    X0: jnp.ndarray           # (S, P, 3)
    obs: jnp.ndarray          # (S, W, P, 3)
    obs_valid: jnp.ndarray    # (S, W, P)
    point_valid: jnp.ndarray  # (S, P)
    frame_valid: jnp.ndarray  # (S, W)


def sharded_window_ba(
    mesh: Mesh, probs: BatchedWindowProblem, max_iters: int = 15
) -> WindowBAResult:
    """Solve S window problems dp-sharded over the mesh; each chip runs
    S/dp independent LM solves (no collectives inside — GSPMD only gathers
    the stacked results)."""

    @partial(jax.jit, static_argnames=("max_iters",))
    def run(pr: BatchedWindowProblem, max_iters: int):
        return jax.vmap(
            lambda t, o, ov, x, ob, obv, pv, fv: solve_window_ba(
                t, o, ov, x, ob, obv, pv, fv, max_iters=max_iters)
        )(pr.Twc0, pr.odom, pr.odom_valid, pr.X0, pr.obs, pr.obs_valid,
          pr.point_valid, pr.frame_valid)

    sh = NamedSharding(mesh, P("dp"))
    probs = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sh), probs)
    return run(probs, max_iters)


def evaluate_sequences(mesh: Mesh, probs: BatchedWindowProblem,
                       gt_Twc: jnp.ndarray, max_iters: int = 15):
    """Sharded solves + per-sequence ATE RMSE against GT camera-to-world
    poses (S, W, 4, 4). Returns (result, ate (S,))."""
    res = sharded_window_ba(mesh, probs, max_iters)
    c_est = res.Twc[..., :3, 3]
    c_gt = jnp.asarray(gt_Twc)[..., :3, 3]
    fv = jnp.asarray(probs.frame_valid)
    d2 = jnp.sum((c_est - c_gt) ** 2, axis=-1) * fv
    ate = jnp.sqrt(jnp.sum(d2, axis=-1) / jnp.maximum(fv.sum(-1), 1))
    return res, ate
