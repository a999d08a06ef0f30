"""FAST-9/16 corner detection as whole-image vector ops — the TPU
replacement for the reference's ORBextractor corner stage
(vido_slam/src/ORBextractor.cc ComputeKeyPointsOctTree; the system uses only
the FAST corners, src/config/kaist_config.yaml:78).

A pixel is a corner when >= 9 contiguous pixels on its radius-3 Bresenham
circle are all brighter than center + t or all darker than center - t.
Instead of per-pixel branching, the 16 circle neighbours become 16 shifted
copies of the image; the contiguous-arc test is an OR over 16 rotations of a
9-way AND — 144 boolean image ops that fuse into a handful of VPU kernels.
Score = sum of |neighbour - center| over qualifying neighbours (the
OpenCV-compatible ranking for NMS); non-max suppression is a 3x3 max-pool.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# radius-3 Bresenham circle, clockwise from 12 o'clock (OpenCV order)
CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
ARC = 9


def _shift(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """out[y, x] = img[y + dy, x + dx], edge-replicated."""
    H, W = img.shape
    py0, py1 = max(0, -dy), max(0, dy)
    px0, px1 = max(0, -dx), max(0, dx)
    p = jnp.pad(img, ((py0, py1), (px0, px1)), mode="edge")
    return lax.dynamic_slice(p, (py0 + dy, px0 + dx), (H, W))


@partial(jax.jit, static_argnames=("threshold",))
def fast_score_map(gray: jnp.ndarray, threshold: int = 20) -> jnp.ndarray:
    """(H, W) float32 grayscale -> (H, W) corner score (0 = not a corner).

    Non-max-suppressed: only local 3x3 maxima keep their score. A 3-pixel
    border is zeroed (the circle would leave the image)."""
    g = gray.astype(jnp.float32)
    t = float(threshold)
    taps = [_shift(g, dx, dy) for dx, dy in CIRCLE]

    bright = [p > g + t for p in taps]
    dark = [p < g - t for p in taps]

    def arc_any(flags):
        hit = jnp.zeros_like(g, dtype=bool)
        for s in range(16):
            run = flags[s]
            for k in range(1, ARC):
                run = run & flags[(s + k) % 16]
            hit = hit | run
        return hit

    is_corner = arc_any(bright) | arc_any(dark)

    diffs = [jnp.abs(p - g) for p in taps]
    score = jnp.zeros_like(g)
    for p, b, d, df in zip(taps, bright, dark, diffs):
        score = score + jnp.where(b | d, df, 0.0)
    score = jnp.where(is_corner, score, 0.0)

    # 3x3 non-max suppression
    m = lax.reduce_window(
        score, -jnp.inf, lax.max, (3, 3), (1, 1), [(1, 1), (1, 1)]
    )
    score = jnp.where(score >= m, score, 0.0)

    # kill the border
    H, W = g.shape
    vv = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    uu = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (vv >= 3) & (vv < H - 3) & (uu >= 3) & (uu < W - 3)
    return jnp.where(inb, score, 0.0)


@partial(jax.jit, static_argnames=("n", "threshold", "min_threshold", "grid"))
def detect_fast_features(
    gray: jnp.ndarray,
    *,
    n: int = 2000,               # ORBextractor.nFeatures
    threshold: int = 20,         # iniThFAST
    min_threshold: int = 7,      # minThFAST (fallback in sparse cells)
    grid: int = 20,
):
    """Top-n FAST corners with per-cell spatial spreading (the reference's
    quadtree DistributeOctTree becomes rank-within-cell selection, the same
    static-shape pattern as the background sampler). Cells that find nothing
    at `threshold` fall back to `min_threshold` corners
    (ORBextractor.cc:ComputeKeyPointsOctTree's retry).

    Returns (uv (n, 2) float32, score (n,), valid (n,))."""
    H, W = gray.shape
    s_hi = fast_score_map(gray, threshold=threshold)
    s_lo = fast_score_map(gray, threshold=min_threshold)
    # prefer high-threshold corners by a large bonus; low-threshold corners
    # fill in where nothing stronger exists
    prio = jnp.where(s_hi > 0, s_hi + 1e6, jnp.where(s_lo > 0, s_lo, -jnp.inf))

    ch = -(-H // grid)
    cw = -(-W // grid)
    prio_p = jnp.pad(
        prio, ((0, ch * grid - H), (0, cw * grid - W)), constant_values=-jnp.inf
    )
    cells = prio_p.reshape(grid, ch, grid, cw).transpose(0, 2, 1, 3).reshape(
        grid * grid, ch * cw
    )
    order = jnp.argsort(-cells, axis=1)
    ranks = jnp.argsort(order, axis=1).astype(jnp.float32)
    # rank-first global priority with the raw score as tiebreak
    gp = jnp.where(jnp.isfinite(cells), -ranks * 1e8 + cells, -jnp.inf)
    _, sel = jax.lax.top_k(gp.reshape(-1), n)
    valid = jnp.isfinite(gp.reshape(-1)[sel])
    cell_idx = sel // (ch * cw)
    within = sel % (ch * cw)
    r = jnp.clip((cell_idx // grid) * ch + within // cw, 0, H - 1)
    c = jnp.clip((cell_idx % grid) * cw + within % cw, 0, W - 1)
    uv = jnp.stack([c.astype(jnp.float32), r.astype(jnp.float32)], axis=-1)
    score = prio.reshape(-1)[jnp.clip(r * W + c, 0, H * W - 1)]
    return uv, jnp.where(valid, score, 0.0), valid
