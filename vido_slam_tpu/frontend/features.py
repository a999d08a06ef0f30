"""Feature sampling and image gathers — fixed-shape, fully vectorised.

TPU-native replacement for the reference's per-pixel feature loops:
- background keypoints: grid-random sampling gated by mask==0, valid depth
  below ThDepthBG and in-bounds flow (Frame.cc:36-241, SampleKeyPoints
  Frame.cc:888-958 — 20x20 grid, N=3000);
- dense object points: every `step`-th pixel where mask!=0 with valid depth
  below ThDepthOBJ (Frame.cc:184-211, step=4).

Instead of data-dependent lists, both samplers emit fixed-size slot arrays
with validity masks: eligibility is computed as a dense image mask, each
eligible pixel gets a priority (stratified random for background, raster
order for objects), and a single `top_k` picks the slots. This keeps every
shape static under jit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class FeatureSet(NamedTuple):
    """Fixed-size feature slots; `valid` gates everything downstream."""

    uv: jnp.ndarray      # (N, 2) float32 pixel coords (u=x, v=y)
    depth: jnp.ndarray   # (N,) float32 metric depth at the feature
    flow: jnp.ndarray    # (N, 2) float32 optical flow at the feature
    sem: jnp.ndarray     # (N,) int32 semantic/instance label (0 = background)
    valid: jnp.ndarray   # (N,) bool


def gather_nearest(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour gather of per-pixel values at float coords.

    img: (H, W) or (H, W, C); uv: (N, 2) as (u=col, v=row). Out-of-bounds
    coordinates clamp to the border (callers gate with their own masks).
    The reference reads depth/mask/flow at rounded keypoint positions
    (e.g. Frame.cc ObtainFlowDepth*, Tracking.cc:369-430).
    """
    H, W = img.shape[0], img.shape[1]
    c = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    r = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    return img[r, c]


def gather_depth_bilinear(depth: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear depth gather that falls back to NEAREST when any of the
    four taps is invalid (depth <= 0) OR the taps straddle a >5x depth
    ratio (a gross occlusion boundary, e.g. 5 m object against 80 m road
    — blending there fabricates depths that exist on no surface; the
    reference reads integer pixel coords, Frame.cc
    `imDepth.at<float>((int)y,(int)x)`, and never blends at all).

    A tighter 5% relative-spread gate was tried (r5) and REVERTED: on
    oblique surfaces (the road at grazing angles) adjacent rows routinely
    differ by >5%, so the gate quantised most far-ground reads to pixel
    centres and measurably degraded the VIO init's scale observability
    (test_vio_e2e scale 2.39 -> 1.55). The window-drag it was meant to fix
    was root-caused to the missing first odometry edge instead
    (tracking.py ring append). depth (H, W), uv (N, 2)."""
    H, W = depth.shape
    u = jnp.clip(uv[:, 0], 0.0, W - 1.0)
    v = jnp.clip(uv[:, 1], 0.0, H - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = u - u0
    fv = v - v0
    d00 = depth[v0, u0]
    d01 = depth[v0, u1]
    d10 = depth[v1, u0]
    d11 = depth[v1, u1]
    all_valid = (d00 > 0) & (d01 > 0) & (d10 > 0) & (d11 > 0)
    dmin = jnp.minimum(jnp.minimum(d00, d01), jnp.minimum(d10, d11))
    dmax = jnp.maximum(jnp.maximum(d00, d01), jnp.maximum(d10, d11))
    # gross-occlusion gate only (see docstring): >5x tap ratio -> nearest
    smooth = all_valid & (dmax <= 5.0 * dmin)
    bil = (
        d00 * (1 - fu) * (1 - fv) + d01 * fu * (1 - fv)
        + d10 * (1 - fu) * fv + d11 * fu * fv
    )
    nearest = gather_nearest(depth, uv)
    return jnp.where(smooth, bil, nearest)


def gather_bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear gather; img (H, W) or (H, W, C), uv (N, 2) as (u, v)."""
    H, W = img.shape[0], img.shape[1]
    u = jnp.clip(uv[:, 0], 0.0, W - 1.0)
    v = jnp.clip(uv[:, 1], 0.0, H - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = (u - u0)[:, None] if img.ndim == 3 else (u - u0)
    fv = (v - v0)[:, None] if img.ndim == 3 else (v - v0)
    p00 = img[v0, u0]
    p01 = img[v0, u1]
    p10 = img[v1, u0]
    p11 = img[v1, u1]
    top = p00 * (1 - fu) + p01 * fu
    bot = p10 * (1 - fu) + p11 * fu
    return top * (1 - fv) + bot * fv


def _pixel_grid(H: int, W: int):
    vv = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    uu = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return uu, vv


@partial(jax.jit, static_argnames=("n", "grid"))
def sample_background_features(
    key: jnp.ndarray,
    mask: jnp.ndarray,    # (H, W) int32 semantic mask, 0 = background
    depth: jnp.ndarray,   # (H, W) float32 metric depth (0 = invalid)
    flow: jnp.ndarray,    # (H, W, 2) float32 forward flow
    score_map: jnp.ndarray = None,  # (H, W) detector scores (FAST) or None
    *,
    n: int = 3000,        # MaxTrackPointBG (kaist_config.yaml:62)
    th_depth: float = 80.0,  # ThDepthBG
    grid: int = 20,       # SampleKeyPoints grid (Frame.cc:888-958)
) -> FeatureSet:
    """Grid-stratified background feature selection.

    Eligibility: mask==0, 0 < depth < th_depth, and the flow target stays
    in-bounds. Without `score_map` the in-cell priority is uniform random
    (UseSampleFeature=1, SampleKeyPoints Frame.cc:888-958); with a detector
    score map (ops/fast.py) the strongest corners win within each cell
    (UseSampleFeature=0, the reference's default detected-features mode).
    """
    H, W = depth.shape
    uu, vv = _pixel_grid(H, W)
    target_u = uu.astype(jnp.float32) + flow[..., 0]
    target_v = vv.astype(jnp.float32) + flow[..., 1]
    eligible = (
        (mask == 0)
        & (depth > 0.0)
        & (depth < th_depth)
        & (target_u >= 0)
        & (target_u < W)
        & (target_v >= 0)
        & (target_v < H)
    )

    # Stratification via rank-within-cell: tile the image into a grid x grid
    # cell layout, rank each eligible pixel inside its cell (by detector
    # score when given, else random noise), and use (-rank + tiebreak) as the
    # global priority. A global top-n then fills one point per cell, then
    # two, etc. — the reference's per-cell spreading / quadtree distribution,
    # degrading gracefully to "take everything" when few cells are populated.
    noise = jax.random.uniform(key, (H, W))
    if score_map is not None:
        eligible = eligible & (score_map > 0)
        prio_in_cell = score_map + noise * 1e-3
    else:
        prio_in_cell = noise
    prio = jnp.where(eligible, prio_in_cell, -jnp.inf)

    ch = -(-H // grid)  # cell height (ceil)
    cw = -(-W // grid)
    pad_h = ch * grid - H
    pad_w = cw * grid - W
    prio_p = jnp.pad(prio, ((0, pad_h), (0, pad_w)), constant_values=-jnp.inf)
    # (grid, ch, grid, cw) -> (grid*grid, ch*cw)
    cells = prio_p.reshape(grid, ch, grid, cw).transpose(0, 2, 1, 3).reshape(
        grid * grid, ch * cw
    )
    order = jnp.argsort(-cells, axis=1)
    ranks = jnp.argsort(order, axis=1).astype(jnp.float32)
    tie = cells / jnp.maximum(jnp.max(jnp.abs(cells), initial=1.0), 1.0)
    global_prio = jnp.where(jnp.isfinite(cells), -ranks + tie, -jnp.inf)
    _, sel = jax.lax.top_k(global_prio.reshape(-1), n)
    valid = jnp.isfinite(global_prio.reshape(-1)[sel])
    # recover padded-image coordinates of the winners
    cell_idx = sel // (ch * cw)
    within = sel % (ch * cw)
    r = (cell_idx // grid) * ch + within // cw
    c = (cell_idx % grid) * cw + within % cw
    r = jnp.clip(r, 0, H - 1)
    c = jnp.clip(c, 0, W - 1)
    uv = jnp.stack([c.astype(jnp.float32), r.astype(jnp.float32)], axis=-1)
    return FeatureSet(
        uv=uv,
        depth=depth[r, c],
        flow=flow[r, c],
        sem=jnp.zeros(n, jnp.int32),
        valid=valid,
    )


@partial(jax.jit, static_argnames=("n", "step"))
def sample_object_points(
    mask: jnp.ndarray,
    depth: jnp.ndarray,
    flow: jnp.ndarray,
    *,
    n: int = 4000,
    step: int = 4,         # dense sampling stride (Frame.cc:184)
    th_depth: float = 60.0,  # ThDepthOBJ
) -> FeatureSet:
    """Dense strided sampling of object pixels (mask != 0).

    Takes every `step`-th pixel in both directions where the semantic mask is
    nonzero and depth is valid/close, in raster order, up to `n` slots.
    """
    H, W = depth.shape
    ms = mask[::step, ::step]
    ds = depth[::step, ::step]
    fs = flow[::step, ::step]
    h, w = ds.shape
    uu, vv = _pixel_grid(h, w)
    eligible = (ms != 0) & (ds > 0.0) & (ds < th_depth)
    # raster-order priority among eligible pixels: higher for earlier pixels
    lin = (vv * w + uu).astype(jnp.float32)
    prio = jnp.where(eligible, -lin, -jnp.inf).reshape(-1)
    if prio.shape[0] < n:
        prio = jnp.pad(prio, (0, n - prio.shape[0]), constant_values=-jnp.inf)
    _, idx = jax.lax.top_k(prio, n)
    valid = jnp.isfinite(prio[idx])
    idx = jnp.minimum(idx, h * w - 1)
    r = idx // w
    c = idx % w
    uv = jnp.stack(
        [(c * step).astype(jnp.float32), (r * step).astype(jnp.float32)], axis=-1
    )
    return FeatureSet(
        uv=uv,
        depth=ds[r, c],
        flow=fs[r, c],
        sem=ms[r, c].astype(jnp.int32),
        valid=valid,
    )


@jax.jit
def propagate_features(
    feats: FeatureSet,
    new_depth: jnp.ndarray,
    new_mask: jnp.ndarray,
    new_flow: jnp.ndarray,
    *,
    th_depth: float = 80.0,
) -> FeatureSet:
    """Advance features to the next frame via their stored flow.

    The reference inherits correspondences (cur.mvStatKeys = last.mvCorres,
    Tracking.cc:369-430) and re-reads depth/semantic label/flow at the new
    locations from the current frame's images.
    """
    H, W = new_depth.shape
    uv_new = feats.uv + feats.flow
    in_b = (
        (uv_new[:, 0] >= 0)
        & (uv_new[:, 0] <= W - 1)
        & (uv_new[:, 1] >= 0)
        & (uv_new[:, 1] <= H - 1)
    )
    d = gather_depth_bilinear(new_depth, uv_new)
    s = gather_nearest(new_mask, uv_new).astype(jnp.int32)
    f = gather_bilinear(new_flow, uv_new)
    valid = feats.valid & in_b & (d > 0.0) & (d < th_depth)
    return FeatureSet(uv=uv_new, depth=d, flow=f, sem=s, valid=valid)
