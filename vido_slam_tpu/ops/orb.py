"""ORB feature extraction, TPU-native — the reference's ORBextractor
(vido_slam/src/ORBextractor.cc, include/ORBextractor.h).

The reference implements ORB-SLAM2's extractor: an 8-level 1.2x image
pyramid (ComputePyramid, ORBextractor.cc:1044), per-level FAST-9/16 with a
high/low threshold retry distributed by a quadtree
(ComputeKeyPointsOctTree + DistributeOctTree, :529-832), intensity-centroid
orientation (IC_Angle, :77-100) and steered-BRIEF descriptors
(computeOrbDescriptor, :105-147).  The SLAM system itself consumes only the
corner positions — matching is done by optical flow (Frame.cc:36-241) — so
descriptors here are API parity for users of the extractor.

TPU-first redesign, no per-keypoint control flow:
- pyramid: static per-level shapes, bilinear `jax.image.resize`;
- FAST: whole-image vector ops (`ops/fast.py`);
- quadtree distribution -> rank-within-cell top-k (same selection pressure:
  spatially spread, best-response-first), per level with ORB-SLAM2's
  geometric per-level feature budget;
- orientation: the circular-patch image moments m01/m10 are two 31x31
  convolutions over the whole level image (one fused conv with 2 output
  channels), then a gather at the keypoints — no per-keypoint patch loops;
- descriptors: steered BRIEF over the canonical learned 256-pair test
  table `bit_pattern_31_` (ORBextractor.cc:140-438 — a published constant
  table, transcribed to `orb_pattern.npy`, not code), sampled with one
  (N, 512) gather after rotating the pattern by each keypoint's angle, so
  descriptors are bit-compatible with the reference's computeOrbDescriptor
  (ORBextractor.cc:105-147) semantics;
- matching: brute-force Hamming via `lax.population_count` with ratio and
  cross-check options.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vido_slam_tpu.ops.fast import detect_fast_features

N_LEVELS = 8          # ORBextractor.h nlevels
SCALE_FACTOR = 1.2    # scaleFactor
HALF_PATCH = 15       # HALF_PATCH_SIZE (orientation radius)
PATCH_SIZE = 31
EDGE = 19             # EDGE_THRESHOLD border


class OrbFeatures(NamedTuple):
    uv: jnp.ndarray          # (n, 2) level-0 pixel coords (u, v)
    response: jnp.ndarray    # (n,) FAST score
    angle: jnp.ndarray       # (n,) radians, intensity-centroid orientation
    octave: jnp.ndarray      # (n,) int32 pyramid level
    size: jnp.ndarray        # (n,) patch diameter in level-0 pixels
    descriptor: jnp.ndarray  # (n, 32) uint8 steered-BRIEF
    valid: jnp.ndarray       # (n,) bool


def level_sizes(h: int, w: int, n_levels: int = N_LEVELS,
                scale: float = SCALE_FACTOR):
    """Static (h, w) per pyramid level (ComputePyramid shapes)."""
    out = []
    for lv in range(n_levels):
        s = 1.0 / (scale ** lv)
        out.append((max(int(round(h * s)), 32), max(int(round(w * s)), 32)))
    return out


def features_per_level(n: int, n_levels: int = N_LEVELS,
                       scale: float = SCALE_FACTOR):
    """ORB-SLAM2's geometric budget (ORBextractor.cc:62-76): level l gets
    n * (1-1/s) / (1-(1/s)^L) * (1/s)^l, remainder to the coarsest."""
    inv = 1.0 / scale
    per = n * (1 - inv) / (1 - inv ** n_levels)
    counts = [max(int(round(per * inv ** lv)), 8) for lv in range(n_levels - 1)]
    counts.append(max(n - sum(counts), 8))
    return counts


def _brief_pattern() -> np.ndarray:
    """(256, 2, 2) int32 point pairs [(x0,y0),(x1,y1)] per bit: the learned
    ORB test-pair table `bit_pattern_31_` (ORBextractor.cc:140-438),
    transcribed as a data file. All offsets lie within +/-13 of the center,
    inside the radius-15 orientation patch."""
    pat = np.load(__file__.replace("orb.py", "orb_pattern.npy"))
    assert pat.shape == (256, 2, 2) and pat.dtype == np.int32
    return pat


_PATTERN = _brief_pattern()


def _moment_kernel() -> np.ndarray:
    """(31, 31, 1, 2) conv kernel: output ch0 = m10 (x moment), ch1 = m01
    (y moment) over the radius-15 circular patch (IC_Angle's u_max arc)."""
    ys, xs = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    circ = (xs * xs + ys * ys) <= HALF_PATCH * HALF_PATCH
    k = np.stack([xs * circ, ys * circ], axis=-1).astype(np.float32)
    return k[:, :, None, :]


_MOMENTS = _moment_kernel()


def orientation_map(gray: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H, W) angle in radians at every pixel: atan2(m01, m10) of
    the centered circular patch. The reference computes this per keypoint
    (IC_Angle); one 2-channel conv computes it everywhere and keypoints
    gather — the conv maps onto the MXU, the per-keypoint loop would not."""
    x = gray.astype(jnp.float32)[None, :, :, None]
    m = lax.conv_general_dilated(
        x, jnp.asarray(_MOMENTS), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    return jnp.arctan2(m[:, :, 1], m[:, :, 0])


def _gather(img: jnp.ndarray, r: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    return img[jnp.clip(r, 0, H - 1), jnp.clip(c, 0, W - 1)]


def steered_brief(gray: jnp.ndarray, uv: jnp.ndarray,
                  angle: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 descriptors: rotate the 256 point pairs by each
    keypoint's angle (computeOrbDescriptor's steering), nearest-sample the
    512 taps in one gather, compare, pack bits."""
    pat = jnp.asarray(_PATTERN, jnp.float32)          # (256, 2, 2) [x, y]
    ca, sa = jnp.cos(angle), jnp.sin(angle)           # (N,)
    px, py = pat[..., 0], pat[..., 1]                 # (256, 2)
    rx = ca[:, None, None] * px - sa[:, None, None] * py   # (N, 256, 2)
    ry = sa[:, None, None] * px + ca[:, None, None] * py
    c = jnp.round(uv[:, 0][:, None, None] + rx).astype(jnp.int32)
    r = jnp.round(uv[:, 1][:, None, None] + ry).astype(jnp.int32)
    vals = _gather(gray.astype(jnp.float32), r, c)    # (N, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # (N, 256)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits.reshape(-1, 32, 8) * weights, axis=-1, dtype=jnp.uint8)


@partial(jax.jit, static_argnames=("n", "n_levels", "scale_factor",
                                   "threshold", "min_threshold"))
def orb_extract(
    gray: jnp.ndarray,
    *,
    n: int = 2000,            # ORBextractor.nFeatures
    n_levels: int = N_LEVELS,
    scale_factor: float = SCALE_FACTOR,
    threshold: int = 20,      # iniThFAST
    min_threshold: int = 7,   # minThFAST
) -> OrbFeatures:
    """Full ORB pipeline over a (H, W) float grayscale image."""
    H, W = gray.shape
    sizes = level_sizes(H, W, n_levels, scale_factor)
    budgets = features_per_level(n, n_levels, scale_factor)

    uvs, resps, angs, octs, szs, descs, vals = [], [], [], [], [], [], []
    for lv, ((lh, lw), n_lv) in enumerate(zip(sizes, budgets)):
        g = gray if lv == 0 else jax.image.resize(gray, (lh, lw), "linear")
        uv, score, ok = detect_fast_features(
            g, n=n_lv, threshold=threshold, min_threshold=min_threshold,
        )
        # drop the EDGE border (scaled): descriptors need the full patch
        inb = ((uv[:, 0] >= EDGE) & (uv[:, 0] < lw - EDGE)
               & (uv[:, 1] >= EDGE) & (uv[:, 1] < lh - EDGE))
        ok = ok & inb
        amap = orientation_map(g)
        a = _gather(amap, uv[:, 1].astype(jnp.int32), uv[:, 0].astype(jnp.int32))
        d = steered_brief(g, uv, a)
        s = scale_factor ** lv
        uvs.append(uv * s)
        resps.append(jnp.where(ok, score, 0.0))
        angs.append(a)
        octs.append(jnp.full(n_lv, lv, jnp.int32))
        szs.append(jnp.full(n_lv, PATCH_SIZE * s, jnp.float32))
        descs.append(d)
        vals.append(ok)

    return OrbFeatures(
        uv=jnp.concatenate(uvs),
        response=jnp.concatenate(resps),
        angle=jnp.concatenate(angs),
        octave=jnp.concatenate(octs),
        size=jnp.concatenate(szs),
        descriptor=jnp.concatenate(descs),
        valid=jnp.concatenate(vals),
    )


@partial(jax.jit, static_argnames=("cross_check",))
def match_descriptors(
    d1: jnp.ndarray, v1: jnp.ndarray,
    d2: jnp.ndarray, v2: jnp.ndarray,
    max_distance: int = 64,
    ratio: float = 0.8,
    cross_check: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force Hamming matcher: for each row of d1 the best column of
    d2, gated by Lowe ratio, absolute distance, and optional cross-check.
    Returns (idx (N1,) int32 into d2, ok (N1,) bool)."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    dist = jnp.sum(lax.population_count(x).astype(jnp.int32), axis=-1)
    dist = jnp.where(v1[:, None] & v2[None, :], dist, 10_000)
    idx = jnp.argmin(dist, axis=1)
    best = jnp.min(dist, axis=1)
    second = jnp.min(
        jnp.where(jax.nn.one_hot(idx, dist.shape[1], dtype=bool), 10_000, dist),
        axis=1,
    )
    ok = (best <= max_distance) & (best.astype(jnp.float32)
                                   < ratio * second.astype(jnp.float32))
    if cross_check:
        back = jnp.argmin(dist, axis=0)
        ok = ok & (back[idx] == jnp.arange(d1.shape[0]))
    return idx.astype(jnp.int32), ok
