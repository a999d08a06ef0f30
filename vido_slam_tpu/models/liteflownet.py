"""LiteFlowNet in pure-functional JAX (NHWC) — the reference's optical-flow
network (src/thirdparty/flow_net/src/layers.py:38-315) rebuilt for TPU.

Architecture (parameters keyed exactly like the torch checkpoint
`network-default.pytorch`):
  - Features: 6-level conv encoder 3->32->32->64->96->128->192, stride-2
    between levels, LeakyReLU(0.1) (layers.py:44-97);
  - per level L in [6..2]: Matching (cost volume via correlation — stride 2
    + learned 49-group deconv upsampling below level 4 — then 4 convs to a
    2-ch flow delta), Subpixel (feature-concat refinement), Regularization
    (feature-driven distance weights normalising an unfolded flow
    neighbourhood) (layers.py:99-272);
  - final flow scaled by 20 (layers.py:313); per-image mean subtraction
    constants (layers.py:286-292).

The cost volume runs the Pallas TPU kernel when available (ops/correlation).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp

from vido_slam_tpu.models.layers import (
    Params,
    conv2d,
    deconv_grouped,
    leaky_relu,
    unfold_channels,
)
from vido_slam_tpu.ops.correlation import correlation, correlation_pallas
from vido_slam_tpu.ops.regularize import dist_weighted_flow_pallas
from vido_slam_tpu.ops.warp import backwarp, resize_bilinear

# per-level constants (index by level 2..6): layers.py
FLT_BACKWARP = [0.0, 0.0, 10.0, 5.0, 2.5, 1.25, 0.625]
MAIN_KERNEL = [0, 0, 7, 5, 5, 3, 3]
MAIN_PAD = [0, 0, 3, 2, 2, 1, 1]
SUBPIX_CIN = [0, 0, 130, 130, 194, 258, 386]
REG_FEAT_CIN = [0, 0, 32, 64, 96, 128, 192]
REG_MAIN_CIN = [0, 0, 131, 131, 131, 131, 195]
REG_DIST_CH = [0, 0, 49, 25, 25, 9, 9]
MEAN_FIRST = (0.411618, 0.434631, 0.454253)
MEAN_SECOND = (0.410782, 0.433645, 0.452793)

# module list order: netMatching[i] has level LEVELS[i]
LEVELS = [2, 3, 4, 5, 6]


def _seq_conv(p: Params, prefix: str, x: jnp.ndarray, idxs, strides, pads,
              lrelu_after=None) -> jnp.ndarray:
    """Run a torch nn.Sequential of Conv2d(+LeakyReLU) given layer indices."""
    if lrelu_after is None:
        lrelu_after = [True] * len(idxs)
    for i, (li, st, pd) in enumerate(zip(idxs, strides, pads)):
        w = p[f"{prefix}.{li}.weight"]
        b = p.get(f"{prefix}.{li}.bias")
        x = conv2d(x, w, b, stride=st, padding=pd)
        if lrelu_after[i]:
            x = leaky_relu(x)
    return x


def features_forward(p: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    one = _seq_conv(p, "netFeatures.netOne", x, [0], [1], [3])
    two = _seq_conv(p, "netFeatures.netTwo", one, [0, 2, 4], [2, 1, 1], [1, 1, 1])
    thr = _seq_conv(p, "netFeatures.netThr", two, [0, 2], [2, 1], [1, 1])
    fou = _seq_conv(p, "netFeatures.netFou", thr, [0, 2], [2, 1], [1, 1])
    fiv = _seq_conv(p, "netFeatures.netFiv", fou, [0], [2], [1])
    six = _seq_conv(p, "netFeatures.netSix", fiv, [0], [2], [1])
    return [one, two, thr, fou, fiv, six]


def _feat_1x1(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """Optional 1x1 feature adapter (only present at level 2)."""
    if f"{prefix}.0.weight" in p:
        return leaky_relu(conv2d(x, p[f"{prefix}.0.weight"], p[f"{prefix}.0.bias"]))
    return x


def matching_forward(p: Params, mi: int, level: int, f1, f2, feat1, feat2,
                     flow, use_pallas: bool):
    pre = f"netMatching.{mi}"
    feat1 = _feat_1x1(p, f"{pre}.netFeat", feat1)
    feat2 = _feat_1x1(p, f"{pre}.netFeat", feat2)
    if flow is not None:
        flow = deconv_grouped(flow, p[f"{pre}.netUpflow.weight"])
        feat2 = backwarp(feat2, flow * FLT_BACKWARP[level])
    corr_fn = correlation_pallas if use_pallas else correlation
    if level >= 4:
        corr = leaky_relu(corr_fn(feat1, feat2, 1))
    else:
        corr = leaky_relu(corr_fn(feat1, feat2, 2))
        corr = deconv_grouped(corr, p[f"{pre}.netUpcorr.weight"])
    k, pd = MAIN_KERNEL[level], MAIN_PAD[level]
    delta = _seq_conv(
        p, f"{pre}.netMain", corr, [0, 2, 4, 6], [1, 1, 1, 1], [1, 1, 1, pd],
        lrelu_after=[True, True, True, False],
    )
    return delta if flow is None else flow + delta


def subpixel_forward(p: Params, mi: int, level: int, f1, f2, feat1, feat2, flow):
    pre = f"netSubpixel.{mi}"
    feat1 = _feat_1x1(p, f"{pre}.netFeat", feat1)
    feat2 = _feat_1x1(p, f"{pre}.netFeat", feat2)
    feat2 = backwarp(feat2, flow * FLT_BACKWARP[level])
    x = jnp.concatenate([feat1, feat2, flow], axis=-1)
    pd = MAIN_PAD[level]
    delta = _seq_conv(
        p, f"{pre}.netMain", x, [0, 2, 4, 6], [1, 1, 1, 1], [1, 1, 1, pd],
        lrelu_after=[True, True, True, False],
    )
    return flow + delta


def regularization_forward(p: Params, mi: int, level: int, f1, f2, feat1,
                           feat2, flow, use_pallas: bool = False):
    pre = f"netRegularization.{mi}"
    k = MAIN_KERNEL[level]      # unfold window
    r = MAIN_PAD[level]

    diff = f1 - backwarp(f2, flow * FLT_BACKWARP[level])
    diff = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True))

    # image-wide mean reduces over ~3e4 px: accumulate in f32 even when the
    # net runs bf16
    flow_mean = jnp.mean(
        flow.astype(jnp.float32), axis=(1, 2), keepdims=True
    ).astype(flow.dtype)
    feat = _feat_1x1(p, f"{pre}.netFeat", feat1)
    x = jnp.concatenate([diff, flow - flow_mean, feat], axis=-1)
    x = _seq_conv(
        p, f"{pre}.netMain", x, [0, 2, 4, 6, 8, 10], [1] * 6, [1] * 6,
    )
    if f"{pre}.netDist.1.weight" in p:
        # separable kx1 then 1xk (levels < 5)
        d = conv2d(x, p[f"{pre}.netDist.0.weight"], p[f"{pre}.netDist.0.bias"],
                   padding=(r, 0))
        d = conv2d(d, p[f"{pre}.netDist.1.weight"], p[f"{pre}.netDist.1.bias"],
                   padding=(0, r))
    else:
        d = conv2d(x, p[f"{pre}.netDist.0.weight"], p[f"{pre}.netDist.0.bias"],
                   padding=r)
    wx = p[f"{pre}.netScaleX.weight"].reshape(-1)   # (1,1,K,1) 1x1 conv
    bx = p[f"{pre}.netScaleX.bias"].reshape(())
    wy = p[f"{pre}.netScaleY.weight"].reshape(-1)
    by = p[f"{pre}.netScaleY.bias"].reshape(())
    if use_pallas:
        # fused exp-normalize + unfold + weighted window-sum: one kernel
        # instead of ~12 ops with two (H, W, k^2) unfold materialisations
        # (ops/regularize.py)
        sx, sy = dist_weighted_flow_pallas(
            d, flow[..., 0], flow[..., 1], wx, bx, wy, by, k)
        return jnp.stack([sx, sy], axis=-1)
    d = -(d * d)
    d = jnp.exp(d - jnp.max(d, axis=-1, keepdims=True))
    divisor = 1.0 / jnp.sum(d, axis=-1, keepdims=True)

    ufx = unfold_channels(flow[..., 0:1], k)
    ufy = unfold_channels(flow[..., 1:2], k)
    sx = conv2d(d * ufx, p[f"{pre}.netScaleX.weight"], p[f"{pre}.netScaleX.bias"]) * divisor
    sy = conv2d(d * ufy, p[f"{pre}.netScaleY.weight"], p[f"{pre}.netScaleY.bias"]) * divisor
    return jnp.concatenate([sx, sy], axis=-1)


@partial(jax.jit, static_argnames=("use_pallas",))
def liteflownet_forward(
    params: Params, first: jnp.ndarray, second: jnp.ndarray,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """first/second: (N, H, W, 3) RGB in [0, 1], H and W multiples of 32.
    Returns flow (N, H/2, W/2, 2) scaled x20 (layers.py:313) — the caller
    resizes/rescales to full resolution (run_flow_net.py:87-107).

    Compute dtype follows the params dtype (bf16 params run the whole
    pyramid in bf16 — correlation and warp coords still accumulate in f32);
    the returned flow is always f32."""
    dt = jax.tree_util.tree_leaves(params)[0].dtype
    first = first.astype(dt) - jnp.asarray(MEAN_FIRST, dt)
    second = second.astype(dt) - jnp.asarray(MEAN_SECOND, dt)

    # NOTE: stacking the two images on the batch axis to run the encoder
    # once was measured SLOWER (6.39 -> 6.81 ms/run device time): the
    # full-res concat + per-level splits cost more bandwidth than the
    # second pass's op overhead saves. Keep two encoder passes.
    feats1 = features_forward(params, first)
    feats2 = features_forward(params, second)

    im1 = [first]
    im2 = [second]
    for lvl in range(1, 6):
        h, w = feats1[lvl].shape[1], feats1[lvl].shape[2]
        im1.append(resize_bilinear(im1[-1], h, w))
        im2.append(resize_bilinear(im2[-1], h, w))

    flow = None
    for mi in [4, 3, 2, 1, 0]:  # levels 6, 5, 4, 3, 2
        level = LEVELS[mi]
        li = level - 1  # index into feats/im lists (level L -> list index L-1)
        a = (im1[li], im2[li], feats1[li], feats2[li])
        flow = matching_forward(params, mi, level, *a, flow, use_pallas)
        flow = subpixel_forward(params, mi, level, *a, flow)
        flow = regularization_forward(params, mi, level, *a, flow,
                                      use_pallas=use_pallas)
    return flow.astype(jnp.float32) * 20.0


def flow_full_resolution(flow: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Upsample the half-res network flow to (out_h, out_w) with u/v rescale
    (run_flow_net.py:96-106)."""
    h, w = flow.shape[1], flow.shape[2]
    up = resize_bilinear(flow, out_h, out_w)
    scale = jnp.asarray([out_w / w, out_h / h], dtype=flow.dtype)
    return up * scale


# ---------------------------------------------------------------------------
# parameter initialisation (matching checkpoint key layout)
# ---------------------------------------------------------------------------

def _conv_p(key, cin, cout, k):
    k1, k2 = jax.random.split(key)
    if isinstance(k, int):
        k = (k, k)
    fan_in = cin * k[0] * k[1]
    w = jax.random.normal(k1, (k[0], k[1], cin, cout)) / jnp.sqrt(fan_in)
    b = jnp.zeros(cout)
    return w, b


def init_liteflownet_params(key) -> Params:
    """Random parameters with the exact checkpoint key layout/shapes."""
    p: Dict[str, jnp.ndarray] = {}
    keys = iter(jax.random.split(key, 400))

    def add_conv(name, cin, cout, k, bias=True):
        w, b = _conv_p(next(keys), cin, cout, k)
        p[name + ".weight"] = w
        if bias:
            p[name + ".bias"] = b

    # Features
    add_conv("netFeatures.netOne.0", 3, 32, 7)
    add_conv("netFeatures.netTwo.0", 32, 32, 3)
    add_conv("netFeatures.netTwo.2", 32, 32, 3)
    add_conv("netFeatures.netTwo.4", 32, 32, 3)
    add_conv("netFeatures.netThr.0", 32, 64, 3)
    add_conv("netFeatures.netThr.2", 64, 64, 3)
    add_conv("netFeatures.netFou.0", 64, 96, 3)
    add_conv("netFeatures.netFou.2", 96, 96, 3)
    add_conv("netFeatures.netFiv.0", 96, 128, 3)
    add_conv("netFeatures.netSix.0", 128, 192, 3)

    feat_ch = {2: 32, 3: 64, 4: 96, 5: 128, 6: 192}
    for mi, level in enumerate(LEVELS):
        corr_in = 49
        mk = MAIN_KERNEL[level]
        # Matching
        if level == 2:
            add_conv(f"netMatching.{mi}.netFeat.0", 32, 64, 1)
            add_conv(f"netSubpixel.{mi}.netFeat.0", 32, 64, 1)
        if level != 6:
            p[f"netMatching.{mi}.netUpflow.weight"] = jnp.ones((4, 4, 1, 2)) * 0.25
        if level < 4:
            p[f"netMatching.{mi}.netUpcorr.weight"] = jnp.ones((4, 4, 1, 49)) * 0.25
        add_conv(f"netMatching.{mi}.netMain.0", corr_in, 128, 3)
        add_conv(f"netMatching.{mi}.netMain.2", 128, 64, 3)
        add_conv(f"netMatching.{mi}.netMain.4", 64, 32, 3)
        add_conv(f"netMatching.{mi}.netMain.6", 32, 2, mk)
        # Subpixel
        add_conv(f"netSubpixel.{mi}.netMain.0", SUBPIX_CIN[level], 128, 3)
        add_conv(f"netSubpixel.{mi}.netMain.2", 128, 64, 3)
        add_conv(f"netSubpixel.{mi}.netMain.4", 64, 32, 3)
        add_conv(f"netSubpixel.{mi}.netMain.6", 32, 2, mk)
        # Regularization
        if level < 5:
            add_conv(f"netRegularization.{mi}.netFeat.0", REG_FEAT_CIN[level], 128, 1)
        add_conv(f"netRegularization.{mi}.netMain.0", REG_MAIN_CIN[level], 128, 3)
        add_conv(f"netRegularization.{mi}.netMain.2", 128, 128, 3)
        add_conv(f"netRegularization.{mi}.netMain.4", 128, 64, 3)
        add_conv(f"netRegularization.{mi}.netMain.6", 64, 64, 3)
        add_conv(f"netRegularization.{mi}.netMain.8", 64, 32, 3)
        add_conv(f"netRegularization.{mi}.netMain.10", 32, 32, 3)
        dch = REG_DIST_CH[level]
        if level >= 5:
            add_conv(f"netRegularization.{mi}.netDist.0", 32, dch, mk)
        else:
            add_conv(f"netRegularization.{mi}.netDist.0", 32, dch, (mk, 1))
            add_conv(f"netRegularization.{mi}.netDist.1", dch, dch, (1, mk))
        add_conv(f"netRegularization.{mi}.netScaleX", dch, 1, 1)
        add_conv(f"netRegularization.{mi}.netScaleY", dch, 1, 1)
    return p
