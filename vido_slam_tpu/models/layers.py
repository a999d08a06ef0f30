"""Functional NN building blocks, NHWC, with torch-parity semantics.

All models in this package are pure functions over flat parameter dicts whose
keys EQUAL the reference torch checkpoints' state_dict keys (values stored in
TPU-friendly layouts: conv kernels HWIO). Loading a reference checkpoint is
then a pure layout transform (`convert_state_dict`) with no renaming logic —
the parity surface is explicit.

Conventions:
  conv2d          == torch.nn.Conv2d (cross-correlation, zero padding)
  deconv_grouped  == torch.nn.ConvTranspose2d(groups=C) via lhs-dilated conv
  batch_norm      == torch.nn.BatchNorm2d in eval mode
  max_pool / relu == the obvious ones
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, jnp.ndarray]


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,              # (kh, kw, cin/groups, cout) HWIO
    b: Optional[jnp.ndarray] = None,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    groups: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if x.dtype != w.dtype:
        # mixed-precision graphs (bf16 params, f32 activations from
        # precision-sensitive ops like ROIAlign) follow the weights' dtype
        x = x.astype(w.dtype)
    cin_pg = w.shape[2]
    if 1 < groups and 4 <= cin_pg < 128:
        out = _grouped_conv_supergroups(x, w, stride, padding, groups,
                                        dilation)
        if b is not None:
            out = out + b
        return out
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b
    return out


def _grouped_conv_supergroups(x, w, stride, padding, groups: int,
                              dilation: int) -> jnp.ndarray:
    """Narrow grouped conv as per-supergroup DENSE convs with block-diagonal
    kernels. Numerically equal to feature_group_count=groups (the off-block
    kernel entries are exact zeros).

    Narrow grouped convs (ResNeXt-32x8d: 32 groups of 8..64 channels) are
    catastrophic on the MXU: XLA lowers them with the per-group width as the
    minor dim, so 8 of 128 lanes do work (measured 9.9 ms for one 2-GFLOP
    stage-1 conv at 1088x800 — 6% MFU — plus ~2 ms of layout copies around
    it). Merging m groups into "supergroups" of >=128 channels and running
    each as a dense conv over a channel SLICE trades m x redundant FLOPs
    (zeros off the block diagonal) for full MXU lanes. Measured on the whole
    X-101 1088x800 forward (v5e): 92 ms grouped -> 34 ms block-diag with
    feature_group_count=G/m -> 16.7 ms in this slice+dense+concat form at
    43% MFU (XLA's grouped path stays slow even at 128-wide groups, so the
    groups are eliminated entirely)."""
    kh, kw, cin_pg, cout = w.shape
    cout_pg = cout // groups
    m = min(groups, max(1, 128 // min(cin_pg, cout_pg)))
    while groups % m:
        m -= 1
    g_eff = groups // m
    pads = [(padding[0], padding[0]), (padding[1], padding[1])]
    if m <= 1:
        return lax.conv_general_dilated(
            x, w, stride, pads, rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)
    w5 = w.reshape(kh, kw, cin_pg, groups, cout_pg)
    # (m, 1, m, 1) one-hot: output block j reads only input block j
    jj = jnp.arange(m)[:, None, None, None]
    gg = jnp.arange(m)[None, None, :, None]
    sel = (gg == jj).astype(w.dtype)
    outs = []
    for s in range(g_eff):
        blk = w5[:, :, :, s * m:(s + 1) * m, :]  # (kh,kw,cin_pg,m,cout_pg)
        wd = (blk[:, :, None, :, :, :] * sel).reshape(
            kh, kw, m * cin_pg, m * cout_pg)
        xs = x[..., s * m * cin_pg:(s + 1) * m * cin_pg]
        outs.append(lax.conv_general_dilated(
            xs, wd, stride, pads, rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    return outs[0] if g_eff == 1 else jnp.concatenate(outs, axis=-1)


def deconv_grouped(
    x: jnp.ndarray,
    w: jnp.ndarray,   # (kh, kw, 1, C) HWIO — depthwise transpose kernel
    stride: int = 2,
    padding: int = 1,
) -> jnp.ndarray:
    """torch.nn.ConvTranspose2d(C, C, k, stride, padding, groups=C, bias=False).

    Implemented as an lhs-dilated depthwise convolution with the kernel
    spatially flipped (transpose conv applies the kernel un-flipped, a
    correlation-style conv needs the flip)."""
    k = w.shape[0]
    wf = w[::-1, ::-1]
    pad = k - 1 - padding
    C = x.shape[-1]
    x = x.astype(wf.dtype) if x.dtype != wf.dtype else x  # dtype-follow
    return lax.conv_general_dilated(
        x,
        wf,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def batch_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    inv = gamma * lax.rsqrt(var + eps)
    return x * inv + (beta - mean * inv)


def group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """torch.nn.GroupNorm in NHWC (reference make_layers.py group_norm:
    GroupNorm(get_group_gn(C, -1, 32), C, eps=1e-5, affine) — defaults.py
    MODEL.GROUP_NORM.{NUM_GROUPS:32, EPSILON:1e-5}). Per sample, per group
    of C/G consecutive channels, normalise over (H, W, C/G); statistics in
    f32 regardless of activation dtype."""
    N, H, W, C = x.shape
    G = num_groups
    xg = x.reshape(N, H, W, G, C // G).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xn = (xg - mean) * lax.rsqrt(var + eps)
    xn = xn.reshape(N, H, W, C).astype(x.dtype)
    return xn * gamma + beta


def max_pool(x: jnp.ndarray, k: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def unfold_channels(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch.nn.functional.unfold on a single-channel NHWC map: returns
    (N, H, W, k*k) where channel (dy+r)*k+(dx+r) holds x[y+dy, x+dx]
    (zero padded), r = (k-1)//2 — matching unfold's row-major patch order."""
    assert x.shape[-1] == 1
    r = (k - 1) // 2
    N, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    taps = []
    for dy in range(k):
        for dx in range(k):
            taps.append(lax.dynamic_slice(xp, (0, dy, dx, 0), (N, H, W, 1))[..., 0])
    return jnp.stack(taps, axis=-1)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_tensor(key: str, t) -> np.ndarray:
    """torch tensor -> our layout. Conv weights OIHW -> HWIO; ConvTranspose
    weights IOHW (torch layout, with groups folded in O) -> HWIO."""
    a = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    if a.ndim == 4:
        # Conv2d OIHW -> HWIO. ConvTranspose2d is (in, out/groups, kh, kw);
        # the same transpose yields (kh, kw, out/groups, in), which is what
        # deconv_grouped/_dense_deconv2x consume.
        return a.transpose(2, 3, 1, 0)
    if a.ndim == 2 and key.endswith("weight"):
        return a.T  # torch Linear (out, in) -> (in, out) for x @ W
    return a


def convert_state_dict(sd: dict) -> Params:
    return {k: jnp.asarray(convert_tensor(k, v)) for k, v in sd.items()}
