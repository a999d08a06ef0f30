"""ResNet/ResNeXt + FPN backbone — maskrcnn_benchmark's conv body
(reference src/thirdparty/mask_rcnn/maskrcnn_benchmark/modeling/backbone/
{resnet.py,fpn.py}) in pure-functional JAX, NHWC.

Bottleneck layout follows the checkpoint configs: optional grouped 3x3
(ResNeXt NUM_GROUPS=32, WIDTH_PER_GROUP=8), stride placement controlled by
STRIDE_IN_1X1, FrozenBatchNorm everywhere (inference statistics only).
FPN: 1x1 inner lateral + top-down nearest upsample + 3x3 output convs, plus
LastLevelMaxPool P6 (fpn.py:60-66).

Parameter keys equal maskrcnn_benchmark state_dict names
("backbone.body.stem.conv1.weight", "backbone.fpn.fpn_inner1.weight", ...).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp

from vido_slam_tpu.models.layers import (
    Params,
    batch_norm,
    conv2d,
    group_norm,
    max_pool,
    relu,
)


class ResNetConfig(NamedTuple):
    stage_blocks: tuple = (3, 4, 6, 3)   # R-50; R-101: (3, 4, 23, 3)
    num_groups: int = 1                  # X-101: 32
    width_per_group: int = 64            # X-101: 8
    stride_in_1x1: bool = True           # caffe2 R-50: True; X-101 cfg: False
    out_channels: int = 256              # FPN channels
    # per-stage deformable conv2 (MODEL.RESNETS.STAGE_WITH_DCN,
    # config/defaults.py:287; resnet.py:110-122 routes conv2 through
    # layers/misc.py:114 DFConv2d when set)
    stage_with_dcn: tuple = (False, False, False, False)
    with_modulated_dcn: bool = False     # DCNv2 (27-ch offset+mask conv)
    # norm trans-func: "frozen_bn" (BottleneckWithFixedBatchNorm, the
    # deployed caffe2 checkpoints) or "gn" (BottleneckWithGN / StemWithGN,
    # resnet.py:401-438 — GroupNorm(32, C, eps=1e-5), the loadable target
    # of c2_loading's GN rename rules)
    norm: str = "frozen_bn"


def _bn(p: Params, prefix: str, x, norm: str = "frozen_bn"):
    if norm == "gn":
        return group_norm(x, p[f"{prefix}.weight"], p[f"{prefix}.bias"])
    # FrozenBatchNorm2d (layers/batch_norm.py:28): scale = w * var.rsqrt()
    # with NO epsilon — eps=1e-5 here would break checkpoint parity on
    # small-variance channels
    return batch_norm(
        x, p[f"{prefix}.weight"], p[f"{prefix}.bias"],
        p[f"{prefix}.running_mean"], p[f"{prefix}.running_var"], eps=0.0,
    )


def _dcn_conv2(p: Params, prefix: str, x, stride: int, groups: int,
               modulated: bool):
    """DFConv2d (layers/misc.py:114-190): a plain offset conv feeding the
    deformable 3x3. Modulated (DCNv2) packs [18 offsets | 9 mask logits]
    into one 27-channel conv; the mask is sigmoided (misc.py:185-188)."""
    from vido_slam_tpu.ops.deform_conv import deform_conv2d

    om = conv2d(x, p[f"{prefix}.conv2.offset.weight"],
                p[f"{prefix}.conv2.offset.bias"], stride=stride, padding=1)
    if modulated:
        offsets, mask = om[..., :18], jax.nn.sigmoid(om[..., 18:27])
    else:
        offsets, mask = om, None
    return deform_conv2d(x, offsets, p[f"{prefix}.conv2.conv.weight"],
                         stride=stride, padding=1, mask=mask, groups=groups)


def _bottleneck(p: Params, prefix: str, x, stride: int, groups: int,
                stride_in_1x1: bool, dcn: bool = False,
                modulated_dcn: bool = False, norm: str = "frozen_bn"):
    s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
    identity = x
    out = relu(_bn(p, f"{prefix}.bn1",
                   conv2d(x, p[f"{prefix}.conv1.weight"], stride=s1), norm))
    if dcn:
        conv2_out = _dcn_conv2(p, prefix, out, s3, groups, modulated_dcn)
    else:
        conv2_out = conv2d(out, p[f"{prefix}.conv2.weight"], stride=s3,
                           padding=1, groups=groups)
    out = relu(_bn(p, f"{prefix}.bn2", conv2_out, norm))
    out = _bn(p, f"{prefix}.bn3", conv2d(out, p[f"{prefix}.conv3.weight"]),
              norm)
    if f"{prefix}.downsample.0.weight" in p:
        identity = _bn(p, f"{prefix}.downsample.1",
                       conv2d(x, p[f"{prefix}.downsample.0.weight"], stride=stride),
                       norm)
    return relu(out + identity)


def resnet_stages(p: Params, x: jnp.ndarray, cfg: ResNetConfig,
                  prefix: str = "backbone.body") -> List[jnp.ndarray]:
    """Input NHWC (already normalised); returns [C2, C3, C4, C5]."""
    x = conv2d(x, p[f"{prefix}.stem.conv1.weight"], stride=2, padding=3)
    x = relu(_bn(p, f"{prefix}.stem.bn1", x, cfg.norm))
    x = max_pool(x, 3, 2, 1)
    feats = []
    for si, nblocks in enumerate(cfg.stage_blocks):
        stride = 1 if si == 0 else 2
        for b in range(nblocks):
            x = _bottleneck(
                p, f"{prefix}.layer{si + 1}.{b}", x,
                stride if b == 0 else 1, cfg.num_groups, cfg.stride_in_1x1,
                dcn=cfg.stage_with_dcn[si],
                modulated_dcn=cfg.with_modulated_dcn,
                norm=cfg.norm,
            )
        feats.append(x)
    return feats


def fpn_forward(p: Params, feats: List[jnp.ndarray],
                prefix: str = "backbone.fpn") -> List[jnp.ndarray]:
    """[C2..C5] -> [P2, P3, P4, P5, P6]."""
    last_inner = conv2d(feats[3], p[f"{prefix}.fpn_inner4.weight"],
                        p[f"{prefix}.fpn_inner4.bias"])
    results = [conv2d(last_inner, p[f"{prefix}.fpn_layer4.weight"],
                      p[f"{prefix}.fpn_layer4.bias"], padding=1)]
    for i in (3, 2, 1):
        inner = conv2d(feats[i - 1], p[f"{prefix}.fpn_inner{i}.weight"],
                       p[f"{prefix}.fpn_inner{i}.bias"])
        N, H, W, C = inner.shape
        top_down = jax.image.resize(
            last_inner, (N, H, W, C), method="nearest"
        )
        last_inner = inner + top_down
        results.insert(0, conv2d(last_inner, p[f"{prefix}.fpn_layer{i}.weight"],
                                 p[f"{prefix}.fpn_layer{i}.bias"], padding=1))
    # LastLevelMaxPool: kernel 1, stride 2
    p6 = results[-1][:, ::2, ::2, :]
    return results + [p6]


# ---------------------------------------------------------------------------

def init_resnet_fpn_params(key, cfg: ResNetConfig) -> Params:
    p: Dict[str, jnp.ndarray] = {}
    keys = iter(jax.random.split(key, 600))

    def add_conv(name, cin, cout, k, bias=False, groups=1):
        fan = cin // groups * k * k
        p[name + ".weight"] = (
            jax.random.normal(next(keys), (k, k, cin // groups, cout))
            / jnp.sqrt(fan)
        )
        if bias:
            p[name + ".bias"] = jnp.zeros(cout)

    def add_bn(name, c):
        p[name + ".weight"] = jnp.ones(c)
        p[name + ".bias"] = jnp.zeros(c)
        if cfg.norm != "gn":   # GroupNorm has no running statistics
            p[name + ".running_mean"] = jnp.zeros(c)
            p[name + ".running_var"] = jnp.ones(c)

    pre = "backbone.body"
    add_conv(f"{pre}.stem.conv1", 3, 64, 7)
    add_bn(f"{pre}.stem.bn1", 64)
    cin = 64
    width = cfg.num_groups * cfg.width_per_group
    for si, nblocks in enumerate(cfg.stage_blocks):
        planes = width * (2 ** si)
        cout = 256 * (2 ** si)
        for b in range(nblocks):
            q = f"{pre}.layer{si + 1}.{b}"
            add_conv(f"{q}.conv1", cin if b == 0 else cout, planes, 1)
            add_bn(f"{q}.bn1", planes)
            if cfg.stage_with_dcn[si]:
                # DFConv2d: zero-init offset conv (misc.py:161-163 inits
                # the weight, bias zero; zero offsets make the block start
                # as a plain conv) + the deformable 3x3 itself
                oc = 27 if cfg.with_modulated_dcn else 18
                p[f"{q}.conv2.offset.weight"] = jnp.zeros((3, 3, planes, oc))
                p[f"{q}.conv2.offset.bias"] = jnp.zeros(oc)
                add_conv(f"{q}.conv2.conv", planes, planes, 3,
                         groups=cfg.num_groups)
            else:
                add_conv(f"{q}.conv2", planes, planes, 3,
                         groups=cfg.num_groups)
            add_bn(f"{q}.bn2", planes)
            add_conv(f"{q}.conv3", planes, cout, 1)
            add_bn(f"{q}.bn3", cout)
            if b == 0:
                add_conv(f"{q}.downsample.0", cin, cout, 1)
                add_bn(f"{q}.downsample.1", cout)
        cin = cout
    for i, c in enumerate([256, 512, 1024, 2048], start=1):
        add_conv(f"backbone.fpn.fpn_inner{i}", c, cfg.out_channels, 1, bias=True)
        add_conv(f"backbone.fpn.fpn_layer{i}", cfg.out_channels, cfg.out_channels, 3, bias=True)
    return p
