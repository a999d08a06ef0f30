"""MonoDepth2 in pure-functional JAX (NHWC) — the reference's depth network
(src/thirdparty/mono_depth2/src/networks/{resnet_encoder.py,depth_decoder.py},
layers.py) rebuilt for TPU.

  - Encoder: torchvision ResNet18 trunk, features after relu / layer1..4
    (resnet_encoder.py:84-98), input normalised (x - 0.45) / 0.225;
  - Decoder: reflection-padded 3x3 convs + ELU, nearest x2 upsampling, skip
    concatenation, sigmoid disparity at scales 0..3 (depth_decoder.py:18-66,
    layers.py:106-136, 196-199);
  - service semantics: BGR -> RGB, /255, resize to 640x192, forward, resize
    disp 0 to the original size, min-max normalise to uint16 [0, 65536]
    (run_mono_depth.py:101-146) — the SLAM side then maps it to metric with
    scale*bf/(d/DepthMapFactor) (Tracking.cc:316-319).

Parameter keys equal the reference checkpoints: "encoder.<torchvision key>"
for the encoder, "decoder.<i>..." for the decoder ModuleList.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from vido_slam_tpu.models.layers import (
    Params,
    batch_norm,
    conv2d,
    max_pool,
    relu,
)

NUM_CH_ENC = [64, 64, 128, 256, 512]
NUM_CH_DEC = [16, 32, 64, 128, 256]
FEED_HEIGHT, FEED_WIDTH = 192, 640


def _bn(p: Params, prefix: str, x):
    return batch_norm(
        x,
        p[f"{prefix}.weight"],
        p[f"{prefix}.bias"],
        p[f"{prefix}.running_mean"],
        p[f"{prefix}.running_var"],
    )


def _basic_block(p: Params, prefix: str, x, stride: int):
    """torchvision BasicBlock: conv3x3-bn-relu-conv3x3-bn + skip."""
    identity = x
    out = conv2d(x, p[f"{prefix}.conv1.weight"], stride=stride, padding=1)
    out = relu(_bn(p, f"{prefix}.bn1", out))
    out = conv2d(out, p[f"{prefix}.conv2.weight"], padding=1)
    out = _bn(p, f"{prefix}.bn2", out)
    if f"{prefix}.downsample.0.weight" in p:
        identity = conv2d(x, p[f"{prefix}.downsample.0.weight"], stride=stride)
        identity = _bn(p, f"{prefix}.downsample.1", identity)
    return relu(out + identity)


def resnet18_features(p: Params, x: jnp.ndarray, prefix: str = "encoder") -> List[jnp.ndarray]:
    """Input (N, H, W, 3) RGB in [0,1]; returns the 5 multi-scale features."""
    x = (x - 0.45) / 0.225
    x = conv2d(x, p[f"{prefix}.conv1.weight"], stride=2, padding=3)
    x = relu(_bn(p, f"{prefix}.bn1", x))
    feats = [x]
    x = max_pool(x, 3, 2, 1)
    for li, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2), ("layer4", 2)):
        x = _basic_block(p, f"{prefix}.{li}.0", x, stride)
        x = _basic_block(p, f"{prefix}.{li}.1", x, 1)
        feats.append(x)
    return feats


def _reflect_pad(x: jnp.ndarray, n: int = 1) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (n, n), (n, n), (0, 0)), mode="reflect")


def _conv3x3_refl(p: Params, prefix: str, x) -> jnp.ndarray:
    return conv2d(_reflect_pad(x), p[f"{prefix}.weight"], p[f"{prefix}.bias"])


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, 2 * H, 2 * W, C), method="nearest")


def depth_decoder_forward(
    p: Params, feats: List[jnp.ndarray], prefix: str = "decoder"
) -> Dict[int, jnp.ndarray]:
    """Returns {scale: sigmoid disparity} for scales 0..3 (NHWC, 1ch).

    ModuleList ordering (depth_decoder.py:31-48): indices 0..9 are the
    ("upconv", i, j) ConvBlocks for i = 4..0, j = 0, 1; 10..13 are the
    dispconvs for scales 0..3. ConvBlock key: "<n>.conv.conv"; Conv3x3 key:
    "<n>.conv"."""
    outputs: Dict[int, jnp.ndarray] = {}
    x = feats[-1]
    for i in range(4, -1, -1):
        n0 = (4 - i) * 2
        x = jax.nn.elu(_conv3x3_refl(p, f"{prefix}.{n0}.conv.conv", x))
        x = _upsample2(x)
        if i > 0:
            x = jnp.concatenate([x, feats[i - 1]], axis=-1)
        x = jax.nn.elu(_conv3x3_refl(p, f"{prefix}.{n0 + 1}.conv.conv", x))
        if i <= 3:
            d = _conv3x3_refl(p, f"{prefix}.{10 + i}.conv", x)
            outputs[i] = jax.nn.sigmoid(d)
    return outputs


@jax.jit
def monodepth2_disp(params: Params, image: jnp.ndarray) -> jnp.ndarray:
    """image (N, 192, 640, 3) RGB [0,1] -> disparity (N, 192, 640, 1)."""
    feats = resnet18_features(params, image)
    return depth_decoder_forward(params, feats)[0]


def disp_to_uint16_depth(disp: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize disp to original size and min-max normalise to [0, 65536]
    (run_mono_depth.py:137-146, cv2.NORM_MINMAX beta=65536)."""
    up = jax.image.resize(
        disp, (disp.shape[0], out_h, out_w, 1), method="bilinear"
    )[..., 0]
    lo = jnp.min(up, axis=(1, 2), keepdims=True)
    hi = jnp.max(up, axis=(1, 2), keepdims=True)
    norm = (up - lo) / jnp.maximum(hi - lo, 1e-12) * 65536.0
    return norm


def disp_to_depth(disp: jnp.ndarray, min_depth: float = 0.1, max_depth: float = 100.0):
    """monodepth2 layers.py:16-25."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled = min_disp + (max_disp - min_disp) * disp
    return scaled, 1.0 / scaled


# ---------------------------------------------------------------------------
# parameter initialisation (checkpoint key layout)
# ---------------------------------------------------------------------------

def init_monodepth2_params(key) -> Params:
    p: Dict[str, jnp.ndarray] = {}
    keys = iter(jax.random.split(key, 200))

    def add_conv(name, cin, cout, k, bias=False):
        fan = cin * k * k
        p[name + ".weight"] = (
            jax.random.normal(next(keys), (k, k, cin, cout)) / jnp.sqrt(fan)
        )
        if bias:
            p[name + ".bias"] = jnp.zeros(cout)

    def add_bn(name, c):
        p[name + ".weight"] = jnp.ones(c)
        p[name + ".bias"] = jnp.zeros(c)
        p[name + ".running_mean"] = jnp.zeros(c)
        p[name + ".running_var"] = jnp.ones(c)

    add_conv("encoder.conv1", 3, 64, 7)
    add_bn("encoder.bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for li in range(1, 5):
        cin, cout = chans[li - 1], chans[li]
        for blk in range(2):
            pre = f"encoder.layer{li}.{blk}"
            c_in = cin if blk == 0 else cout
            add_conv(f"{pre}.conv1", c_in, cout, 3)
            add_bn(f"{pre}.bn1", cout)
            add_conv(f"{pre}.conv2", cout, cout, 3)
            add_bn(f"{pre}.bn2", cout)
            if blk == 0 and cin != cout:
                add_conv(f"{pre}.downsample.0", cin, cout, 1)
                add_bn(f"{pre}.downsample.1", cout)

    for i in range(4, -1, -1):
        n0 = (4 - i) * 2
        cin = NUM_CH_ENC[-1] if i == 4 else NUM_CH_DEC[i + 1]
        add_conv(f"decoder.{n0}.conv.conv", cin, NUM_CH_DEC[i], 3, bias=True)
        cin1 = NUM_CH_DEC[i] + (NUM_CH_ENC[i - 1] if i > 0 else 0)
        add_conv(f"decoder.{n0 + 1}.conv.conv", cin1, NUM_CH_DEC[i], 3, bias=True)
    for s in range(4):
        add_conv(f"decoder.{10 + s}.conv", NUM_CH_DEC[s], 1, 3, bias=True)
    return p


# ---------------------------------------------------------------------------
# Pose networks (reference src/thirdparty/mono_depth2/src/networks/
# pose_decoder.py, pose_cnn.py — the self-supervised training heads; kept for
# model-family parity and for fine-tuning support)
# ---------------------------------------------------------------------------

def pose_decoder_forward(
    p: Params, feats_last: List[jnp.ndarray], prefix: str = "pose_decoder",
    num_frames: int = 1,
):
    """PoseDecoder (pose_decoder.py:14-54): squeeze each input's last
    feature with a 1x1 conv + relu, concat, 3 convs, global mean ->
    0.01-scaled (axisangle, translation). feats_last: list of (N, h, w, C)."""
    from vido_slam_tpu.models.layers import relu as _relu

    cat = [
        _relu(conv2d(f, p[f"{prefix}.convs.squeeze.weight"],
                     p[f"{prefix}.convs.squeeze.bias"]))
        for f in feats_last
    ]
    out = jnp.concatenate(cat, axis=-1)
    for i in range(3):
        w = p[f"{prefix}.convs.pose.{i}.weight"]
        b = p[f"{prefix}.convs.pose.{i}.bias"]
        pad = 1 if w.shape[0] == 3 else 0
        out = conv2d(out, w, b, padding=pad)
        if i != 2:
            out = _relu(out)
    out = jnp.mean(out, axis=(1, 2))  # (N, 6*num_frames)
    out = 0.01 * out.reshape(out.shape[0], num_frames, 1, 6)
    return out[..., :3], out[..., 3:]


def pose_cnn_forward(p: Params, x: jnp.ndarray, prefix: str = "pose_cnn",
                     num_input_frames: int = 2):
    """PoseCNN (pose_cnn.py:14-50): 7-conv strided trunk over concatenated
    frames -> 0.01-scaled (axisangle, translation)."""
    from vido_slam_tpu.models.layers import relu as _relu

    specs = [(7, 2, 3), (5, 2, 2)] + [(3, 2, 1)] * 5
    for i, (k, s, pd) in enumerate(specs):
        x = _relu(conv2d(x, p[f"{prefix}.convs.{i}.weight"],
                         p[f"{prefix}.convs.{i}.bias"], stride=s, padding=pd))
    x = conv2d(x, p[f"{prefix}.pose_conv.weight"], p[f"{prefix}.pose_conv.bias"])
    out = jnp.mean(x, axis=(1, 2))
    nf = num_input_frames - 1
    out = 0.01 * out.reshape(out.shape[0], nf, 1, 6)
    return out[..., :3], out[..., 3:]


def init_pose_decoder_params(key, num_input_features: int = 1,
                             num_frames: int = 1,
                             prefix: str = "pose_decoder") -> Params:
    p: Dict[str, jnp.ndarray] = {}
    keys = iter(jax.random.split(key, 10))

    def add(name, cin, cout, k):
        p[f"{prefix}.{name}.weight"] = (
            jax.random.normal(next(keys), (k, k, cin, cout))
            / jnp.sqrt(cin * k * k)
        )
        p[f"{prefix}.{name}.bias"] = jnp.zeros(cout)

    add("convs.squeeze", NUM_CH_ENC[-1], 256, 1)
    add("convs.pose.0", num_input_features * 256, 256, 3)
    add("convs.pose.1", 256, 256, 3)
    add("convs.pose.2", 256, 6 * num_frames, 1)
    return p


def init_pose_cnn_params(key, num_input_frames: int = 2,
                         prefix: str = "pose_cnn") -> Params:
    p: Dict[str, jnp.ndarray] = {}
    keys = iter(jax.random.split(key, 10))
    chans = [3 * num_input_frames, 16, 32, 64, 128, 256, 256, 256]
    ks = [7, 5, 3, 3, 3, 3, 3]

    def add(name, cin, cout, k):
        p[f"{prefix}.{name}.weight"] = (
            jax.random.normal(next(keys), (k, k, cin, cout))
            / jnp.sqrt(cin * k * k)
        )
        p[f"{prefix}.{name}.bias"] = jnp.zeros(cout)

    for i in range(7):
        add(f"convs.{i}", chans[i], chans[i + 1], ks[i])
    add("pose_conv", 256, 6 * (num_input_frames - 1), 1)
    return p
