import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from vido_slam_tpu.models.layers import convert_state_dict
from vido_slam_tpu.models.monodepth2 import (
    depth_decoder_forward,
    disp_to_depth,
    disp_to_uint16_depth,
    init_monodepth2_params,
    monodepth2_disp,
    resnet18_features,
)


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


class TorchBasicBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


def randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)


class TestEncoderBlocks:
    def test_basic_block_parity(self):
        torch.manual_seed(0)
        m = TorchBasicBlock(64, 128, 2)
        randomize_bn(m)
        m.eval()
        x = torch.randn(1, 64, 16, 16)
        with torch.no_grad():
            want = to_nhwc(m(x))
        sd = {f"encoder.layer2.0.{k}": v for k, v in m.state_dict().items()}
        p = convert_state_dict(sd)
        from vido_slam_tpu.models.monodepth2 import _basic_block

        got = _basic_block(p, "encoder.layer2.0", jnp.asarray(to_nhwc(x)), 2)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_reflect_conv3x3_parity(self):
        torch.manual_seed(1)
        conv = torch.nn.Conv2d(8, 4, 3)
        pad = torch.nn.ReflectionPad2d(1)
        x = torch.randn(1, 8, 10, 12)
        with torch.no_grad():
            want = to_nhwc(conv(pad(x)))
        p = convert_state_dict({"decoder.10.conv." + k: v for k, v in conv.state_dict().items()})
        from vido_slam_tpu.models.monodepth2 import _conv3x3_refl

        got = _conv3x3_refl(p, "decoder.10.conv", jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestFullModel:
    def test_forward_shapes(self):
        p = init_monodepth2_params(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 160, 3))
        feats = resnet18_features(p, x)
        assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]
        assert feats[0].shape[1:3] == (48, 80)
        assert feats[4].shape[1:3] == (3, 5)
        disps = depth_decoder_forward(p, feats)
        assert set(disps.keys()) == {0, 1, 2, 3}
        assert disps[0].shape == (1, 96, 160, 1)
        assert disps[3].shape == (1, 12, 20, 1)
        assert bool(jnp.all((disps[0] >= 0) & (disps[0] <= 1)))

    def test_jit_entry(self):
        p = init_monodepth2_params(jax.random.PRNGKey(2))
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
        d = monodepth2_disp(p, x)
        assert d.shape == (1, 64, 64, 1)
        assert bool(jnp.all(jnp.isfinite(d)))

    def test_uint16_normalisation(self):
        disp = jnp.linspace(0.2, 0.8, 12).reshape(1, 3, 4, 1)
        out = disp_to_uint16_depth(disp, 6, 8)
        assert out.shape == (1, 6, 8)
        np.testing.assert_allclose(float(jnp.min(out)), 0.0, atol=1e-3)
        np.testing.assert_allclose(float(jnp.max(out)), 65536.0, rtol=1e-5)

    def test_disp_to_depth(self):
        scaled, depth = disp_to_depth(jnp.array([0.0, 1.0]), 0.1, 100.0)
        np.testing.assert_allclose(np.asarray(depth), [100.0, 0.1], rtol=1e-5)

pytestmark = pytest.mark.slow  # heavy jit: full tier only
