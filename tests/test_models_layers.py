import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vido_slam_tpu.models.layers import (
    batch_norm,
    conv2d,
    convert_state_dict,
    deconv_grouped,
    leaky_relu,
    max_pool,
    unfold_channels,
)


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def to_nchw(a):
    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2))


class TestConv:
    @pytest.mark.parametrize("stride,pad,k", [(1, 1, 3), (2, 1, 3), (1, 3, 7), (1, 0, 1)])
    def test_matches_torch(self, stride, pad, k):
        torch.manual_seed(0)
        m = torch.nn.Conv2d(5, 8, k, stride=stride, padding=pad)
        x = torch.randn(2, 5, 12, 14)
        want = to_nhwc(m(x))
        p = convert_state_dict(m.state_dict())
        got = conv2d(jnp.asarray(to_nhwc(x)), p["weight"], p["bias"],
                     stride=stride, padding=pad)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_grouped(self):
        torch.manual_seed(1)
        m = torch.nn.Conv2d(8, 8, 3, padding=1, groups=4)
        x = torch.randn(1, 8, 6, 6)
        want = to_nhwc(m(x))
        p = convert_state_dict(m.state_dict())
        got = conv2d(jnp.asarray(to_nhwc(x)), p["weight"], p["bias"],
                     padding=1, groups=4)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_grouped_resnext_supergroups(self):
        """ResNeXt-32x8d-shaped grouped convs go through the block-diagonal
        supergroup path (layers._grouped_conv_supergroups); parity vs torch
        must hold through it, including stride and bias."""
        torch.manual_seed(3)
        for cpg, stride in [(8, 1), (16, 2), (32, 1)]:
            cin = 32 * cpg
            m = torch.nn.Conv2d(cin, cin, 3, stride=stride, padding=1,
                                groups=32)
            x = torch.randn(1, cin, 10, 12)
            with torch.no_grad():
                want = to_nhwc(m(x))
            p = convert_state_dict(m.state_dict())
            got = conv2d(jnp.asarray(to_nhwc(x)), p["weight"], p["bias"],
                         stride=stride, padding=1, groups=32)
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_rect_kernel(self):
        torch.manual_seed(2)
        m = torch.nn.Conv2d(4, 6, (5, 1), padding=(2, 0))
        x = torch.randn(1, 4, 9, 9)
        want = to_nhwc(m(x))
        p = convert_state_dict(m.state_dict())
        got = conv2d(jnp.asarray(to_nhwc(x)), p["weight"], p["bias"], padding=(2, 0))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestDeconvGrouped:
    @pytest.mark.parametrize("C", [2, 49])
    def test_matches_torch_convtranspose(self, C):
        torch.manual_seed(3)
        m = torch.nn.ConvTranspose2d(C, C, 4, stride=2, padding=1, bias=False, groups=C)
        x = torch.randn(1, C, 5, 7)
        want = to_nhwc(m(x))
        sd = convert_state_dict({"netUpflow.weight": m.state_dict()["weight"]})
        got = deconv_grouped(jnp.asarray(to_nhwc(x)), sd["netUpflow.weight"])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestBatchNormPool:
    def test_batch_norm_eval(self):
        torch.manual_seed(4)
        m = torch.nn.BatchNorm2d(6)
        m.eval()
        with torch.no_grad():
            m.running_mean.uniform_(-1, 1)
            m.running_var.uniform_(0.5, 2)
            m.weight.uniform_(0.5, 2)
            m.bias.uniform_(-1, 1)
        x = torch.randn(2, 6, 4, 4)
        want = to_nhwc(m(x))
        got = batch_norm(
            jnp.asarray(to_nhwc(x)),
            jnp.asarray(m.weight.detach().numpy()),
            jnp.asarray(m.bias.detach().numpy()),
            jnp.asarray(m.running_mean.numpy()),
            jnp.asarray(m.running_var.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_max_pool(self):
        torch.manual_seed(5)
        x = torch.randn(1, 3, 9, 9)
        want = to_nhwc(torch.nn.functional.max_pool2d(x, 3, 2, 1))
        got = max_pool(jnp.asarray(to_nhwc(x)), 3, 2, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


class TestUnfold:
    @pytest.mark.parametrize("k", [3, 5, 7])
    def test_matches_torch_unfold(self, k):
        torch.manual_seed(6)
        x = torch.randn(2, 1, 8, 10)
        want = torch.nn.functional.unfold(x, k, stride=1, padding=(k - 1) // 2)
        want = want.view(2, k * k, 8, 10).numpy().transpose(0, 2, 3, 1)
        got = unfold_channels(jnp.asarray(to_nhwc(x)), k)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


class TestSequentialParity:
    def test_conv_lrelu_stack(self):
        """A Matching-style netMain stack vs torch."""
        torch.manual_seed(7)
        m = torch.nn.Sequential(
            torch.nn.Conv2d(49, 128, 3, padding=1), torch.nn.LeakyReLU(0.1),
            torch.nn.Conv2d(128, 64, 3, padding=1), torch.nn.LeakyReLU(0.1),
            torch.nn.Conv2d(64, 32, 3, padding=1), torch.nn.LeakyReLU(0.1),
            torch.nn.Conv2d(32, 2, 7, padding=3),
        )
        x = torch.randn(1, 49, 8, 12)
        with torch.no_grad():
            want = to_nhwc(m(x))
        p = convert_state_dict({f"netMain.{k}": v for k, v in m.state_dict().items()})
        h = jnp.asarray(to_nhwc(x))
        h = leaky_relu(conv2d(h, p["netMain.0.weight"], p["netMain.0.bias"], padding=1))
        h = leaky_relu(conv2d(h, p["netMain.2.weight"], p["netMain.2.bias"], padding=1))
        h = leaky_relu(conv2d(h, p["netMain.4.weight"], p["netMain.4.bias"], padding=1))
        h = conv2d(h, p["netMain.6.weight"], p["netMain.6.bias"], padding=3)
        np.testing.assert_allclose(np.asarray(h), want, atol=1e-5)
