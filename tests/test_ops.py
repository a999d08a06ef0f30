import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vido_slam_tpu.ops.correlation import correlation, correlation_pallas
from vido_slam_tpu.ops.warp import backwarp, grid_sample_nhwc


def torch_backwarp(ten_input, ten_flow):
    """The reference backwarp (flow_net/src/layers.py:26-36), CPU torch."""
    H, W = ten_flow.shape[2], ten_flow.shape[3]
    hor = torch.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W).view(1, 1, 1, -1).expand(-1, -1, H, -1)
    ver = torch.linspace(-1.0 + 1.0 / H, 1.0 - 1.0 / H, H).view(1, 1, -1, 1).expand(-1, -1, -1, W)
    grid = torch.cat([hor, ver], 1)
    flow = torch.cat(
        [ten_flow[:, 0:1] / ((W - 1.0) / 2.0), ten_flow[:, 1:2] / ((H - 1.0) / 2.0)], 1
    )
    return torch.nn.functional.grid_sample(
        ten_input, (grid + flow).permute(0, 2, 3, 1),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )


def np_correlation(f1, f2, stride):
    """Direct numpy transcription of the CUDA kernel semantics (NCHW in)."""
    N, C, H, W = f1.shape
    Ho = -(-H // stride)
    Wo = -(-W // stride)
    out = np.zeros((N, 49, Ho, Wo), np.float32)
    f2p = np.pad(f2, ((0, 0), (0, 0), (3 * stride, 3 * stride), (3 * stride, 3 * stride)))
    for p in range(-3, 4):
        for o in range(-3, 4):
            ch = (p + 3) * 7 + (o + 3)
            for j in range(Ho):
                for i in range(Wo):
                    y, x = j * stride, i * stride
                    a = f1[:, :, y, x]
                    b = f2p[:, :, y + 3 * stride + p * stride, x + 3 * stride + o * stride]
                    out[:, ch, j, i] = (a * b).mean(axis=1)
    return out


class TestWarp:
    def test_grid_sample_identity(self):
        img = jnp.arange(2 * 5 * 6 * 3, dtype=jnp.float32).reshape(2, 5, 6, 3)
        x = jnp.tile(jnp.arange(6, dtype=jnp.float32), (2, 5, 1))
        y = jnp.tile(jnp.arange(5, dtype=jnp.float32)[:, None], (2, 1, 6))
        out = grid_sample_nhwc(img, x, y)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_zero_padding_outside(self):
        img = jnp.ones((1, 4, 4, 1))
        x = jnp.full((1, 1, 1), -2.0)
        y = jnp.full((1, 1, 1), 1.0)
        out = grid_sample_nhwc(img, x, y)
        np.testing.assert_allclose(out, 0.0)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_backwarp_matches_torch(self, seed):
        rng = np.random.RandomState(seed)
        x = rng.randn(2, 7, 9, 4).astype(np.float32)
        flow = (rng.randn(2, 7, 9, 2) * 2).astype(np.float32)
        ours = np.asarray(backwarp(jnp.asarray(x), jnp.asarray(flow)))
        theirs = (
            torch_backwarp(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(flow.transpose(0, 3, 1, 2)),
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestCorrelation:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_cuda_semantics(self, stride):
        rng = np.random.RandomState(0)
        f1 = rng.randn(2, 8, 10, 12, ).astype(np.float32)  # NHWC
        f2 = rng.randn(2, 8, 10, 12).astype(np.float32)
        ours = np.asarray(
            correlation(jnp.asarray(f1), jnp.asarray(f2), stride=stride)
        )
        ref = np_correlation(
            f1.transpose(0, 3, 1, 2), f2.transpose(0, 3, 1, 2), stride
        ).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_self_correlation_center_channel(self):
        rng = np.random.RandomState(1)
        f = rng.randn(1, 6, 6, 8).astype(np.float32)
        out = np.asarray(correlation(jnp.asarray(f), jnp.asarray(f)))
        np.testing.assert_allclose(out[..., 24], (f ** 2).mean(-1), atol=1e-5)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_pallas_matches_xla(self, stride):
        rng = np.random.RandomState(2)
        H = 16 * stride
        f1 = rng.randn(1, H, 12 * stride, 8).astype(np.float32)
        f2 = rng.randn(1, H, 12 * stride, 8).astype(np.float32)
        want = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2), stride=stride))
        got = np.asarray(
            correlation_pallas(
                jnp.asarray(f1), jnp.asarray(f2), stride=stride, row_tile=4,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

pytestmark = pytest.mark.slow  # heavy jit: full tier only
