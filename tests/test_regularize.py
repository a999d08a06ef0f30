"""Fused flow-regularization kernel (ops/regularize.py): the XLA reference
must match the in-model formulation (models/liteflownet.py regularization
tail, reference layers.py:207-272), and the Pallas kernel (interpret mode
on CPU) must match the reference across levels' shapes and dtypes."""

import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.models.layers import conv2d, unfold_channels
from vido_slam_tpu.ops.regularize import (
    dist_weighted_flow,
    dist_weighted_flow_pallas,
)


def _inmodel_tail(d, flow, wx, bx, wy, by, k):
    """The pre-kernel formulation from regularization_forward."""
    d = -(d * d)
    d = jnp.exp(d - jnp.max(d, axis=-1, keepdims=True))
    divisor = 1.0 / jnp.sum(d, axis=-1, keepdims=True)
    ufx = unfold_channels(flow[..., 0:1], k)
    ufy = unfold_channels(flow[..., 1:2], k)
    wconv_x = wx.reshape(1, 1, -1, 1)
    wconv_y = wy.reshape(1, 1, -1, 1)
    sx = conv2d(d * ufx, wconv_x, bx.reshape(1)) * divisor
    sy = conv2d(d * ufy, wconv_y, by.reshape(1)) * divisor
    return jnp.concatenate([sx, sy], axis=-1)


def _case(rng, N, H, W, k, dtype=np.float32):
    K = k * k
    dc = jnp.asarray(rng.randn(N, H, W, K).astype(dtype))
    flow = jnp.asarray((rng.randn(N, H, W, 2) * 3).astype(dtype))
    wx = jnp.asarray(rng.randn(K).astype(dtype))
    wy = jnp.asarray(rng.randn(K).astype(dtype))
    bx = jnp.asarray(np.asarray(0.3, dtype))
    by = jnp.asarray(np.asarray(-0.2, dtype))
    return dc, flow, wx, bx, wy, by


LEVEL_SHAPES = [(96, 320, 7), (48, 160, 5), (24, 80, 5), (12, 40, 3),
                (6, 20, 3)]


class TestReference:
    @pytest.mark.parametrize("H,W,k", LEVEL_SHAPES[1:3])
    def test_matches_inmodel_formulation(self, H, W, k):
        rng = np.random.RandomState(0)
        dc, flow, wx, bx, wy, by = _case(rng, 1, H, W, k)
        ref = _inmodel_tail(dc, flow, wx, bx, wy, by, k)
        sx, sy = dist_weighted_flow(dc, flow[..., 0], flow[..., 1],
                                    wx, bx, wy, by, k)
        out = jnp.stack([sx, sy], axis=-1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestPallasInterpret:
    @pytest.mark.parametrize("H,W,k", LEVEL_SHAPES)
    def test_matches_reference(self, H, W, k):
        rng = np.random.RandomState(1)
        dc, flow, wx, bx, wy, by = _case(rng, 1, H, W, k)
        ref = dist_weighted_flow(dc, flow[..., 0], flow[..., 1],
                                 wx, bx, wy, by, k)
        out = dist_weighted_flow_pallas(dc, flow[..., 0], flow[..., 1],
                                        wx, bx, wy, by, k, interpret=True)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)

    def test_batch(self):
        rng = np.random.RandomState(2)
        dc, flow, wx, bx, wy, by = _case(rng, 3, 12, 40, 3)
        ref = dist_weighted_flow(dc, flow[..., 0], flow[..., 1],
                                 wx, bx, wy, by, 3)
        out = dist_weighted_flow_pallas(dc, flow[..., 0], flow[..., 1],
                                        wx, bx, wy, by, 3, interpret=True)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)

    def test_bf16_inputs(self):
        """bf16 params/activations: kernel accumulates in f32 and returns
        the input dtype (the flow net's dtype contract)."""
        rng = np.random.RandomState(3)
        dc, flow, wx, bx, wy, by = _case(rng, 1, 12, 40, 3)
        cast = lambda t: t.astype(jnp.bfloat16)  # noqa: E731
        out = dist_weighted_flow_pallas(
            cast(dc), cast(flow[..., 0]), cast(flow[..., 1]),
            cast(wx), cast(bx), cast(wy), cast(by), 3, interpret=True)
        ref = dist_weighted_flow(dc, flow[..., 0], flow[..., 1],
                                 wx, bx, wy, by, 3)
        assert out[0].dtype == jnp.bfloat16
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(b, np.float32),
                                       np.asarray(a), rtol=0.05, atol=0.05)

    def test_boundary_zero_padding(self):
        """Constant flow + uniform dist: interior output equals the flow
        value; borders shrink toward 0 exactly like zero-padded unfold."""
        H, W, k = 12, 40, 3
        K = k * k
        dc = jnp.zeros((1, H, W, K))
        u = jnp.full((1, H, W), 2.0)
        v = jnp.full((1, H, W), -1.0)
        # uniform logits give divisor sum(e) = K, so unit conv weights make
        # the interior an identity filter
        wx = wy = jnp.full((K,), 1.0)
        b0 = jnp.asarray(0.0)
        sx, sy = dist_weighted_flow_pallas(dc, u, v, wx, b0, wy, b0, k,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(sx[0, 1:-1, 1:-1]), 2.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sy[0, 1:-1, 1:-1]), -1.0,
                                   rtol=1e-6)
        # corner: only 4 of 9 taps in-bounds -> 4/9 of the value
        np.testing.assert_allclose(float(sx[0, 0, 0]), 2.0 * 4 / 9,
                                   rtol=1e-6)
