"""LiteFlowNet net-level behavior (block-level parity lives in test_ops /
test_models_layers; the CUDA-correlation parity in test_ops.TestCorrelation)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.models.liteflownet import (
    init_liteflownet_params,
    liteflownet_forward,
)


class TestLiteFlowNet:
    def _setup(self, h=64, w=96):
        p = init_liteflownet_params(jax.random.PRNGKey(0))
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        a = jax.random.uniform(k1, (1, h, w, 3))
        b = jax.random.uniform(k2, (1, h, w, 3))
        return p, a, b

    def test_output_shape_half_resolution(self):
        p, a, b = self._setup()
        f = liteflownet_forward(p, a, b)
        # final estimate at 1/2 input resolution, x20 scaling
        # (run_flow_net.py:87-107 resizes/rescales outside)
        assert f.shape == (1, 32, 48, 2)
        assert bool(jnp.all(jnp.isfinite(f)))

    def test_deterministic(self):
        p, a, b = self._setup()
        f1 = liteflownet_forward(p, a, b)
        f2 = liteflownet_forward(p, a, b)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    def test_input_sensitivity(self):
        p, a, b = self._setup()
        f_ab = np.asarray(liteflownet_forward(p, a, b))
        f_aa = np.asarray(liteflownet_forward(p, a, a))
        assert np.abs(f_ab - f_aa).max() > 1e-4

    def test_batched(self):
        p, a, b = self._setup()
        a2 = jnp.concatenate([a, b])
        b2 = jnp.concatenate([b, a])
        f = liteflownet_forward(p, a2, b2)
        assert f.shape[0] == 2
        # per-sample independence: first sample equals the single-pair run
        f_single = liteflownet_forward(p, a, b)
        np.testing.assert_allclose(np.asarray(f[0]), np.asarray(f_single[0]),
                                   atol=1e-4)

    def test_bf16_matches_f32(self):
        """bf16 params run the whole pyramid in bf16 (MXU-native) but must
        track the f32 flow closely — the flow feeds a 0.4 px RANSAC gate."""
        p, a, b = self._setup()
        f32 = np.asarray(liteflownet_forward(p, a, b))
        p16 = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
        f16 = np.asarray(liteflownet_forward(p16, a, b))
        assert f16.dtype == np.float32  # output pinned to f32
        scale = max(np.abs(f32).max(), 1.0)
        assert np.abs(f16 - f32).max() / scale < 0.02


pytestmark = pytest.mark.slow  # heavy jit: full tier only
