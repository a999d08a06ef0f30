"""Deformable conv + ROIPool kernels (csrc parity)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.ops.deform_conv import deform_conv2d
from vido_slam_tpu.ops.roi_pool import roi_pool


def plain_conv(x, w, stride=1, padding=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


class TestDeformConv:
    def test_zero_offsets_equal_plain_conv(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 10, 12, 6))
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 6, 4)) * 0.2
        off = jnp.zeros((2, 10, 12, 18))
        got = deform_conv2d(x, off, w)
        want = plain_conv(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_zero_offsets_stride_dilation(self):
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (1, 13, 11, 3))
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 5)) * 0.2
        got = deform_conv2d(x, jnp.zeros((1, 7, 6, 18)), w,
                            stride=2, padding=2, dilation=2)
        want = plain_conv(x, w, stride=2, padding=2, dilation=2)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_integer_offset_shifts_sampling(self):
        # a uniform offset of (+1, 0) makes the 1x1 kernel read row y+1
        x = jnp.arange(5 * 6, dtype=jnp.float32).reshape(1, 5, 6, 1)
        w = jnp.ones((1, 1, 1, 1))
        off = jnp.zeros((1, 5, 6, 2)).at[..., 0].set(1.0)  # dy = 1
        got = deform_conv2d(x, off, w, padding=0)
        want = jnp.concatenate([x[:, 1:], jnp.zeros((1, 1, 6, 1))], axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_fractional_offset_bilinear(self):
        x = jnp.asarray([[0.0, 2.0], [4.0, 6.0]]).reshape(1, 2, 2, 1)
        w = jnp.ones((1, 1, 1, 1))
        off = jnp.zeros((1, 2, 2, 2)).at[..., 1].set(0.5)  # dx = 0.5
        got = np.asarray(deform_conv2d(x, off, w, padding=0))
        assert abs(got[0, 0, 0, 0] - 1.0) < 1e-5  # between 0 and 2

    def test_v2_modulation(self):
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (1, 8, 8, 4))
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 4, 2)) * 0.3
        off = jnp.zeros((1, 8, 8, 18))
        m_half = jnp.full((1, 8, 8, 9), 0.5)
        got = deform_conv2d(x, off, w, mask=m_half)
        want = 0.5 * plain_conv(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_gradients_flow_to_offsets(self):
        key = jax.random.PRNGKey(4)
        x = jax.random.normal(key, (1, 6, 6, 2))
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 2, 2)) * 0.3
        off0 = jnp.full((1, 6, 6, 18), 0.25)  # fractional: bilinear grad != 0

        g = jax.grad(lambda o: jnp.sum(deform_conv2d(x, o, w) ** 2))(off0)
        assert float(jnp.sum(jnp.abs(g))) > 0
        assert bool(jnp.all(jnp.isfinite(g)))


def roi_pool_ref(feat, rois, scale, res):
    """Direct numpy port of the ROIPool_cuda.cu:18-75 semantics."""
    H, W, C = feat.shape
    out = np.zeros((len(rois), res, res, C), np.float32)
    for n, roi in enumerate(rois):
        x0, y0, x1, y1 = [int(round(v * scale)) for v in roi]
        rw = max(x1 - x0 + 1, 1)
        rh = max(y1 - y0 + 1, 1)
        bh, bw = rh / res, rw / res
        for ph in range(res):
            for pw in range(res):
                hs = min(max(int(np.floor(ph * bh)) + y0, 0), H)
                he = min(max(int(np.ceil((ph + 1) * bh)) + y0, 0), H)
                ws = min(max(int(np.floor(pw * bw)) + x0, 0), W)
                we = min(max(int(np.ceil((pw + 1) * bw)) + x0, 0), W)
                if he > hs and we > ws:
                    out[n, ph, pw] = feat[hs:he, ws:we].reshape(-1, C).max(0)
    return out


class TestRoiPool:
    def test_matches_cuda_semantics(self):
        rng = np.random.RandomState(0)
        feat = rng.randn(16, 20, 3).astype(np.float32)
        rois = np.asarray(
            [[4.0, 8.0, 60.0, 50.0],
             [0.0, 0.0, 79.0, 63.0],
             [30.0, 20.0, 34.0, 25.0]],   # tiny roi -> some empty bins
            np.float32,
        )
        scale = 0.25
        want = roi_pool_ref(feat, rois, scale, 7)
        got = roi_pool(jnp.asarray(feat), jnp.asarray(rois), scale, 7)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_empty_bin_is_zero(self):
        feat = jnp.ones((8, 8, 1))
        # roi smaller than the 7x7 grid -> duplicated/empty bins exist
        rois = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
        got = np.asarray(roi_pool(feat, rois, 1.0, 7))
        assert got.max() == 1.0
        assert np.isfinite(got).all()

pytestmark = pytest.mark.slow  # heavy jit: full tier only
