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


class TestGroupedDCNBackbone:
    """DCN wired into the ResNet stages (resnet.py:110-122 + misc.py:114
    DFConv2d): grouped deformable conv2 and the bottleneck-level plumbing."""

    def test_grouped_zero_offsets_equal_grouped_conv(self):
        key = jax.random.PRNGKey(5)
        x = jax.random.normal(key, (2, 10, 12, 8))
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 2, 16)) * 0.2
        off = jnp.zeros((2, 10, 12, 18))
        got = deform_conv2d(x, off, w, groups=4)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_grouped_equals_per_group_split(self):
        key = jax.random.PRNGKey(6)
        x = jax.random.normal(key, (1, 8, 9, 6))
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 2, 12)) * 0.2
        off = jax.random.normal(jax.random.fold_in(key, 2), (1, 8, 9, 18))
        m = jax.nn.sigmoid(
            jax.random.normal(jax.random.fold_in(key, 3), (1, 8, 9, 9)))
        got = deform_conv2d(x, off, w, mask=m, groups=3)
        parts = [
            deform_conv2d(x[..., g * 2:(g + 1) * 2], off,
                          w[..., g * 4:(g + 1) * 4], mask=m)
            for g in range(3)
        ]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jnp.concatenate(parts, -1)),
            atol=1e-5)

    def test_dcn_bottleneck_zero_offsets_match_plain_bottleneck(self):
        """With the offset conv zero-initialised (the DFConv2d init,
        misc.py:161-163 biases at zero -> sampling grid = plain conv taps;
        DCNv1, no modulation), a DCN stage must reproduce the plain stage
        bit-for-bit given the same conv2 weights."""
        from vido_slam_tpu.models.maskrcnn.backbone import (
            ResNetConfig, init_resnet_fpn_params, resnet_stages)

        cfg_plain = ResNetConfig(stage_blocks=(1, 1, 1, 1), num_groups=2,
                                 width_per_group=8)
        cfg_dcn = cfg_plain._replace(stage_with_dcn=(False, True, True, True))
        p = init_resnet_fpn_params(jax.random.PRNGKey(7), cfg_dcn)
        p_plain = dict(p)
        for k in list(p_plain):
            if ".conv2.offset." in k:
                del p_plain[k]
            elif ".conv2.conv." in k:
                p_plain[k.replace(".conv2.conv.", ".conv2.")] = p_plain.pop(k)
        x = jax.random.normal(jax.random.PRNGKey(8), (1, 32, 32, 3))
        got = resnet_stages(p, x, cfg_dcn)
        want = resnet_stages(p_plain, x, cfg_plain)
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                       atol=2e-4)

    def test_modulated_dcn_mask_channels(self):
        """DCNv2 (with_modulated_dcn): 27-channel offset conv, last 9
        sigmoid-modulate the taps (misc.py:185-188). A large negative mask
        logit must suppress the output toward zero."""
        from vido_slam_tpu.models.maskrcnn.backbone import (
            ResNetConfig, init_resnet_fpn_params, resnet_stages)

        cfg = ResNetConfig(stage_blocks=(1, 1, 1, 1), num_groups=1,
                           width_per_group=16,
                           stage_with_dcn=(True, False, False, False),
                           with_modulated_dcn=True)
        p = init_resnet_fpn_params(jax.random.PRNGKey(9), cfg)
        key = "backbone.body.layer1.0.conv2.offset.bias"
        assert p[key].shape == (27,)
        x = jax.random.normal(jax.random.PRNGKey(10), (1, 16, 16, 3))
        base = resnet_stages(p, x, cfg)[0]
        p_off = dict(p)
        # mask logits -> -30: sigmoid ~ 0, conv2 output collapses to zero,
        # the block reduces to identity+downsample branch
        p_off[key] = p[key].at[18:].set(-30.0)
        suppressed = resnet_stages(p_off, x, cfg)[0]
        assert not np.allclose(np.asarray(base), np.asarray(suppressed))
