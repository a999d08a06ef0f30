"""Keypoint R-CNN head: deconv parity, heatmap round trip, loss."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from vido_slam_tpu.models.layers import convert_state_dict
from vido_slam_tpu.models.maskrcnn.backbone import (
    ResNetConfig, init_resnet_fpn_params,
)
from vido_slam_tpu.models.maskrcnn.keypoint_head import (
    HEATMAP,
    NUM_KEYPOINTS,
    _deconv4x2,
    init_keypoint_params,
    keypoint_head_forward,
    keypoint_loss,
    keypoints_from_heatmaps,
    keypoints_to_heatmap,
)


class TestDeconvParity:
    def test_k4_s2_p1_matches_torch(self):
        torch.manual_seed(0)
        m = torch.nn.ConvTranspose2d(8, 5, 4, stride=2, padding=1)
        x = torch.randn(2, 8, 7, 9)
        with torch.no_grad():
            want = m(x).numpy().transpose(0, 2, 3, 1)
        sd = convert_state_dict(
            {"w": m.state_dict()["weight"], "b": m.state_dict()["bias"]}
        )
        got = _deconv4x2(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), sd["w"], sd["b"]
        )
        assert got.shape == want.shape  # (2, 14, 18, 5)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_upsample_matches_torch_bilinear(self):
        torch.manual_seed(1)
        x = torch.randn(1, 3, 28, 28)
        want = torch.nn.functional.interpolate(
            x, scale_factor=2, mode="bilinear", align_corners=False
        ).numpy().transpose(0, 2, 3, 1)
        got = jax.image.resize(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), (1, 56, 56, 3),
            "linear",
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestHeatmapRoundTrip:
    def test_project_and_recover(self):
        rois = jnp.asarray([[10.0, 20.0, 66.0, 104.0]])
        kp = jnp.asarray([[[12.0, 30.0], [40.0, 90.0], [65.0, 103.0]]])
        kp = jnp.pad(kp, ((0, 0), (0, NUM_KEYPOINTS - 3), (0, 0)))
        vis = jnp.zeros((1, NUM_KEYPOINTS), bool).at[0, :3].set(True)
        lin, valid = keypoints_to_heatmap(kp, vis, rois)
        assert bool(valid[0, :3].all())
        assert not bool(valid[0, 3:].any())
        # paint logits with peaks at the target cells, decode back
        logits = jnp.full((1, HEATMAP, HEATMAP, NUM_KEYPOINTS), -5.0)
        for k in range(3):
            y, x = int(lin[0, k]) // HEATMAP, int(lin[0, k]) % HEATMAP
            logits = logits.at[0, y, x, k].set(10.0)
        out = keypoints_from_heatmaps(logits, rois)
        err = np.asarray(out.xy[0, :3] - kp[0, :3])
        # one heatmap cell is (56px roi)/56 = 1-1.5px here
        assert np.abs(err).max() < 1.6, err
        assert np.asarray(out.probs[0, :3]).min() > 0.9

    def test_boundary_keypoint_lands_in_last_cell(self):
        rois = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
        kp = jnp.zeros((1, NUM_KEYPOINTS, 2)).at[0, 0].set(
            jnp.asarray([56.0, 56.0]))
        vis = jnp.zeros((1, NUM_KEYPOINTS), bool).at[0, 0].set(True)
        lin, valid = keypoints_to_heatmap(kp, vis, rois)
        assert bool(valid[0, 0])
        assert int(lin[0, 0]) == HEATMAP * HEATMAP - 1


class TestForwardAndLoss:
    def _setup(self):
        cfg = ResNetConfig()
        key = jax.random.PRNGKey(0)
        p = init_resnet_fpn_params(key, cfg)
        p.update(init_keypoint_params(jax.random.fold_in(key, 1)))
        feats = [
            jax.random.uniform(jax.random.fold_in(key, 10 + i),
                               (32 // (2 ** i), 40 // (2 ** i), 256))
            for i in range(4)
        ]
        boxes = jnp.asarray([[8.0, 8.0, 80.0, 96.0], [40.0, 16.0, 120.0, 88.0]])
        return p, feats, boxes

    def test_forward_shape(self):
        p, feats, boxes = self._setup()
        hm = keypoint_head_forward(p, feats, boxes)
        assert hm.shape == (2, HEATMAP, HEATMAP, NUM_KEYPOINTS)
        assert bool(jnp.all(jnp.isfinite(hm)))

    def test_loss_finite_and_grads_flow(self):
        p, feats, boxes = self._setup()
        kp = jnp.stack([
            jnp.linspace(10, 70, NUM_KEYPOINTS),
            jnp.linspace(10, 90, NUM_KEYPOINTS),
        ], -1)[None].repeat(2, 0)
        vis = jnp.ones((2, NUM_KEYPOINTS), bool)
        rv = jnp.ones(2, bool)

        def loss_fn(pp):
            hm = keypoint_head_forward(pp, feats, boxes)
            return keypoint_loss(hm, kp, vis, boxes, rv)

        l0, g = jax.value_and_grad(loss_fn)(p)
        assert np.isfinite(float(l0))
        gn = sum(float(jnp.sum(v * v)) for k, v in g.items()
                 if "keypoint" in k)
        assert gn > 0
        # a couple of SGD steps reduce the loss
        pp = {k: v - 0.01 * g[k] for k, v in p.items()}
        l1 = loss_fn(pp)
        assert float(l1) < float(l0)

pytestmark = pytest.mark.slow  # heavy jit: full tier only
