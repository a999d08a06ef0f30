"""Mask R-CNN training losses: finite, sensitive, and overfittable."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vido_slam_tpu.models.maskrcnn import init_maskrcnn_params
from vido_slam_tpu.models.maskrcnn.losses import (
    DetectionTargets,
    _crop_mask_to_box,
    _encode_boxes,
    _match,
    maskrcnn_loss,
    total_loss,
)
from vido_slam_tpu.models.maskrcnn.model import MaskRCNNConfig
from vido_slam_tpu.ops.nms import decode_boxes


def small_cfg():
    return MaskRCNNConfig(input_h=128, input_w=160)


def toy_targets(G=4):
    boxes = np.zeros((G, 4), np.float32)
    labels = np.zeros(G, np.int32)
    valid = np.zeros(G, bool)
    boxes[0] = [30, 30, 80, 90]
    labels[0] = 3
    valid[0] = True
    boxes[1] = [100, 20, 140, 60]
    labels[1] = 7
    valid[1] = True
    masks = np.zeros((G, 64, 80), np.float32)  # half-res image-space masks
    masks[0, 15:45, 15:40] = 1.0
    masks[1, 10:30, 50:70] = 1.0
    return DetectionTargets(
        boxes=jnp.asarray(boxes), labels=jnp.asarray(labels),
        masks=jnp.asarray(masks), valid=jnp.asarray(valid),
    )


class TestEncode:
    def test_encode_decode_roundtrip(self):
        anchors = jnp.asarray([[10, 10, 50, 40], [5, 20, 25, 60]], jnp.float32)
        boxes = jnp.asarray([[12, 8, 55, 44], [6, 25, 28, 55]], jnp.float32)
        enc = _encode_boxes(boxes, anchors, (1.0, 1.0, 1.0, 1.0))
        dec = decode_boxes(enc, anchors)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(boxes), atol=1e-3)

    def test_mask_crop(self):
        m = jnp.zeros((40, 40)).at[10:20, 10:20].set(1.0)
        crop = _crop_mask_to_box(m, jnp.asarray([10.0, 10.0, 19.0, 19.0]), out=28)
        assert float(jnp.mean(crop)) > 0.85  # crop covers the blob


class TestMatch:
    def test_match_positive_and_forced(self):
        tg = toy_targets()
        anchors = jnp.asarray(
            [[30, 30, 80, 90],        # exact match of gt0
             [0, 0, 10, 10],          # background
             [98, 18, 142, 64]],      # good match of gt1
            jnp.float32,
        )
        gt_idx, is_pos, is_neg = _match(anchors, tg, 0.7, 0.3)
        assert bool(is_pos[0]) and int(gt_idx[0]) == 0
        assert bool(is_neg[1])
        assert bool(is_pos[2]) and int(gt_idx[2]) == 1


class TestLoss:
    def test_losses_finite_and_positive(self):
        cfg = small_cfg()
        p = init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 160, 3)) * 255
        parts = maskrcnn_loss(p, img, toy_targets(), jax.random.PRNGKey(2), cfg)
        assert set(parts) == {
            "loss_objectness", "loss_rpn_box_reg", "loss_classifier",
            "loss_box_reg", "loss_mask",
        }
        for k, v in parts.items():
            assert np.isfinite(float(v)), k
            assert float(v) >= 0, k
        assert float(parts["loss_objectness"]) > 0
        assert float(parts["loss_classifier"]) > 0

    def test_gradients_flow_and_loss_decreases(self):
        cfg = small_cfg()
        p = init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 160, 3)) * 255
        tg = toy_targets()
        opt = optax.adam(1e-4)
        state = opt.init(p)
        key = jax.random.PRNGKey(3)

        @jax.jit
        def step(p, state, key):
            loss, g = jax.value_and_grad(
                lambda pp: total_loss(pp, img, tg, key, cfg)
            )(p)
            updates, state = opt.update(g, state, p)
            return optax.apply_updates(p, updates), state, loss

        losses = []
        for i in range(6):
            p, state, loss = step(p, state, jax.random.fold_in(key, 0))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

pytestmark = pytest.mark.slow  # heavy jit: full tier only
