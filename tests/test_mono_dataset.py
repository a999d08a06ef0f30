"""Mono self-supervision data pipeline (data/mono_dataset.py) vs the
reference's depricated/datasets/mono_dataset.py semantics."""

import numpy as np
import pytest

from vido_slam_tpu.data.mono_dataset import (
    KITTI_K_NORM,
    MonoSequenceDataset,
    SelfSupOptions,
    color_jitter,
    sample_jitter_params,
)


def _frames(n=8, H=32, W=64, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.rand(H, W, 3).astype(np.float32) for _ in range(n)]


class TestMonoSequenceDataset:
    def test_triplet_indexing_and_shapes(self):
        ds = MonoSequenceDataset(_frames(), height=32, width=64,
                                 is_train=False)
        assert len(ds) == 6
        it = ds.get_item(0)
        for k in ("prev", "color", "next"):
            assert it[k].shape == (32, 64, 3)
        # eval mode: aug frames ARE the clean frames
        np.testing.assert_array_equal(it["color"], it["color_aug"])

    def test_intrinsics_scaling(self):
        ds = MonoSequenceDataset(_frames(), height=32, width=64)
        assert ds.K[0, 0] == pytest.approx(0.58 * 64)
        assert ds.K[1, 1] == pytest.approx(1.92 * 32)
        assert ds.K[0, 2] == pytest.approx(0.5 * 64)
        np.testing.assert_allclose(ds.K @ ds.inv_K, np.eye(4), atol=1e-5)

    def test_train_mode_aug_and_flip_consistency(self):
        """The same flip/jitter must hit every frame of an item; clean
        frames stay un-jittered (mono_dataset.py:175-186)."""
        ds = MonoSequenceDataset(_frames(n=40), height=32, width=64,
                                 is_train=True, seed=3)
        saw_aug = saw_flip = False
        for i in range(len(ds)):
            it = ds.get_item(i)
            base = ds._load(i + 1)
            flipped = not np.allclose(it["color"], base)
            if flipped:
                np.testing.assert_allclose(it["color"], base[:, ::-1],
                                           atol=1e-6)
                saw_flip = True
            if not np.allclose(it["color_aug"], it["color"]):
                saw_aug = True
                # jitter is monotone per pixel-channel transform of the SAME
                # geometry: geometric content (argmax row) unchanged
                assert it["color_aug"].shape == it["color"].shape
        assert saw_aug and saw_flip

    def test_batch_feeds_selfsup_loss_shapes(self):
        ds = MonoSequenceDataset(_frames(H=32, W=64), height=32, width=64)
        b = ds.batch([0, 1])
        assert b.color.shape == (2, 32, 64, 3)
        assert b.K.shape == (2, 4, 4)
        assert b.color_aug is not None

    def test_epoch_batches_drop_last(self):
        ds = MonoSequenceDataset(_frames(n=10), height=32, width=64)
        batches = list(ds.epoch_batches(3))
        assert len(batches) == 2   # 8 items -> two batches of 3, drop 2

    def test_options_defaults(self):
        o = SelfSupOptions()
        assert (o.height, o.width) == (192, 640)
        assert o.scales == (0, 1, 2, 3)
        assert o.frame_ids == (0, -1, 1)
        assert o.disparity_smoothness == pytest.approx(1e-3)


class TestColorJitter:
    def test_identity_params_noop(self):
        img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
        out = color_jitter(img, 1.0, 1.0, 1.0, 0.0)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_param_ranges(self):
        rng = np.random.RandomState(0)
        for _ in range(50):
            b, c, s, h = sample_jitter_params(rng)
            assert 0.8 <= b <= 1.2 and 0.8 <= c <= 1.2 and 0.8 <= s <= 1.2
            assert -0.1 <= h <= 0.1

    def test_brightness_scales(self):
        img = np.full((4, 4, 3), 0.5, np.float32)
        out = color_jitter(img, 1.2, 1.0, 1.0, 0.0)
        np.testing.assert_allclose(out, 0.6, atol=1e-6)

    def test_output_in_range(self):
        rng = np.random.RandomState(1)
        img = rng.rand(16, 16, 3).astype(np.float32)
        for _ in range(5):
            b, c, s, h = sample_jitter_params(rng)
            out = color_jitter(img, b, c, s, h)
            assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6


@pytest.mark.slow
def test_selfsup_loss_uses_aug_inputs():
    """Augmented nets + clean loss: the loss value must differ from the
    no-aug loss (nets see different inputs) but stay finite."""
    import jax
    import jax.numpy as jnp

    from vido_slam_tpu.models.monodepth2_train import (
        init_selfsup_params, selfsup_loss,
    )

    ds = MonoSequenceDataset(_frames(H=32, W=32), height=32, width=32,
                             is_train=False)
    b = ds.batch([0, 1])
    # forge a jittered copy
    b = b._replace(color_aug=jnp.clip(b.color * 1.15, 0, 1),
                   prev_aug=jnp.clip(b.prev * 1.15, 0, 1),
                   next_aug=jnp.clip(b.next * 1.15, 0, 1))
    params = init_selfsup_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    l_aug, _ = selfsup_loss(params, b, key, scales=(0,))
    b_clean = b._replace(color_aug=None, prev_aug=None, next_aug=None)
    l_clean, _ = selfsup_loss(params, b_clean, key, scales=(0,))
    assert np.isfinite(float(l_aug)) and np.isfinite(float(l_clean))
    assert abs(float(l_aug) - float(l_clean)) > 1e-9
