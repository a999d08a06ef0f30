"""Monocular self-supervision data pipeline — the counterpart of the
reference's vendored MonoDepth2 dataset stack and option set
(src/thirdparty/mono_depth2/src/depricated/{datasets/mono_dataset.py,
datasets/kitti_dataset.py, options.py}).

Semantics preserved from mono_dataset.py:
  - each item is a (prev, cur, next) frame triplet (frame_ids 0/-1/1),
    resized to (width, height) (:129-161);
  - 50% random horizontal flip, 50% random color jitter with
    brightness/contrast/saturation 0.2 and hue 0.1 (:77-80, 140-141); the
    SAME jitter is applied to every frame of an item (:175-186) and the
    un-jittered frames are kept for the photometric loss;
  - intrinsics come as a resolution-NORMALISED K scaled by the actual
    width/height (kitti_dataset.py:25-30, mono_dataset.py:163-173); the
    x-axis flips under do_flip.

The loader is pure numpy/PIL (host-side); `batch()` emits a SelfSupBatch
ready for `selfsup_loss` / `make_selfsup_train_step`.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

# KITTI-normalised intrinsics (kitti_dataset.py:25-29): K[0] *= width,
# K[1] *= height at load time.
KITTI_K_NORM = np.array([
    [0.58, 0.0, 0.5, 0.0],
    [0.0, 1.92, 0.5, 0.0],
    [0.0, 0.0, 1.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
], dtype=np.float32)


@dataclasses.dataclass
class SelfSupOptions:
    """The training options subset of depricated/options.py (defaults kept:
    192x640, scales 0-3, frame_ids 0/-1/1, depth bounds 0.1-100, smoothness
    1e-3, Adam 1e-4, batch 12, 20 epochs)."""
    height: int = 192
    width: int = 640
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    frame_ids: Tuple[int, ...] = (0, -1, 1)
    min_depth: float = 0.1
    max_depth: float = 100.0
    disparity_smoothness: float = 1e-3
    learning_rate: float = 1e-4
    batch_size: int = 12
    num_epochs: int = 20
    scheduler_step_size: int = 15   # lr /10 after this many epochs
    use_stereo: bool = False


def _resize_rgb(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Antialiased PIL resize like torchvision transforms.Resize(ANTIALIAS)
    (mono_dataset.py:85-86)."""
    from PIL import Image

    if img.shape[:2] == (h, w):
        return img.astype(np.float32)
    pim = Image.fromarray(np.clip(img * 255.0, 0, 255).astype(np.uint8)
                          if img.dtype != np.uint8 else img)
    out = np.asarray(pim.resize((w, h), Image.LANCZOS), np.float32) / 255.0
    return out


def color_jitter(
    img: np.ndarray, brightness: float, contrast: float, saturation: float,
    hue: float,
) -> np.ndarray:
    """Apply one sampled ColorJitter transform: img (H, W, 3) in [0,1] with
    the given multiplicative brightness/contrast/saturation factors and an
    additive hue shift (torchvision functional semantics)."""
    out = np.clip(img * brightness, 0.0, 1.0)
    mean_gray = np.mean(0.299 * out[..., 0] + 0.587 * out[..., 1]
                        + 0.114 * out[..., 2])
    out = np.clip(mean_gray + contrast * (out - mean_gray), 0.0, 1.0)
    gray = (0.299 * out[..., 0] + 0.587 * out[..., 1]
            + 0.114 * out[..., 2])[..., None]
    out = np.clip(gray + saturation * (out - gray), 0.0, 1.0)
    if hue != 0.0:
        import matplotlib.colors as mc

        hsv = mc.rgb_to_hsv(out)
        hsv[..., 0] = (hsv[..., 0] + hue) % 1.0
        out = mc.hsv_to_rgb(hsv)
    return out.astype(np.float32)


def sample_jitter_params(rng: np.random.RandomState):
    """ColorJitter.get_params with the mono_dataset.py ranges
    (brightness/contrast/saturation 0.2 -> U[0.8, 1.2]; hue 0.1 ->
    U[-0.1, 0.1])."""
    return (rng.uniform(0.8, 1.2), rng.uniform(0.8, 1.2),
            rng.uniform(0.8, 1.2), rng.uniform(-0.1, 0.1))


class MonoSequenceDataset:
    """Frame-triplet dataset over a directory (or explicit list) of
    time-ordered images — the KITTIRAWDataset counterpart for generic image
    sequences. Index i addresses the i-th INTERIOR frame (it needs both
    temporal neighbours)."""

    def __init__(
        self,
        images,                      # dir path or list of file paths/arrays
        height: int = 192,
        width: int = 640,
        K_norm: np.ndarray = KITTI_K_NORM,
        is_train: bool = True,
        seed: int = 0,
    ):
        if isinstance(images, str):
            exts = (".png", ".jpg", ".jpeg", ".bmp", ".npy")
            images = sorted(
                p for p in glob.glob(os.path.join(images, "*"))
                if p.lower().endswith(exts))
        self.items: List = list(images)
        if len(self.items) < 3:
            raise ValueError("need at least 3 frames for triplets")
        self.height, self.width = height, width
        self.is_train = is_train
        self.rng = np.random.RandomState(seed)
        K = K_norm.copy()
        K[0] *= width
        K[1] *= height
        # under do_flip the IMAGE is mirrored and K kept, exactly like
        # mono_dataset.py get_color(..., do_flip)
        self.K = K
        self.inv_K = np.linalg.inv(K)

    def __len__(self) -> int:
        return len(self.items) - 2

    def _load(self, i: int) -> np.ndarray:
        it = self.items[i]
        if isinstance(it, np.ndarray):
            arr = it.astype(np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
        elif isinstance(it, str) and it.endswith(".npy"):
            arr = np.load(it).astype(np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
        else:
            from PIL import Image

            arr = np.asarray(Image.open(it).convert("RGB"), np.float32) / 255.0
        return _resize_rgb(arr, self.height, self.width)

    def get_item(self, idx: int):
        """Returns dict with clean + augmented triplet and K/inv_K."""
        i = idx + 1
        frames = [self._load(i - 1), self._load(i), self._load(i + 1)]
        do_flip = self.is_train and self.rng.rand() > 0.5
        do_aug = self.is_train and self.rng.rand() > 0.5
        if do_flip:
            frames = [f[:, ::-1].copy() for f in frames]
        if do_aug:
            b, c, s, h = sample_jitter_params(self.rng)
            aug = [color_jitter(f, b, c, s, h) for f in frames]
        else:
            aug = frames
        return {
            "prev": frames[0], "color": frames[1], "next": frames[2],
            "prev_aug": aug[0], "color_aug": aug[1], "next_aug": aug[2],
            "K": self.K, "inv_K": self.inv_K,
        }

    def batch(self, indices: Sequence[int]):
        """Stack items into a SelfSupBatch (jnp arrays)."""
        import jax.numpy as jnp

        from vido_slam_tpu.models.monodepth2_train import SelfSupBatch

        its = [self.get_item(i) for i in indices]

        def stack(k):
            return jnp.asarray(np.stack([it[k] for it in its]))

        return SelfSupBatch(
            color=stack("color"), prev=stack("prev"), next=stack("next"),
            K=stack("K"), inv_K=stack("inv_K"),
            color_aug=stack("color_aug"), prev_aug=stack("prev_aug"),
            next_aug=stack("next_aug"),
        )

    def epoch_batches(self, batch_size: int, shuffle: bool = True):
        """Iterate one epoch of SelfSupBatches (drop_last, like the
        reference DataLoader)."""
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            yield self.batch(order[i:i + batch_size].tolist())
