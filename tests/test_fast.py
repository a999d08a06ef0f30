import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.ops.fast import detect_fast_features, fast_score_map


def synthetic_corners(H=96, W=128, seed=0):
    """Image with bright squares on dark background: strong corners."""
    rng = np.random.RandomState(seed)
    img = np.full((H, W), 30.0, np.float32)
    centers = [(20, 30), (50, 90), (70, 40), (25, 100)]
    for r, c in centers:
        img[r - 6: r + 6, c - 6: c + 6] = 200.0
    img += rng.randn(H, W) * 1.0
    return img, centers


class TestFastScore:
    def test_detects_square_corners(self):
        img, centers = synthetic_corners()
        s = np.asarray(fast_score_map(jnp.asarray(img), threshold=20))
        # each square contributes 4 corners; peaks near the square corners
        ys, xs = np.nonzero(s)
        assert len(ys) >= 8
        for r, c in centers:
            near = ((np.abs(ys - r) <= 8) & (np.abs(xs - c) <= 8)).sum()
            assert near >= 2, f"square at {(r, c)} produced {near} corners"

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        s = np.asarray(fast_score_map(img))
        assert (s > 0).sum() == 0

    def test_matches_opencv_detections(self):
        cv2 = pytest.importorskip("cv2")
        img, _ = synthetic_corners(seed=3)
        img_u8 = np.clip(img, 0, 255).astype(np.uint8)
        fast = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
        )
        kps = fast.detect(img_u8, None)
        ref = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps
               if 3 <= k.pt[0] < img.shape[1] - 3 and 3 <= k.pt[1] < img.shape[0] - 3}
        ours_map = np.asarray(fast_score_map(jnp.asarray(img_u8.astype(np.float32)), threshold=20))
        ours = set(zip(*np.nonzero(ours_map)))
        # every OpenCV corner should be within 2 px of one of ours (the NMS
        # winner can shift by a pixel because our score function is the
        # sum-of-absolute-differences ranking, not OpenCV's max-threshold)
        missed = 0
        for (r, c) in ref:
            if not any((rr, cc) in ours for rr in range(r - 2, r + 3)
                       for cc in range(c - 2, c + 3)):
                missed += 1
        assert missed <= max(1, len(ref) // 10), f"missed {missed}/{len(ref)}"

    def test_nms_isolated_peaks(self):
        img, _ = synthetic_corners()
        s = np.asarray(fast_score_map(jnp.asarray(img)))
        ys, xs = np.nonzero(s)
        # no two surviving corners within the same 2x2 block
        pts = np.stack([ys, xs], 1)
        for i in range(len(pts)):
            d = np.abs(pts - pts[i]).max(axis=1)
            assert (d[np.arange(len(pts)) != i] >= 1).all()


class TestDetectFeatures:
    def test_detect_returns_valid_corners(self):
        img, _ = synthetic_corners()
        uv, score, valid = detect_fast_features(jnp.asarray(img), n=64)
        nv = int(valid.sum())
        assert nv >= 8
        sel = np.asarray(uv)[np.asarray(valid)]
        smap = np.asarray(fast_score_map(jnp.asarray(img), threshold=7))
        for u, v in sel:
            assert smap[int(v), int(u)] > 0

    def test_budget_and_padding(self):
        img = jnp.full((64, 64), 100.0)
        uv, score, valid = detect_fast_features(img, n=32)
        assert int(valid.sum()) == 0

pytestmark = pytest.mark.slow  # heavy jit: full tier only
