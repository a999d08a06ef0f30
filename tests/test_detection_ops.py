import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.ops.nms import (
    box_iou,
    clip_boxes,
    decode_boxes,
    nms,
    remove_small_boxes,
)
from vido_slam_tpu.ops.roi_align import roi_align


def np_nms(boxes, scores, thresh):
    """Greedy NMS with the maskrcnn_benchmark +1 area convention."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


def np_roi_align(feat_hwc, rois, scale, res, ratio):
    """Direct transcription of ROIAlign_cpu.cpp semantics."""
    H, W, C = feat_hwc.shape
    out = np.zeros((len(rois), res, res, C), np.float32)

    def bilin(y, x):
        if y < -1.0 or y > H - 1 or x < -1.0 or x > W - 1:
            return np.zeros(C, np.float32)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (
            feat_hwc[y0, x0] * (1 - ly) * (1 - lx)
            + feat_hwc[y0, x1] * (1 - ly) * lx
            + feat_hwc[y1, x0] * ly * (1 - lx)
            + feat_hwc[y1, x1] * ly * lx
        )

    for ri, roi in enumerate(rois):
        xs, ys_, xe, ye = roi * scale
        rw = max(xe - xs, 1.0)
        rh = max(ye - ys_, 1.0)
        bw, bh = rw / res, rh / res
        for ph in range(res):
            for pw in range(res):
                acc = np.zeros(C, np.float32)
                for iy in range(ratio):
                    yy = ys_ + ph * bh + (iy + 0.5) * bh / ratio
                    for ix in range(ratio):
                        xx = xs + pw * bw + (ix + 0.5) * bw / ratio
                        acc += bilin(yy, xx)
                out[ri, ph, pw] = acc / (ratio * ratio)
    return out


class TestNMS:
    def test_matches_greedy_reference(self):
        rng = np.random.RandomState(0)
        n = 60
        ctr = rng.uniform(20, 80, (n, 2))
        wh = rng.uniform(5, 30, (n, 2))
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        want = np_nms(boxes, scores, 0.5)
        idx, ok = nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5, n
        )
        got = [int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o]
        assert got == want

    def test_valid_mask(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        valid = jnp.asarray([False, True, True])
        idx, ok = nms(boxes, scores, valid, 0.5, 3)
        got = sorted(int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o)
        assert got == [1, 2]

    def test_max_out_truncates(self):
        boxes = jnp.asarray(
            [[i * 20, 0, i * 20 + 10, 10] for i in range(5)], jnp.float32
        )
        scores = jnp.asarray([0.9, 0.8, 0.7, 0.6, 0.5])
        idx, ok = nms(boxes, scores, jnp.ones(5, bool), 0.5, 3)
        assert list(np.asarray(idx)) == [0, 1, 2]
        assert bool(jnp.all(ok))


class TestBoxUtils:
    def test_iou_diag_one(self):
        b = jnp.asarray([[0, 0, 9, 9], [5, 5, 14, 14]], jnp.float32)
        iou = np.asarray(box_iou(b, b))
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
        # 5x5=25 overlap (+1 conv: both 10x10=100) -> 25/175
        np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, atol=1e-6)

    def test_clip_and_small(self):
        b = jnp.asarray([[-5, -5, 20, 20], [0, 0, 1, 1]], jnp.float32)
        c = clip_boxes(b, 16, 16)
        np.testing.assert_allclose(np.asarray(c)[0], [0, 0, 15, 15])
        ok = remove_small_boxes(c, 3)
        assert list(np.asarray(ok)) == [True, False]

    def test_decode_identity(self):
        anchors = jnp.asarray([[10, 10, 29, 29]], jnp.float32)
        deltas = jnp.zeros((1, 4))
        out = decode_boxes(deltas, anchors)
        np.testing.assert_allclose(np.asarray(out)[0], [10, 10, 29, 29], atol=1e-4)

    def test_decode_shift_scale(self):
        anchors = jnp.asarray([[0, 0, 19, 9]], jnp.float32)  # w=20 h=10
        deltas = jnp.asarray([[0.1, -0.2, np.log(2.0), 0.0]], jnp.float32)
        out = np.asarray(decode_boxes(deltas, anchors))[0]
        # ctr (10-0.5=9.5? ctr_x = 0+10=10, ctr_y = 5); new ctr (12, 3); w 40 h 10
        np.testing.assert_allclose(out, [12 - 20, 3 - 5, 12 + 20 - 1, 3 + 5 - 1], atol=1e-4)


class TestROIAlign:
    @pytest.mark.parametrize("res,ratio", [(7, 2), (14, 2)])
    def test_matches_cpu_reference(self, res, ratio):
        rng = np.random.RandomState(1)
        feat = rng.randn(12, 16, 5).astype(np.float32)
        rois = np.asarray(
            [[4, 4, 40, 30], [0, 0, 63, 47], [10, 8, 20, 20]], np.float32
        )
        want = np_roi_align(feat, rois, 0.25, res, ratio)
        got = np.asarray(
            roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, res, ratio)
        )
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestMultilevelROIAlign:
    def test_matches_all_levels_then_select(self):
        """One-pass banded multilevel ROIAlign == ROIAlign-on-every-level
        + per-ROI select (the Pooler oracle), across FPN-shaped levels."""
        from vido_slam_tpu.models.maskrcnn.roi_heads import (
            pooled_features, pooled_features_reference)

        rng = np.random.RandomState(3)
        C = 16
        shapes = [(34, 50), (17, 25), (9, 13), (5, 7)]
        feats = [jnp.asarray(rng.randn(h, w, C).astype(np.float32))
                 for h, w in shapes]
        # rois spanning tiny -> huge so every level (incl. clamped ends)
        # is exercised; coords at the 136x200 image scale of these maps
        R = 64
        x1 = rng.uniform(0, 180, R)
        y1 = rng.uniform(0, 120, R)
        ww = rng.uniform(2, 500, R)
        hh = rng.uniform(2, 400, R)
        rois = jnp.asarray(
            np.stack([x1, y1, x1 + ww, y1 + hh], 1).astype(np.float32))
        for res in (7, 14):
            got = pooled_features(feats, rois, res)
            want = pooled_features_reference(feats, rois, res)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=1e-5)


def test_roi_align_fused_pallas_matches_xla():
    """The fused Pallas multilevel ROIAlign body (ops/roi_align.py
    roi_align_fused_pallas) must reproduce the XLA chunked two-einsum
    formulation exactly (interpret mode on the CPU test backend)."""
    import numpy as np

    from vido_slam_tpu.ops.roi_align import roi_align_fused_pallas

    rng = np.random.default_rng(1)
    Htot, Wmax, C, R, r = 75, 50, 128, 37, 7
    f = jnp.asarray(rng.normal(0, 1, (Htot, Wmax, C)).astype(np.float32))
    Ry = jnp.asarray(rng.uniform(0, 1, (R, r, Htot)).astype(np.float32))
    Rx = jnp.asarray(rng.uniform(0, 1, (R, r, Wmax)).astype(np.float32))
    ref = jnp.einsum("bph,hwc,bqw->bpqc", Ry, f, Rx)
    got = roi_align_fused_pallas(f, Ry, Rx, r, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    # mask-head resolution too
    r2 = 14
    Ry2 = jnp.asarray(rng.uniform(0, 1, (11, r2, Htot)).astype(np.float32))
    Rx2 = jnp.asarray(rng.uniform(0, 1, (11, r2, Wmax)).astype(np.float32))
    ref2 = jnp.einsum("bph,hwc,bqw->bpqc", Ry2, f, Rx2)
    got2 = roi_align_fused_pallas(f, Ry2, Rx2, r2, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               atol=2e-4, rtol=1e-4)
