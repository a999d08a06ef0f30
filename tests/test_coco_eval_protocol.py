"""Hand-computed fixtures for the protocol-complete COCO evaluation
(data/coco_eval.py): crowd ignore-regions, area ranges, maxDets caps,
segm mask IoU, keypoint OKS. pycocotools is not installed in this
environment, so each expected value is derived by hand in the comments
(reference protocol: maskrcnn_benchmark .../evaluation/coco/coco_eval.py
deferring to pycocotools COCOeval)."""

import numpy as np

from vido_slam_tpu.data.coco_eval import (
    KPT_OKS_SIGMAS, compute_map)


def box(x0, y0, w, h):
    return [x0, y0, x0 + w, y0 + h]


class TestBBoxProtocol:
    def test_perfect_match(self):
        gt = [{"boxes": np.array([box(0, 0, 10, 10), box(20, 20, 10, 10)]),
               "labels": np.array([1, 1])}]
        pred = [{"boxes": np.array([box(0, 0, 10, 10), box(20, 20, 10, 10)]),
                 "scores": np.array([0.9, 0.8]),
                 "labels": np.array([1, 1])}]
        r = compute_map(pred, gt)
        assert r["mAP"] == 1.0 and r["AP50"] == 1.0 and r["AP75"] == 1.0
        assert r["AR100"] == 1.0

    def test_crowd_region_absorbs_detection(self):
        """Det B lies inside a crowd GT: crowd IoU = inter/det-area = 1.0,
        so B matches the crowd region and is IGNORED (neither TP nor FP).
        AP stays 1.0; without crowd handling B would be an FP and
        AP would drop (precision 1/2 beyond recall 1.0 doesn't matter, but
        ordering: B has higher score -> precision at recall 1 is 0.5 ->
        AP = 0.5... so the 1.0 here proves the ignore path)."""
        gt = [{"boxes": np.array([box(0, 0, 10, 10), box(50, 50, 40, 40)]),
               "labels": np.array([1, 1]),
               "iscrowd": np.array([0, 1])}]
        pred = [{"boxes": np.array([box(60, 60, 5, 5), box(0, 0, 10, 10)]),
                 "scores": np.array([0.95, 0.9]),
                 "labels": np.array([1, 1])}]
        r = compute_map(pred, gt)
        assert r["mAP"] == 1.0, r
        # same predictions with the crowd flag off: the region is a real GT
        # missed at IoU (5x5 in 40x40 = 25/1600 < 0.5) -> det1 is an FP with
        # the HIGHER score -> precision at the match is 1/2, AP50 = mean of
        # interpolated precision = 0.5 at every recall point > 0 covered
        gt2 = [{"boxes": gt[0]["boxes"], "labels": gt[0]["labels"]}]
        r2 = compute_map(pred, gt2)
        assert r2["AP50"] < 0.6

    def test_area_ranges(self):
        """One small GT (16x16 = 256 < 32^2), one large (200x200 > 96^2);
        only the small one is detected. APsmall = 1; APlarge = 0 (its GT is
        the only in-range one and recall never reaches it); mAP ('all') has
        recall stuck at 0.5 with precision 1 -> 101-pt AP = 51/101."""
        gt = [{"boxes": np.array([box(0, 0, 16, 16), box(100, 100, 200, 200)]),
               "labels": np.array([1, 1])}]
        pred = [{"boxes": np.array([box(0, 0, 16, 16)]),
                 "scores": np.array([0.9]), "labels": np.array([1])}]
        r = compute_map(pred, gt)
        assert r["APsmall"] == 1.0
        assert r["APlarge"] == 0.0
        np.testing.assert_allclose(r["mAP"], 51 / 101, atol=1e-9)

    def test_unmatched_det_outside_range_is_ignored(self):
        """In the 'small' range, an unmatched LARGE detection is dropped
        (dtIg), so it doesn't poison small-object precision."""
        gt = [{"boxes": np.array([box(0, 0, 16, 16)]),
               "labels": np.array([1])}]
        pred = [{"boxes": np.array([box(100, 100, 200, 200),
                                    box(0, 0, 16, 16)]),
                 "scores": np.array([0.95, 0.9]),
                 "labels": np.array([1, 1])}]
        r = compute_map(pred, gt)
        assert r["APsmall"] == 1.0
        # in 'all' the large det IS an FP with the higher score:
        # precision at recall 1.0 is 1/2 -> AP = 0.5
        np.testing.assert_allclose(r["mAP"], 0.5, atol=1e-9)

    def test_max_dets_cap(self):
        """The only true detection is ranked below the 100-det cap ->
        AP = 0; AR1/AR10 reflect their own caps."""
        gt = [{"boxes": np.array([box(0, 0, 10, 10)]),
               "labels": np.array([1])}]
        junk = np.stack([box(500 + 20 * i, 500, 10, 10) for i in range(110)])
        boxes = np.concatenate([junk, np.array([box(0, 0, 10, 10)])])
        scores = np.concatenate([np.linspace(0.9, 0.5, 110), [0.1]])
        pred = [{"boxes": boxes, "scores": scores,
                 "labels": np.ones(111, np.int64)}]
        r = compute_map(pred, gt)
        assert r["mAP"] == 0.0
        assert r["AR1"] == 0.0 and r["AR10"] == 0.0

    def test_ar_caps(self):
        """1 GT; the matching det is scored 3rd of 5 -> AR1 = 0 (top-1
        misses), AR10 = 1 (within cap)."""
        gt = [{"boxes": np.array([box(0, 0, 10, 10)]),
               "labels": np.array([1])}]
        boxes = np.array([box(100, 0, 10, 10), box(200, 0, 10, 10),
                          box(0, 0, 10, 10), box(300, 0, 10, 10),
                          box(400, 0, 10, 10)])
        pred = [{"boxes": boxes,
                 "scores": np.array([0.9, 0.8, 0.7, 0.6, 0.5]),
                 "labels": np.ones(5, np.int64)}]
        r = compute_map(pred, gt)
        assert r["AR1"] == 0.0
        assert r["AR10"] == 1.0 and r["AR100"] == 1.0


class TestSegmProtocol:
    def test_mask_iou_half(self):
        """Det mask covers exactly half the GT mask and nothing else:
        IoU = 0.5 -> matched only at threshold 0.50 -> mAP = 1/10.
        The BOXES are identical (would match at every threshold), proving
        segm scoring uses the masks."""
        H, W = 32, 32
        gm = np.zeros((1, H, W), bool)
        gm[0, 0:16, 0:16] = True
        pm = np.zeros((1, H, W), bool)
        pm[0, 0:8, 0:16] = True  # half of gt, subset -> inter 128, union 256
        gt = [{"boxes": np.array([box(0, 0, 16, 16)]),
               "labels": np.array([1]), "masks": gm}]
        pred = [{"boxes": np.array([box(0, 0, 16, 16)]),
                 "scores": np.array([0.9]), "labels": np.array([1]),
                 "masks": pm}]
        r = compute_map(pred, gt, iou_type="segm")
        np.testing.assert_allclose(r["AP50"], 1.0)
        np.testing.assert_allclose(r["mAP"], 0.1, atol=1e-9)

    def test_crowd_mask(self):
        """A det mask inside a crowd GT mask: crowd IoU = inter/det = 1 ->
        ignored, AP 1.0 from the real match."""
        H, W = 32, 32
        g_real = np.zeros((1, H, W), bool)
        g_real[0, :8, :8] = True
        g_crowd = np.zeros((1, H, W), bool)
        g_crowd[0, 16:, 16:] = True
        p1 = g_real.copy()
        p2 = np.zeros((1, H, W), bool)
        p2[0, 20:24, 20:24] = True
        gt = [{"boxes": np.array([box(0, 0, 8, 8), box(16, 16, 16, 16)]),
               "labels": np.array([1, 1]), "iscrowd": np.array([0, 1]),
               "masks": np.concatenate([g_real, g_crowd])}]
        pred = [{"boxes": np.array([box(0, 0, 8, 8), box(20, 20, 4, 4)]),
                 "scores": np.array([0.9, 0.95]),
                 "labels": np.array([1, 1]),
                 "masks": np.concatenate([p1, p2])}]
        r = compute_map(pred, gt, iou_type="segm")
        assert r["mAP"] == 1.0


class TestKeypointsProtocol:
    def test_exact_keypoints(self):
        kp = np.zeros((1, 17, 3))
        kp[0, :, 0] = np.arange(17) * 5.0
        kp[0, :, 1] = 50.0
        kp[0, :, 2] = 2  # all visible
        gt = [{"boxes": np.array([box(0, 40, 80, 20)]),
               "labels": np.array([1]), "keypoints": kp,
               "areas": np.array([80.0 * 20.0])}]
        pred = [{"boxes": np.array([box(0, 40, 80, 20)]),
                 "scores": np.array([0.9]), "labels": np.array([1]),
                 "keypoints": kp.copy()}]
        r = compute_map(pred, gt, iou_type="keypoints")
        assert r["mAP"] == 1.0

    def test_oks_threshold_boundary(self):
        """One visible keypoint (nose, sigma 0.26). Displace the detection
        so OKS = exp(-d^2 / (2 A (2*0.26)^2)) ~ 0.62: matched at thresholds
        0.50..0.60 (3 of 10) -> mAP = 0.3."""
        s = KPT_OKS_SIGMAS[0]
        A = 900.0  # gt area
        target = 0.62
        d2 = -np.log(target) * 2.0 * A * (2 * s) ** 2
        d = np.sqrt(d2)
        gkp = np.zeros((1, 17, 3))
        gkp[0, 0] = [100.0, 100.0, 2]
        pkp = gkp.copy()
        pkp[0, 0, 0] += d
        gt = [{"boxes": np.array([box(85, 85, 30, 30)]),
               "labels": np.array([1]), "keypoints": gkp,
               "areas": np.array([A])}]
        pred = [{"boxes": np.array([box(85, 85, 30, 30)]),
                 "scores": np.array([0.9]), "labels": np.array([1]),
                 "keypoints": pkp}]
        r = compute_map(pred, gt, iou_type="keypoints")
        np.testing.assert_allclose(r["mAP"], 0.3, atol=1e-9)

    def test_unlabeled_gt_is_ignored(self):
        """A GT with no labeled keypoints is an ignore region: a detection
        near it is absorbed, AP stays 1.0 from the labeled GT."""
        gkp = np.zeros((2, 17, 3))
        gkp[0, 0] = [10.0, 10.0, 2]
        # gt 1: all v=0
        gt = [{"boxes": np.array([box(0, 0, 20, 20), box(100, 100, 20, 20)]),
               "labels": np.array([1, 1]), "keypoints": gkp,
               "areas": np.array([400.0, 400.0])}]
        pkp = np.zeros((2, 17, 3))
        pkp[0, 0] = [10.0, 10.0, 2]
        # det 1: every keypoint inside the unlabeled gt's widened box (the
        # k1==0 OKS path scores ALL keypoints against the box region)
        pkp[1, :, 0] = 110.0
        pkp[1, :, 1] = 110.0
        pkp[1, :, 2] = 2
        pred = [{"boxes": gt[0]["boxes"].copy(),
                 "scores": np.array([0.9, 0.95]),
                 "labels": np.array([1, 1]), "keypoints": pkp}]
        r = compute_map(pred, gt, iou_type="keypoints")
        assert r["mAP"] == 1.0
