"""COCO data pipeline + evaluation (reference maskrcnn_benchmark/data/**):
dataset loading/remapping/fixed-shape targets, distributed sharding,
aspect-grouped batching, iteration cycling, and the numpy COCO mAP."""

import json
import os

import numpy as np
import pytest

from vido_slam_tpu.data import (
    CocoDetectionDataset,
    coco_map,
    grouped_batches,
    iteration_batches,
    shard_epoch,
)

# engine-plumbing tests use a 4-block 64-ch backbone: a full R-50 grad
# program per virtual device starves the single-core host's collective
# rendezvous past its fatal timeout (R-50 forward parity is covered in
# test_maskrcnn/test_net_parity)
from vido_slam_tpu.models.maskrcnn.backbone import ResNetConfig as _RC
TINY_RESNET = _RC(stage_blocks=(1, 1, 1, 1), out_channels=64)



@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    sizes = [(120, 160), (160, 120), (96, 128), (128, 96), (100, 100),
             (140, 180)]
    for i, (h, w) in enumerate(sizes):
        name = f"img{i}.npy"
        np.save(os.path.join(root, name),
                (rng.rand(h, w, 3) * 255).astype(np.float32))
        images.append({"id": i + 10, "file_name": name,
                       "height": h, "width": w})
        # image 4 (id 14): only a degenerate box -> must be dropped
        if i == 4:
            annotations.append({
                "id": aid, "image_id": i + 10, "category_id": 7,
                "bbox": [10, 10, 1, 1], "iscrowd": 0})
            aid += 1
            continue
        for _ in range(rng.randint(1, 4)):
            x, y = rng.randint(0, w // 2), rng.randint(0, h // 2)
            bw, bh = rng.randint(8, w // 2), rng.randint(8, h // 2)
            annotations.append({
                "id": aid, "image_id": i + 10,
                "category_id": int(rng.choice([3, 7, 21])),
                "bbox": [int(x), int(y), int(bw), int(bh)], "iscrowd": 0})
            aid += 1
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 3, "name": "car"}, {"id": 7, "name": "truck"},
                       {"id": 21, "name": "cow"}],
    }
    ann_file = os.path.join(root, "instances.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return str(root), ann_file


class TestCocoDataset:
    def test_load_filter_remap(self, coco_dir):
        root, ann_file = coco_dir
        ds = CocoDetectionDataset(ann_file, root, input_hw=(128, 192),
                                  max_boxes=8)
        # image 14 (degenerate-only) dropped (coco.py has_valid_annotation)
        assert 14 not in ds.ids and len(ds.ids) == 5
        # contiguous remap 1..3 sorted by json id (coco.py:60-65)
        assert ds.json_category_id_to_contiguous_id == {3: 1, 7: 2, 21: 3}

    def test_fixed_shape_sample(self, coco_dir):
        root, ann_file = coco_dir
        ds = CocoDetectionDataset(ann_file, root, input_hw=(128, 192),
                                  max_boxes=8, subtract_mean=False)
        s = ds[0]
        assert s.image.shape == (128, 192, 3)
        assert s.boxes.shape == (8, 4) and s.valid.dtype == bool
        # boxes scaled onto the canvas and within it
        assert float(s.boxes[s.valid].max()) <= 192
        n = int(s.valid.sum())
        assert (s.labels[:n] > 0).all() and (s.labels[n:] == 0).all()
        # aspect preserved: scale = min over both axes
        H0, W0 = s.orig_hw
        assert s.scale == pytest.approx(min(128 / H0, 192 / W0))

    def test_batch_stacking(self, coco_dir):
        root, ann_file = coco_dir
        ds = CocoDetectionDataset(ann_file, root, input_hw=(96, 128),
                                  max_boxes=8, subtract_mean=False)
        b = ds.batch([0, 1, 2])
        assert b["image"].shape == (3, 96, 128, 3)
        assert b["boxes"].shape == (3, 8, 4)


class TestKeypointDataPath:
    """Keypoint annotations through loader -> head -> OKS eval (reference
    structures/keypoint.py + roi_heads/keypoint_head + COCOeval kpts)."""

    @pytest.fixture(scope="class")
    def kp_dir(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("coco_kp")
        rng = np.random.RandomState(1)
        h, w = 100, 140
        np.save(os.path.join(root, "im.npy"),
                (rng.rand(h, w, 3) * 255).astype(np.float32))
        kps = []
        for k in range(17):
            kps += [20.0 + 4 * k, 30.0 + (k % 5), 2]
        ann = {
            "images": [{"id": 1, "file_name": "im.npy",
                        "height": h, "width": w}],
            "annotations": [{
                "id": 1, "image_id": 1, "category_id": 1,
                "bbox": [15, 20, 80, 30], "iscrowd": 0,
                "keypoints": kps, "num_keypoints": 17}],
            "categories": [{"id": 1, "name": "person"}],
        }
        ann_file = os.path.join(root, "kp.json")
        with open(ann_file, "w") as f:
            json.dump(ann, f)
        return str(root), ann_file

    def test_loader_scales_keypoints(self, kp_dir):
        root, ann_file = kp_dir
        ds = CocoDetectionDataset(ann_file, root, input_hw=(200, 280),
                                  max_boxes=4, subtract_mean=False)
        s = ds[0]
        assert s.keypoints is not None and s.keypoints.shape == (4, 17, 3)
        assert s.scale == pytest.approx(2.0)
        np.testing.assert_allclose(s.keypoints[0, 0], [40.0, 60.0, 2.0])
        # padded slots stay zero (v == 0 -> unlabeled)
        assert (s.keypoints[1:] == 0).all()
        b = ds.batch([0])
        assert b["keypoints"].shape == (1, 4, 17, 3)

    def test_head_to_oks_eval(self, kp_dir):
        """Head inference on the GT box + OKS eval wiring: heatmap peaks
        planted at the GT keypoints score mAP 1.0 through
        compute_map(iou_type='keypoints')."""
        import jax.numpy as jnp

        from vido_slam_tpu.data.coco_eval import compute_map
        from vido_slam_tpu.models.maskrcnn.keypoint_head import (
            HEATMAP, keypoints_from_heatmaps)

        root, ann_file = kp_dir
        ds = CocoDetectionDataset(ann_file, root, input_hw=(200, 280),
                                  max_boxes=4, subtract_mean=False)
        s = ds[0]
        box = s.boxes[0]
        # plant a peak per keypoint at the GT location inside the box grid
        x0, y0, x1, y1 = box
        logits = np.full((1, HEATMAP, HEATMAP, 17), -5.0, np.float32)
        for k in range(17):
            gx, gy = s.keypoints[0, k, :2]
            cx = int((gx - x0) / max(x1 - x0, 1e-6) * HEATMAP)
            cy = int((gy - y0) / max(y1 - y0, 1e-6) * HEATMAP)
            logits[0, min(cy, HEATMAP - 1), min(cx, HEATMAP - 1), k] = 5.0
        out = keypoints_from_heatmaps(jnp.asarray(logits),
                                      jnp.asarray(box[None]))
        xy = np.asarray(out.xy)[0]
        # cell-center quantisation: within one heatmap cell of the GT
        cell = max((x1 - x0) / HEATMAP, (y1 - y0) / HEATMAP)
        assert np.max(np.abs(xy - s.keypoints[0, :, :2])) <= cell
        pred_kp = np.concatenate([xy, np.full((17, 1), 2.0)], axis=1)
        r = compute_map(
            [{"boxes": box[None], "scores": np.array([0.9]),
              "labels": np.array([1]), "keypoints": pred_kp[None]}],
            [{"boxes": box[None], "labels": np.array([1]),
              "keypoints": s.keypoints[:1]}],
            iou_type="keypoints")
        assert r["mAP"] == 1.0


class TestSamplers:
    def test_shard_epoch_disjoint_complete(self):
        shards = [shard_epoch(10, 4, r, shuffle=True, seed=3)
                  for r in range(4)]
        assert all(len(s) == 3 for s in shards)   # ceil(10/4)
        flat = np.concatenate(shards)
        # padded by wrap-around; every sample appears at least once
        assert set(flat.tolist()) == set(range(10))
        # deterministic for a fixed seed
        again = shard_epoch(10, 4, 2, shuffle=True, seed=3)
        np.testing.assert_array_equal(shards[2], again)

    def test_grouped_batches_single_aspect_group(self):
        ar = [1.5, 0.7, 1.2, 0.8, 1.1, 0.9]
        batches = grouped_batches(ar, np.arange(6), batch_size=2)
        for b in batches:
            g = [ar[i] >= 1.0 for i in b]
            assert all(g) or not any(g)
        assert sorted(int(i) for b in batches for i in b) == list(range(6))

    def test_iteration_batches_cycles(self):
        batches = [np.array([0, 1]), np.array([2, 3])]
        out = list(iteration_batches(batches, num_iterations=5))
        assert len(out) == 5
        np.testing.assert_array_equal(out[4], batches[0])


class TestCocoMap:
    def test_perfect_predictions(self):
        gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40.0]]),
               "labels": np.array([1, 2])}]
        pred = [{"boxes": gt[0]["boxes"].copy(),
                 "labels": gt[0]["labels"].copy(),
                 "scores": np.array([0.9, 0.8])}]
        m = coco_map(pred, gt)
        assert m["mAP"] == pytest.approx(1.0)
        assert m["AP50"] == pytest.approx(1.0)

    def test_miss_and_false_positive(self):
        gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40.0]]),
               "labels": np.array([1, 1])}]
        # one exact hit ranked first, one far-off false positive
        pred = [{"boxes": np.array([[0, 0, 10, 10], [60, 60, 70, 70.0]]),
                 "labels": np.array([1, 1]),
                 "scores": np.array([0.9, 0.8])}]
        m = coco_map(pred, gt)
        # recall caps at 0.5 with precision 1 up to that point:
        # 101-pt AP ~= 51/101
        assert m["AP50"] == pytest.approx(51 / 101, abs=1e-6)

    def test_localization_quality_resolved_by_higher_thresholds(self):
        gt = [{"boxes": np.array([[0, 0, 100, 100.0]]),
               "labels": np.array([1])}]
        # IoU ~ 0.6: counts at 0.5, not at 0.75
        pred = [{"boxes": np.array([[0, 0, 80, 90.0]]),
                 "labels": np.array([1]), "scores": np.array([0.9])}]
        m = coco_map(pred, gt)
        assert m["AP50"] == pytest.approx(1.0)
        assert m["AP75"] == pytest.approx(0.0)
        assert 0.0 < m["mAP"] < 1.0

    def test_score_ranking_matters(self):
        gt = [{"boxes": np.array([[0, 0, 10, 10.0]]),
               "labels": np.array([1])}]
        # bad box ranked ABOVE the good one: precision at the hit is 1/2
        pred = [{"boxes": np.array([[50, 50, 60, 60], [0, 0, 10, 10.0]]),
                 "labels": np.array([1, 1]),
                 "scores": np.array([0.9, 0.8])}]
        m = coco_map(pred, gt)
        assert m["AP50"] == pytest.approx(0.5, abs=0.01)


class TestPolygonMasks:
    def test_rasterize_square(self):
        from vido_slam_tpu.data.coco import rasterize_polygons
        # axis-aligned square covering [10,30)x[10,30) in a 40x40 image
        poly = [[10, 10, 30, 10, 30, 30, 10, 30]]
        m = rasterize_polygons(poly, (40, 40), (40, 40))
        assert m[20, 20] == 1.0 and m[5, 5] == 0.0 and m[35, 35] == 0.0
        assert abs(m.sum() - 400) < 50

    def test_dataset_masks(self, coco_dir):
        root, ann_file = coco_dir
        ds = CocoDetectionDataset(ann_file, root, input_hw=(64, 96),
                                  max_boxes=8, mask_hw=(32, 48),
                                  subtract_mean=False)
        s = ds[0]
        assert s.masks.shape == (8, 32, 48)
        n = int(s.valid.sum())
        # each valid box's (box-filled fallback) mask overlaps its box
        for i in range(n):
            assert s.masks[i].sum() > 0


@pytest.mark.slow
class TestEngineIntegration:
    """Data pipeline -> dp-sharded engine on the 8-device CPU mesh: one
    detection train step on loaded batches (engine/trainer.py counterpart)
    and sharded inference + COCO mAP (engine/inference.py +
    coco_eval counterpart)."""

    def test_train_step_on_loaded_batch(self, coco_dir):
        import jax
        import jax.numpy as jnp
        from vido_slam_tpu.models.maskrcnn.model import (
            MaskRCNNConfig, init_maskrcnn_params)
        from vido_slam_tpu.parallel.mesh import make_mesh
        from vido_slam_tpu.parallel.train import make_detection_train_step

        root, ann_file = coco_dir
        ds = CocoDetectionDataset(ann_file, root, input_hw=(64, 96),
                                  max_boxes=8, mask_hw=(32, 48))
        # dp=2/tp=1: a detection-grad program per device already starves the
        # single-core host's collective rendezvous at 8 virtual devices
        # (observed fatal XLA abort); 2 devices exercise the same GSPMD psum
        mesh = make_mesh(2, dp=2, tp=1)
        cfg = MaskRCNNConfig(resnet=TINY_RESNET, input_h=64, input_w=96)
        params = init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
        import optax
        from vido_slam_tpu.parallel.train import make_optimizer
        opt_state = make_optimizer().init(params)

        idx = shard_epoch(len(ds), 1, 0, shuffle=True, seed=0)
        batches = grouped_batches([ds.aspect_ratio(i) for i in range(len(ds))],
                                  idx, batch_size=4)
        b = ds.batch(np.resize(batches[0], 2))  # pad to the dp batch
        batch = {
            "image": jnp.asarray(b["image"]),
            "targets": {
                "boxes": jnp.asarray(b["boxes"]),
                "labels": jnp.asarray(b["labels"]),
                "masks": jnp.asarray(b["masks"]),
                "valid": jnp.asarray(b["valid"]),
            },
        }
        step = make_detection_train_step(mesh, cfg, lr=1e-4)
        with mesh:
            params2, opt_state, loss = step(params, opt_state, batch,
                                            jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        changed = any(
            not np.allclose(np.asarray(params[k]), np.asarray(params2[k]))
            for k in list(params)[:20]
        )
        assert changed

    def test_sharded_inference_to_coco_map(self, coco_dir):
        """Sharded predict -> gather -> FULL COCO protocol (bbox + segm),
        and parity with the single-device path on the same inputs
        (engine/inference.py:11-86 counterpart, VERDICT r3 item 6)."""
        import jax
        import jax.numpy as jnp
        from vido_slam_tpu.models.maskrcnn.model import (
            MaskRCNNConfig, init_maskrcnn_params, maskrcnn_inference)
        from vido_slam_tpu.parallel.eval import (
            predictions_from_output, sharded_coco_evaluation)
        from vido_slam_tpu.parallel.mesh import make_mesh

        root, ann_file = coco_dir
        ds = CocoDetectionDataset(ann_file, root, input_hw=(64, 96),
                                  max_boxes=8, mask_hw=(64, 96))
        mesh = make_mesh(2, dp=2, tp=1)  # see train-step test: rendezvous load
        cfg = MaskRCNNConfig(resnet=TINY_RESNET, input_h=64, input_w=96)
        params = init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
        b = ds.batch(np.resize(np.arange(len(ds)), 2))
        gts = []
        for i in range(2):
            gv = b["valid"][i]
            gts.append({"boxes": b["boxes"][i][gv],
                        "labels": b["labels"][i][gv],
                        "masks": np.asarray(b["masks"][i][gv]) > 0.5})
        m = sharded_coco_evaluation(
            mesh, params, jnp.asarray(b["image"]), cfg, gts)
        # random weights -> no requirement on value, only on protocol shape
        assert set(m) == {"bbox", "segm"}
        for t in ("bbox", "segm"):
            assert set(m[t]) >= {"mAP", "AP50", "AP75", "APsmall",
                                 "APmedium", "APlarge", "AR100",
                                 "per_category"}

        # multi-chip eval == single-device eval on the same inputs
        single = [maskrcnn_inference(params, b["image"][i][None], cfg)
                  for i in range(2)]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *single)
        preds1 = predictions_from_output(stacked, (64, 96))
        m1 = {t: coco_map(preds1, gts, iou_type=t)
              for t in ("bbox", "segm")}
        for t in ("bbox", "segm"):
            for k in ("mAP", "AP50", "AP75"):
                a, bb = m[t][k], m1[t][k]
                assert (np.isnan(a) and np.isnan(bb)) or abs(a - bb) < 1e-9, \
                    (t, k, a, bb)
