import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vido_slam_tpu.frontend.features import (
    gather_bilinear,
    gather_nearest,
    propagate_features,
    sample_background_features,
    sample_object_points,
)
from vido_slam_tpu.frontend.objects import (
    ObjectTracker,
    assign_point_labels,
    compute_object_stats,
)
from vido_slam_tpu.frontend.sceneflow import scene_flow_world, unproject_to_world
from vido_slam_tpu.geometry import se3, so3
from vido_slam_tpu.geometry.camera import Camera

H, W = 96, 128


def toy_inputs(obj_box=None, obj_label=2, depth_val=10.0):
    mask = jnp.zeros((H, W), jnp.int32)
    if obj_box is not None:
        r0, r1, c0, c1 = obj_box
        mask = mask.at[r0:r1, c0:c1].set(obj_label)
    depth = jnp.full((H, W), depth_val, jnp.float32)
    flow = jnp.ones((H, W, 2), jnp.float32) * 2.0
    return mask, depth, flow


class TestGather:
    def test_nearest(self):
        img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
        uv = jnp.array([[3.4, 2.6], [0.0, 0.0]])
        out = gather_nearest(img, uv)
        np.testing.assert_allclose(out, [3 * W + 3, 0.0])

    def test_bilinear(self):
        img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
        uv = jnp.array([[3.5, 2.0]])
        np.testing.assert_allclose(gather_bilinear(img, uv), [2 * W + 3.5])


class TestBackgroundSampling:
    def test_respects_mask_and_depth(self):
        mask, depth, flow = toy_inputs(obj_box=(0, H, 0, 64))
        depth = depth.at[:, 100:].set(0.0)  # invalid depth region
        fs = sample_background_features(
            jax.random.PRNGKey(0), mask, depth, flow, n=500, th_depth=80.0
        )
        sel = np.asarray(fs.uv[np.asarray(fs.valid)])
        assert sel.shape[0] > 0
        assert np.all(sel[:, 0] >= 64)   # not in masked region
        assert np.all(sel[:, 0] < 100)   # not in invalid-depth region

    def test_valid_count_limited_by_eligible(self):
        mask, depth, flow = toy_inputs()
        mask = mask.at[:, :].set(1).at[:2, :8].set(0)  # only 16 eligible px
        fs = sample_background_features(
            jax.random.PRNGKey(1), mask, depth, flow, n=100
        )
        assert int(jnp.sum(fs.valid)) == 16

    def test_stratification_spreads_points(self):
        mask, depth, flow = toy_inputs()
        fs = sample_background_features(
            jax.random.PRNGKey(2), mask, depth, flow, n=400, grid=4
        )
        sel = np.asarray(fs.uv[np.asarray(fs.valid)])
        # every quadrant should get a decent share
        qcounts = np.histogram2d(sel[:, 1], sel[:, 0], bins=2)[0]
        assert qcounts.min() > 40

    def test_flow_target_in_bounds(self):
        mask, depth, flow = toy_inputs()
        flow = flow.at[:, :, 0].set(1000.0)  # all targets fly out
        fs = sample_background_features(jax.random.PRNGKey(3), mask, depth, flow, n=50)
        assert int(jnp.sum(fs.valid)) == 0


class TestObjectSampling:
    def test_strided_object_points(self):
        mask, depth, flow = toy_inputs(obj_box=(16, 48, 32, 96), obj_label=5)
        fs = sample_object_points(mask, depth, flow, n=1000, step=4, th_depth=60.0)
        nv = int(jnp.sum(fs.valid))
        assert nv == (48 - 16) // 4 * (96 - 32) // 4
        sel_uv = np.asarray(fs.uv[np.asarray(fs.valid)])
        assert np.all(sel_uv[:, 0] % 4 == 0)
        assert np.all((sel_uv[:, 0] >= 32) & (sel_uv[:, 0] < 96))
        assert np.all(np.asarray(fs.sem[np.asarray(fs.valid)]) == 5)

    def test_budget_cap(self):
        mask, depth, flow = toy_inputs(obj_box=(0, H, 0, W))
        fs = sample_object_points(mask, depth, flow, n=64, step=4)
        assert int(jnp.sum(fs.valid)) == 64


class TestPropagation:
    def test_propagate_moves_and_rereads(self):
        mask, depth, flow = toy_inputs(obj_box=(0, 48, 0, W), obj_label=7)
        fs = sample_object_points(mask, depth, flow, n=200, step=8)
        new_depth = jnp.full((H, W), 20.0)
        new_mask = jnp.full((H, W), 9, jnp.int32)
        new_flow = jnp.zeros((H, W, 2))
        fs2 = propagate_features(fs, new_depth, new_mask, new_flow)
        v = np.asarray(fs2.valid)
        np.testing.assert_allclose(
            np.asarray(fs2.uv)[v], np.asarray(fs.uv)[v] + 2.0
        )
        assert np.all(np.asarray(fs2.depth)[v] == 20.0)
        assert np.all(np.asarray(fs2.sem)[v] == 9)

    def test_out_of_bounds_invalidated(self):
        mask, depth, flow = toy_inputs()
        flow = flow.at[...].set(0.0).at[:, W - 8 :, 0].set(50.0)
        fs = sample_background_features(jax.random.PRNGKey(4), mask, depth, flow, n=3000)
        # all features valid pre-propagation (targets of sampled feats in bounds)
        fs2 = propagate_features(fs, depth, mask, flow)
        assert bool(jnp.all(fs2.uv[fs2.valid, 0] <= W - 1))


class TestSceneFlow:
    def test_static_points_zero_flow(self):
        cam = Camera.create(fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=W, height=H)
        uv = jnp.array([[30.0, 40.0], [80.0, 20.0]])
        d = jnp.array([10.0, 15.0])
        T1 = jnp.eye(4)
        # camera moves; static world points project elsewhere but unproject to
        # the same world position
        T2 = se3.make_se3(so3.exp_so3(jnp.array([0.0, 0.05, 0.0])), jnp.array([0.2, 0.0, 0.1]))
        Xw = unproject_to_world(cam, uv, d, T1)
        pc2 = se3.transform_points(T2, Xw)
        uv2 = cam.project(pc2)
        d2 = pc2[:, 2]
        f3d, sfn, ok = scene_flow_world(
            cam, uv, d, T1, uv2, d2, T2,
            jnp.array([1, 1]), jnp.array([1, 1]), jnp.array([True, True]),
        )
        np.testing.assert_allclose(np.asarray(f3d), 0.0, atol=1e-4)
        assert np.all(np.asarray(ok))

    def test_moving_point_flow(self):
        cam = Camera.create(fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=W, height=H)
        uv = jnp.array([[64.0, 48.0]])
        d = jnp.array([10.0])
        T = jnp.eye(4)
        Xw = unproject_to_world(cam, uv, d, T)
        Xw2 = Xw + jnp.array([1.0, 0.5, -0.3])
        uv2 = cam.project(Xw2)
        f3d, sfn, ok = scene_flow_world(
            cam, uv, d, T, uv2, Xw2[:, 2], T,
            jnp.array([1]), jnp.array([1]), jnp.array([True]),
        )
        np.testing.assert_allclose(np.asarray(f3d)[0], [1.0, 0.5, -0.3], atol=1e-4)
        # xz-norm only (Tracking.cc:1746)
        np.testing.assert_allclose(np.asarray(sfn)[0], np.hypot(1.0, 0.3), atol=1e-4)

    def test_sem_zero_invalidates(self):
        cam = Camera.create(fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=W, height=H)
        uv = jnp.array([[64.0, 48.0]])
        d = jnp.array([10.0])
        _, _, ok = scene_flow_world(
            cam, uv, d, jnp.eye(4), uv, d, jnp.eye(4),
            jnp.array([0]), jnp.array([1]), jnp.array([True]),
        )
        assert not bool(ok[0])


def make_points(n, sem_val, uv_center, sf, depth=10.0, sem_prev=None):
    uv = jnp.tile(jnp.asarray(uv_center, jnp.float32), (n, 1))
    return dict(
        uv=uv,
        sem=jnp.full((n,), sem_val, jnp.int32),
        sem_prev=jnp.full((n,), sem_val if sem_prev is None else sem_prev, jnp.int32),
        sf_norm=jnp.full((n,), sf, jnp.float32),
        depth=jnp.full((n,), depth, jnp.float32),
        valid=jnp.ones(n, bool),
    )


def cat_points(*groups):
    return {k: jnp.concatenate([g[k] for g in groups]) for k in groups[0]}


class TestObjectStats:
    def kw(self):
        return dict(height=H, width=W, sf_mg_thres=0.12, sf_ds_thres=0.3, th_depth_obj=60.0)

    def test_dynamic_object_tracked(self):
        pts = make_points(200, 3, (64, 48), sf=1.0)
        stats = compute_object_stats(**pts, **self.kw())
        assert bool(stats.is_tracked[3])
        assert not bool(stats.is_static[3])

    def test_static_object(self):
        pts = make_points(200, 3, (64, 48), sf=0.01)
        stats = compute_object_stats(**pts, **self.kw())
        assert bool(stats.is_static[3])
        assert not bool(stats.is_tracked[3])

    def test_small_object_rejected(self):
        pts = make_points(100, 3, (64, 48), sf=1.0)  # < 150 points
        stats = compute_object_stats(**pts, **self.kw())
        assert bool(stats.is_rejected[3])

    def test_far_object_rejected(self):
        pts = make_points(200, 3, (64, 48), sf=1.0, depth=70.0)
        stats = compute_object_stats(**pts, **self.kw())
        assert bool(stats.is_rejected[3])

    def test_boundary_object_rejected(self):
        pts = make_points(200, 3, (5, 5), sf=1.0)  # on the corner
        stats = compute_object_stats(**pts, **self.kw())
        assert bool(stats.is_boundary[3])

    def test_point_labels(self):
        dyn = make_points(200, 3, (64, 48), sf=1.0)
        stat = make_points(200, 4, (40, 40), sf=0.01)
        pts = cat_points(dyn, stat)
        stats = compute_object_stats(**pts, **self.kw())
        tracker = ObjectTracker()
        bin_ids, objs = tracker.assign_ids(stats)
        labels = assign_point_labels(pts["sem"], pts["valid"], stats, jnp.asarray(bin_ids))
        lab = np.asarray(labels)
        assert np.all(lab[:200] == objs[0].track_id)
        assert np.all(lab[200:] == 0)

    def test_id_inheritance_across_frames(self):
        tracker = ObjectTracker()
        # frame 1: object with sem value 3
        pts1 = make_points(200, 3, (64, 48), sf=1.0)
        stats1 = compute_object_stats(**pts1, **self.kw())
        _, objs1 = tracker.assign_ids(stats1)
        tid = objs1[0].track_id
        # frame 2: same object now has sem value 5, but its points carry
        # prev-frame label 3
        pts2 = make_points(200, 5, (64, 48), sf=1.0, sem_prev=3)
        stats2 = compute_object_stats(**pts2, **self.kw())
        _, objs2 = tracker.assign_ids(stats2)
        assert objs2[0].track_id == tid

    def test_new_id_when_no_match(self):
        tracker = ObjectTracker()
        pts1 = make_points(200, 3, (64, 48), sf=1.0)
        tracker.assign_ids(compute_object_stats(**pts1, **self.kw()))
        pts2 = make_points(200, 5, (64, 48), sf=1.0, sem_prev=7)
        _, objs2 = tracker.assign_ids(compute_object_stats(**pts2, **self.kw()))
        assert objs2[0].track_id == 2

    def test_failed_object_not_inherited(self):
        tracker = ObjectTracker()
        pts1 = make_points(200, 3, (64, 48), sf=1.0)
        tracker.assign_ids(compute_object_stats(**pts1, **self.kw()))
        tracker.mark_failed(3)
        pts2 = make_points(200, 5, (64, 48), sf=1.0, sem_prev=3)
        _, objs2 = tracker.assign_ids(compute_object_stats(**pts2, **self.kw()))
        assert objs2[0].track_id == 2  # new id, not inherited


class TestUpdateMask:
    def test_recovers_lost_object(self):
        from vido_slam_tpu.frontend.association import update_mask
        import jax.numpy as jnp

        last = jnp.zeros((H, W), jnp.int32).at[20:40, 30:60].set(5)
        flow = jnp.zeros((H, W, 2)).at[20:40, 30:60, 0].set(4.0)
        cur = jnp.zeros((H, W), jnp.int32)
        out = np.asarray(update_mask(cur, last, flow))
        assert (out == 5).sum() > 0.9 * (20 * 30)
        # shifted right by 4: columns [34, 64)
        assert out[30, 31] == 0 and out[30, 40] == 5

    def test_does_not_overwrite_detections(self):
        from vido_slam_tpu.frontend.association import update_mask
        import jax.numpy as jnp

        last = jnp.zeros((H, W), jnp.int32).at[20:40, 30:60].set(5)
        flow = jnp.zeros((H, W, 2))
        cur = jnp.zeros((H, W), jnp.int32).at[20:40, 30:60].set(7)
        out = np.asarray(update_mask(cur, last, flow))
        assert (out == 5).sum() == 0  # 7 has pixels, 5's region occupied

    def test_present_label_not_propagated(self):
        from vido_slam_tpu.frontend.association import update_mask
        import jax.numpy as jnp

        last = jnp.zeros((H, W), jnp.int32).at[20:40, 30:60].set(5)
        flow = jnp.zeros((H, W, 2)).at[:, :, 0].set(10.0)
        cur = jnp.zeros((H, W), jnp.int32).at[50:60, 50:60].set(5)
        out = np.asarray(update_mask(cur, last, flow))
        np.testing.assert_array_equal(out, np.asarray(cur))

    def test_small_region_not_recovered(self):
        from vido_slam_tpu.frontend.association import update_mask
        import jax.numpy as jnp

        last = jnp.zeros((H, W), jnp.int32).at[20:25, 30:35].set(5)  # 25 px
        flow = jnp.zeros((H, W, 2))
        cur = jnp.zeros((H, W), jnp.int32)
        out = np.asarray(update_mask(cur, last, flow))
        assert (out == 5).sum() == 0

pytestmark = pytest.mark.slow  # heavy jit: full tier only
