"""MonoDepth2 self-supervised training (models/monodepth2_train.py) vs the
reference's vendored trainer semantics
(mono_depth2/src/depricated/{trainer,evaluate_depth}.py, src/layers.py).

Layer parity runs against the REFERENCE torch source executed from
/root/reference; the training-loop tests are synthetic-scene convergence
checks (slow tier).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests._ref_import import import_ref_module
from vido_slam_tpu.models.monodepth2_train import (
    SelfSupBatch,
    compute_depth_errors,
    evaluate_depth,
    get_smooth_loss,
    grid_sample_border,
    init_selfsup_params,
    predict_pose,
    project_warp,
    reprojection_loss,
    selfsup_loss,
    ssim,
    transformation_from_parameters,
)


def ref_layers():
    return import_ref_module(
        "ref_md2_layers", "mono_depth2/src/layers.py",
        syspaths=["mono_depth2/src"])


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


class TestLayerParity:
    def test_ssim_matches_reference(self):
        layers = ref_layers()
        torch.manual_seed(0)
        x = torch.rand(2, 3, 16, 20)
        y = torch.rand(2, 3, 16, 20)
        ref = layers.SSIM()(x, y)
        ours = ssim(jnp.asarray(to_nhwc(x)), jnp.asarray(to_nhwc(y)))
        np.testing.assert_allclose(to_nhwc(ref), np.asarray(ours),
                                   rtol=1e-5, atol=1e-6)

    def test_smooth_loss_matches_reference(self):
        layers = ref_layers()
        torch.manual_seed(1)
        disp = torch.rand(2, 1, 12, 16)
        img = torch.rand(2, 3, 12, 16)
        ref = layers.get_smooth_loss(disp, img).item()
        ours = float(get_smooth_loss(
            jnp.asarray(to_nhwc(disp)), jnp.asarray(to_nhwc(img))))
        assert abs(ref - ours) < 1e-6

    @pytest.mark.parametrize("invert", [False, True])
    def test_transformation_from_parameters(self, invert):
        layers = ref_layers()
        torch.manual_seed(2)
        aa = torch.randn(4, 1, 3) * 0.3
        tt = torch.randn(4, 1, 3)
        ref = layers.transformation_from_parameters(aa, tt, invert)
        ours = transformation_from_parameters(
            jnp.asarray(aa[:, 0].numpy()), jnp.asarray(tt[:, 0].numpy()),
            invert)
        np.testing.assert_allclose(ref.numpy(), np.asarray(ours),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_transformation_invert_is_inverse(self):
        aa = jnp.asarray([[0.2, -0.1, 0.3]])
        tt = jnp.asarray([[0.5, 1.0, -2.0]])
        T = transformation_from_parameters(aa, tt, False)
        Ti = transformation_from_parameters(aa, tt, True)
        np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4)[None],
                                   atol=1e-6)

    @pytest.mark.slow
    def test_grid_sample_border_matches_torch(self):
        torch.manual_seed(3)
        img = torch.rand(2, 3, 10, 14)
        grid = (torch.rand(2, 10, 14, 2) * 2.4) - 1.2   # includes OOB
        ref = torch.nn.functional.grid_sample(
            img, grid, mode="bilinear", padding_mode="border",
            align_corners=True)
        ours = grid_sample_border(
            jnp.asarray(to_nhwc(img)), jnp.asarray(grid.numpy()))
        np.testing.assert_allclose(to_nhwc(ref), np.asarray(ours),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_backproject_project_identity_pose(self):
        """With T=I the warp must reproduce the source exactly (interior)."""
        H, W = 16, 24
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
        depth = jnp.ones((1, H, W)) * 5.0
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 20.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        inv_K = np.linalg.inv(K)
        out = project_warp(src, depth, jnp.asarray(K)[None],
                           jnp.asarray(inv_K)[None], jnp.eye(4)[None])
        np.testing.assert_allclose(np.asarray(out), np.asarray(src), atol=1e-5)

    @pytest.mark.slow
    def test_reprojection_loss_zero_for_identical(self):
        img = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 3)
                          .astype(np.float32))
        r = reprojection_loss(img, img)
        assert float(jnp.max(jnp.abs(r))) < 1e-6


class TestDepthMetrics:
    def test_compute_errors_matches_reference(self):
        """Expected values re-derived with numpy per the evaluate_depth.py
        compute_errors formulas (:27-45; the module itself imports cv2 and
        its dataset stack, so it is not importable here)."""
        rng = np.random.RandomState(0)
        gt = rng.uniform(1.0, 50.0, (500,)).astype(np.float64)
        pred = gt * rng.uniform(0.7, 1.4, (500,))
        thresh = np.maximum(gt / pred, pred / gt)
        ref = {
            "abs_rel": np.mean(np.abs(gt - pred) / gt),
            "sq_rel": np.mean((gt - pred) ** 2 / gt),
            "rmse": np.sqrt(np.mean((gt - pred) ** 2)),
            "rmse_log": np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2)),
            "a1": (thresh < 1.25).mean(),
            "a2": (thresh < 1.25 ** 2).mean(),
            "a3": (thresh < 1.25 ** 3).mean(),
        }
        ours = compute_depth_errors(jnp.asarray(gt, jnp.float32),
                                    jnp.asarray(pred, jnp.float32))
        for k, r in ref.items():
            assert abs(float(r) - float(ours[k])) < 1e-4, k

    def test_evaluate_depth_median_scaling(self):
        """A prediction equal to gt up to a global scale scores ~perfectly
        under median scaling (the mono evaluation mode)."""
        rng = np.random.RandomState(2)
        gt = rng.uniform(2.0, 60.0, (32, 48)).astype(np.float32)
        disp = (1.0 / gt) * 3.7     # wrong global scale
        m = evaluate_depth(jnp.asarray(disp), jnp.asarray(gt))
        assert m["abs_rel"] < 1e-3
        assert m["a1"] > 0.999


class TestPoseEvaluation:
    """evaluate_pose.py counterpart (dump_xyz/compute_ate/snippet loop)."""

    def test_perfect_prediction_zero_ate(self):
        from vido_slam_tpu.models.monodepth2_train import (
            evaluate_pose_snippets,
        )
        rng = np.random.RandomState(0)
        rel = np.broadcast_to(np.eye(4), (12, 4, 4)).copy()
        rel[:, :3, 3] = rng.randn(12, 3) * 0.2
        mean, std, ates = evaluate_pose_snippets(rel, rel)
        assert mean < 1e-12 and std < 1e-12
        assert len(ates) == 12 - 5 + 2

    def test_global_scale_is_factored_out(self):
        from vido_slam_tpu.models.monodepth2_train import (
            evaluate_pose_snippets,
        )
        rng = np.random.RandomState(1)
        gt = np.broadcast_to(np.eye(4), (10, 4, 4)).copy()
        gt[:, :3, 3] = rng.randn(10, 3) * 0.3
        pred = gt.copy()
        pred[:, :3, 3] *= 2.4      # mono scale ambiguity
        mean, _, _ = evaluate_pose_snippets(pred, gt)
        assert mean < 1e-9

    def test_dump_xyz_accumulates(self):
        from vido_slam_tpu.models.monodepth2_train import dump_xyz
        step = np.eye(4)
        step[0, 3] = 1.0
        xyz = dump_xyz([step] * 3)
        np.testing.assert_allclose(xyz[:, 0], [0, 1, 2, 3], atol=1e-12)


class TestFlowToRgb:
    def test_shapes_and_zero_flow_is_white(self):
        from vido_slam_tpu.viz import flow_to_rgb
        img = flow_to_rgb(np.zeros((8, 10, 2), np.float32))
        assert img.shape == (8, 10, 3) and img.dtype == np.uint8
        assert (img == 255).all()    # zero magnitude -> zero saturation

    def test_directions_get_distinct_hues(self):
        from vido_slam_tpu.viz import flow_to_rgb
        flow = np.zeros((2, 2, 2), np.float32)
        flow[0, 0] = (5.0, 0.0)     # +x
        flow[0, 1] = (0.0, 5.0)     # +y
        flow[1, 0] = (-5.0, 0.0)    # -x
        img = flow_to_rgb(flow)      # min-max normalised saturation
        # +x is hue 0 at full saturation -> pure red
        assert img[0, 0, 0] == 255 and img[0, 0, 1] < 10
        colors = {tuple(img[0, 0]), tuple(img[0, 1]), tuple(img[1, 0])}
        assert len(colors) == 3
        # normalize=False keeps raw magnitude as saturation (run.py:160-162):
        # a magnitude-5 flow is a nearly unsaturated pixel
        raw = flow_to_rgb(flow, normalize=False)
        assert int(raw[0, 0].min()) >= 245
        # NaNs zeroed like the reference
        flow[1, 1] = (np.nan, np.nan)
        img2 = flow_to_rgb(flow)
        assert img2.dtype == np.uint8


def _make_scene(N=2, H=64, W=96, seed=0):
    """Textured fronto-parallel scene at varying depth, camera translating
    in x: prev/next are exact warps of the centre frame, so the photometric
    minimum is achievable at the true depth."""
    rng = np.random.RandomState(seed)
    base = rng.rand(N, H, W, 3).astype(np.float32)
    # smooth the texture (depthwise 5x5 box) so bilinear warps interpolate
    k = jnp.ones((5, 5, 1, 3)) / 25.0
    base = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(base), k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3))
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 40.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    inv_K = np.linalg.inv(K)
    depth = 8.0
    baseline = 0.4
    shift = K[0, 0] * baseline / depth  # px
    prev = np.roll(base, int(round(shift)), axis=2)
    nxt = np.roll(base, -int(round(shift)), axis=2)
    return SelfSupBatch(
        color=jnp.asarray(base), prev=jnp.asarray(prev), next=jnp.asarray(nxt),
        K=jnp.broadcast_to(jnp.asarray(K), (N, 4, 4)),
        inv_K=jnp.broadcast_to(jnp.asarray(inv_K), (N, 4, 4)),
    )


@pytest.mark.slow
class TestSelfSupTraining:
    def test_loss_finite_and_automask_helps(self):
        params = init_selfsup_params(jax.random.PRNGKey(0))
        batch = _make_scene()
        key = jax.random.PRNGKey(1)
        loss, aux = selfsup_loss(params, batch, key, scales=(0,))
        assert np.isfinite(float(loss))
        assert aux["depth"].shape == batch.color.shape[:3]
        loss_no_am, _ = selfsup_loss(params, batch, key, scales=(0,),
                                     automasking=False)
        # identity sources give the min an extra floor: automasked loss <=
        assert float(loss) <= float(loss_no_am) + 1e-6

    def test_adam_steps_reduce_loss(self):
        import optax

        params = init_selfsup_params(jax.random.PRNGKey(0))
        batch = _make_scene()
        opt = optax.adam(2e-4)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            def lf(p):
                l, _ = selfsup_loss(p, batch, key, scales=(0,))
                return l

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(2)
        losses = []
        for i in range(8):
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, k)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_pose_prediction_shapes(self):
        params = init_selfsup_params(jax.random.PRNGKey(0))
        batch = _make_scene()
        T = predict_pose(params, batch.prev, batch.color, True)
        assert T.shape == (2, 4, 4)
        # valid rigid transform: R orthonormal, last row [0,0,0,1]
        R = np.asarray(T[:, :3, :3])
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                                   np.broadcast_to(np.eye(3), (2, 3, 3)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(T[:, 3]),
                                   np.broadcast_to(np.asarray([0, 0, 0, 1.0]),
                                                   (2, 4)), atol=1e-7)

    def test_mesh_train_step(self):
        from vido_slam_tpu.models.monodepth2_train import (
            make_selfsup_train_step,
        )
        from vido_slam_tpu.parallel.mesh import make_mesh

        import optax

        # 4 devices: tp=2 param all-gathers through resnet grads already
        # stress the 1-core host's rendezvous at 8 virtual devices
        mesh = make_mesh(4, tp=2)
        dp = mesh.shape["dp"]
        params = init_selfsup_params(jax.random.PRNGKey(0))
        step = make_selfsup_train_step(mesh, lr=1e-4, scales=(0,))
        opt_state = optax.adam(1e-4).init(params)
        batch = _make_scene(N=dp, H=32, W=32)
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(3))
        assert np.isfinite(float(loss))
