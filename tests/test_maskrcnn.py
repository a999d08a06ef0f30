import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vido_slam_tpu.models.layers import convert_state_dict
from vido_slam_tpu.models.maskrcnn import (
    MaskRCNNConfig,
    init_maskrcnn_params,
    maskrcnn_inference,
)
from vido_slam_tpu.models.maskrcnn.backbone import (
    ResNetConfig,
    _bottleneck,
    fpn_forward,
    init_resnet_fpn_params,
    resnet_stages,
)
from vido_slam_tpu.models.maskrcnn.model import paste_semantic_mask
from vido_slam_tpu.models.maskrcnn.roi_heads import (
    _dense_deconv2x,
    assign_fpn_level,
)
from vido_slam_tpu.models.maskrcnn.rpn import generate_cell_anchors, grid_anchors


class TestAnchors:
    def test_cell_anchor_shapes_and_areas(self):
        cell = generate_cell_anchors(16, 128)
        assert cell.shape == (3, 4)
        for a, ratio in zip(cell, (0.5, 1.0, 2.0)):
            w = a[2] - a[0] + 1
            h = a[3] - a[1] + 1
            # areas approx 128^2, aspect approx ratio
            assert abs(w * h - 128 * 128) / (128 * 128) < 0.1
            assert abs(h / w - ratio) < 0.1

    def test_square_anchor_exact(self):
        # ratio 1: Detectron gives [x_c +- (size-1)/2]
        cell = generate_cell_anchors(16, 64)
        a = cell[1]
        np.testing.assert_allclose(a, [7.5 - 31.5, 7.5 - 31.5, 7.5 + 31.5, 7.5 + 31.5])

    def test_grid_anchors_layout(self):
        cell = generate_cell_anchors(4, 32)
        g = grid_anchors(2, 3, 4, cell)
        assert g.shape == (2 * 3 * 3, 4)
        # anchor-minor: first 3 rows are the cell anchors at shift (0,0)
        np.testing.assert_allclose(g[:3], cell)
        # next location is x-shift by stride
        np.testing.assert_allclose(g[3] - g[0], [4, 0, 4, 0])


class TestLevelAssign:
    def test_mapping(self):
        rois = jnp.asarray(
            [
                [0, 0, 55, 55],      # ~56 -> level 2 (idx 0)
                [0, 0, 111, 111],    # ~112 -> level 3 (idx 1)
                [0, 0, 223, 223],    # ~224 -> level 4 (idx 2)
                [0, 0, 447, 447],    # ~448 -> level 5 (idx 3)
                [0, 0, 1000, 1000],  # clamps to 3
            ],
            jnp.float32,
        )
        lv = np.asarray(assign_fpn_level(rois))
        assert list(lv) == [0, 1, 2, 3, 3]


class TestBottleneck:
    @pytest.mark.parametrize("stride_in_1x1", [True, False])
    def test_parity_with_torch(self, stride_in_1x1):
        torch.manual_seed(0)

        class TB(torch.nn.Module):
            def __init__(self):
                super().__init__()
                s1, s3 = (2, 1) if stride_in_1x1 else (1, 2)
                self.conv1 = torch.nn.Conv2d(32, 16, 1, s1, bias=False)
                self.bn1 = torch.nn.BatchNorm2d(16)
                self.conv2 = torch.nn.Conv2d(16, 16, 3, s3, 1, groups=4, bias=False)
                self.bn2 = torch.nn.BatchNorm2d(16)
                self.conv3 = torch.nn.Conv2d(16, 64, 1, bias=False)
                self.bn3 = torch.nn.BatchNorm2d(64)
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(32, 64, 1, 2, bias=False),
                    torch.nn.BatchNorm2d(64),
                )

            def forward(self, x):
                out = torch.relu(self.bn1(self.conv1(x)))
                out = torch.relu(self.bn2(self.conv2(out)))
                out = self.bn3(self.conv3(out))
                return torch.relu(out + self.downsample(x))

        m = TB()
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.uniform_(-0.5, 0.5)
                    mod.running_var.uniform_(0.5, 1.5)
        m.eval()
        x = torch.randn(1, 32, 8, 8)
        with torch.no_grad():
            want = m(x).numpy().transpose(0, 2, 3, 1)
        sd = {f"backbone.body.layer2.0.{k}": v for k, v in m.state_dict().items()}
        p = convert_state_dict(sd)
        got = _bottleneck(
            p, "backbone.body.layer2.0",
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 2, 4, stride_in_1x1,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestDeconv:
    def test_dense_deconv2x_parity(self):
        torch.manual_seed(1)
        m = torch.nn.ConvTranspose2d(8, 8, 2, 2, 0)
        x = torch.randn(1, 8, 5, 6)
        with torch.no_grad():
            want = m(x).numpy().transpose(0, 2, 3, 1)
        p = convert_state_dict({"w": m.state_dict()["weight"], "b": m.state_dict()["bias"]})
        got = _dense_deconv2x(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), p["w"], p["b"]
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestLinearConversion:
    def test_fc_parity(self):
        torch.manual_seed(2)
        m = torch.nn.Linear(12, 7)
        x = torch.randn(3, 12)
        with torch.no_grad():
            want = m(x).numpy()
        p = convert_state_dict(m.state_dict())
        got = jnp.asarray(x.numpy()) @ p["weight"] + p["bias"]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestEndToEnd:
    def test_full_inference_shapes(self):
        cfg = MaskRCNNConfig(input_h=128, input_w=160)
        p = init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 160, 3)) * 255
        out = maskrcnn_inference(p, img, cfg)
        assert out.boxes.shape == (100, 4)
        assert out.masks28.shape == (100, 28, 28)
        assert out.labels.shape == (100,)
        sem = paste_semantic_mask(out, 128, 160, 64, 80)
        assert sem.shape == (64, 80)
        assert sem.dtype == jnp.uint8

    def test_backbone_feature_shapes(self):
        cfg = ResNetConfig()
        p = init_resnet_fpn_params(jax.random.PRNGKey(2), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 96, 3))
        stages = resnet_stages(p, x, cfg)
        assert [s.shape[-1] for s in stages] == [256, 512, 1024, 2048]
        assert stages[0].shape[1:3] == (16, 24)
        fp = fpn_forward(p, stages)
        assert len(fp) == 5
        assert all(f.shape[-1] == 256 for f in fp)
        assert fp[0].shape[1:3] == (16, 24)
        assert fp[4].shape[1:3] == (1, 2)


class TestRetinaNet:
    def test_inference_shapes(self):
        from vido_slam_tpu.models.maskrcnn.backbone import ResNetConfig
        from vido_slam_tpu.models.maskrcnn.retinanet import (
            init_retinanet_params,
            retinanet_inference,
        )

        cfg = ResNetConfig()
        p = init_retinanet_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 160, 3)) * 255
        out = retinanet_inference(p, img, cfg, 128, 160)
        assert out.boxes.shape == (100, 4)
        assert out.labels.shape == (100,)
        assert bool(jnp.all(jnp.isfinite(out.boxes)))
        # prior-prob bias init keeps initial scores near 0.01 -> few detections
        assert int(out.valid.sum()) <= 100

    def test_focal_loss_properties(self):
        from vido_slam_tpu.models.maskrcnn.retinanet import sigmoid_focal_loss

        logits = jnp.asarray([-4.0, 0.0, 4.0])
        t1 = jnp.asarray([1.0, 1.0, 1.0])
        l1 = np.asarray(sigmoid_focal_loss(logits, t1))
        # confident correct positive has tiny loss; wrong one large
        assert l1[2] < 1e-3
        assert l1[0] > 0.5
        t0 = jnp.asarray([0.0, 0.0, 0.0])
        l0 = np.asarray(sigmoid_focal_loss(logits, t0))
        assert l0[0] < 1e-3 and l0[2] > 0.5

    def test_anchor_octaves(self):
        from vido_slam_tpu.models.maskrcnn.retinanet import retina_cell_anchors

        cell = retina_cell_anchors(0)
        assert cell.shape == (9, 4)
        areas = (cell[:, 2] - cell[:, 0] + 1) * (cell[:, 3] - cell[:, 1] + 1)
        # three octave scales: areas roughly 32^2, (32*2^(1/3))^2, (32*2^(2/3))^2
        ratios = np.sort(np.unique(np.round(areas / areas.min(), 1)))
        assert len(ratios) >= 3

pytestmark = pytest.mark.slow  # heavy jit: full tier only


def test_rpn_head_concat_matches_per_level():
    """The one-pass concatenated-pyramid RPN head must reproduce the
    per-level head exactly (zero separator rows reproduce each level's own
    conv padding; padded columns are sliced off)."""
    import jax

    from vido_slam_tpu.models.maskrcnn.rpn import rpn_head, rpn_head_concat

    key = jax.random.PRNGKey(0)
    C, A = 32, 3
    p = {
        "rpn.head.conv.weight": jax.random.normal(key, (3, 3, C, C)) * 0.1,
        "rpn.head.conv.bias": jnp.zeros(C),
        "rpn.head.cls_logits.weight": jax.random.normal(
            jax.random.PRNGKey(1), (1, 1, C, A)) * 0.1,
        "rpn.head.cls_logits.bias": jnp.zeros(A),
        "rpn.head.bbox_pred.weight": jax.random.normal(
            jax.random.PRNGKey(2), (1, 1, C, A * 4)) * 0.1,
        "rpn.head.bbox_pred.bias": jnp.zeros(A * 4),
    }
    shapes = [(34, 50), (17, 25), (9, 13), (5, 7), (3, 4)]
    feats = [jax.random.normal(jax.random.PRNGKey(10 + i), (1, h, w, C))
             for i, (h, w) in enumerate(shapes)]
    got = rpn_head_concat(p, feats, A)
    for i, f in enumerate(feats):
        lg, dl = rpn_head(p, f, A)
        np.testing.assert_allclose(np.asarray(got[i][0]), np.asarray(lg),
                                   atol=1e-5, err_msg=f"level {i} logits")
        np.testing.assert_allclose(np.asarray(got[i][1]), np.asarray(dl),
                                   atol=1e-5, err_msg=f"level {i} deltas")
