"""FBNet mobile detector: IRF block parity with torch, trunk shapes,
end-to-end inference."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from vido_slam_tpu.models.layers import convert_state_dict
from vido_slam_tpu.models.maskrcnn.fbnet import (
    fbnet_inference,
    fbnet_trunk,
    init_fbnet_params,
    irf_block,
)


class TorchIRF(torch.nn.Module):
    """fbnet_builder.IRFBlock (pw -> dw -> pwl, residual when applicable)."""

    def __init__(self, cin, cout, t, stride, k=3):
        super().__init__()
        mid = cin * t
        self.res = stride == 1 and cin == cout
        self.pw = torch.nn.Sequential(
            torch.nn.Conv2d(cin, mid, 1, bias=False),
            torch.nn.BatchNorm2d(mid), torch.nn.ReLU())
        self.dw = torch.nn.Sequential(
            torch.nn.Conv2d(mid, mid, k, stride, k // 2, groups=mid,
                            bias=False),
            torch.nn.BatchNorm2d(mid), torch.nn.ReLU())
        self.pwl = torch.nn.Sequential(
            torch.nn.Conv2d(mid, cout, 1, bias=False),
            torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        y = self.pwl(self.dw(self.pw(x)))
        return y + x if self.res else y


def to_params(m: TorchIRF, prefix="b"):
    sd = {}
    for name, mod in (("pw", m.pw), ("dw", m.dw), ("pwl", m.pwl)):
        sd[f"{prefix}.{name}.conv.weight"] = mod[0].state_dict()["weight"]
        for k, v in mod[1].state_dict().items():
            if k in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.{name}.bn.{k}"] = v
    return convert_state_dict(sd)


class TestIRFBlock:
    def test_parity_residual(self):
        torch.manual_seed(0)
        m = TorchIRF(16, 16, 6, 1)
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.uniform_(-0.3, 0.3)
                    mod.running_var.uniform_(0.5, 1.5)
        m.eval()
        x = torch.randn(1, 16, 10, 12)
        with torch.no_grad():
            want = m(x).numpy().transpose(0, 2, 3, 1)
        p = to_params(m)
        got = irf_block(p, "b", jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                        16, 16, 6, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_parity_strided(self):
        torch.manual_seed(1)
        m = TorchIRF(16, 24, 6, 2)
        m.eval()
        x = torch.randn(1, 16, 10, 12)
        with torch.no_grad():
            want = m(x).numpy().transpose(0, 2, 3, 1)
        got = irf_block(to_params(m), "b",
                        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                        16, 24, 6, 2)
        assert got.shape == want.shape  # (1, 5, 6, 24)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestFBNet:
    def test_trunk_shape(self):
        p = init_fbnet_params(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 160, 3))
        f = fbnet_trunk(p, x)
        assert f.shape == (1, 8, 10, 96)  # stride 16

    def test_inference_shapes_finite(self):
        p = init_fbnet_params(jax.random.PRNGKey(0))
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 160, 3)) * 255
        det = fbnet_inference(p, img, 128, 160)
        assert det.boxes.shape == (100, 4)
        assert det.labels.shape == (100,)
        assert bool(jnp.all(jnp.isfinite(det.boxes)))
        assert bool(jnp.all((det.labels >= 0) & (det.labels < 81)))


class TestArchRegistry:
    """The full MODEL_ARCH family (fbnet_modeldef.py:11-218 +
    MODEL_ARCH_CHAM): every registered arch initialises and its trunk
    produces the arch's stride-16 channel width; the kernel-size mixes
    (cham ir_k5/ir_k7) land in the stored depthwise weights."""

    def test_all_archs_trunk(self):
        from vido_slam_tpu.models.maskrcnn.fbnet import MODEL_ARCH

        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 80, 3))
        for name, a in MODEL_ARCH.items():
            p = init_fbnet_params(jax.random.PRNGKey(0), arch=name)
            f = fbnet_trunk(p, x, arch=name)
            assert f.shape == (1, 4, 5, a.backbone[-1][-1][1]), name

    def test_cham_kernel_sizes(self):
        from vido_slam_tpu.models.maskrcnn.fbnet import MODEL_ARCH

        p = init_fbnet_params(jax.random.PRNGKey(0), arch="cham_v1a")
        # stage 1 is ir_k7 x 2, stage 3 starts with ir_k5 x 7
        assert p["backbone.stage1.0.dw.conv.weight"].shape[0] == 7
        assert p["backbone.stage3.0.dw.conv.weight"].shape[0] == 5
        assert p["backbone.stage3.7.dw.conv.weight"].shape[0] == 3

    def test_mobilenet_v2_no_rpn_stage(self):
        """mobilenet_v2 registers no rpn stage — the RPN head runs on the
        trunk directly (block_cfg has no 'rpn' key)."""
        p = init_fbnet_params(jax.random.PRNGKey(0), arch="mobilenet_v2")
        assert not any(k.startswith("rpn.stage") for k in p)
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 80, 3)) * 255
        det = fbnet_inference(p, img, 64, 80, arch="mobilenet_v2")
        assert det.boxes.shape == (100, 4)
        assert bool(jnp.all(jnp.isfinite(det.boxes)))

pytestmark = pytest.mark.slow  # heavy jit: full tier only
