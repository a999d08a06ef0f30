"""tools/convert_weights.py: torch checkpoint files from the REFERENCE
source models -> converted bundles -> PerceptionModel.from_pretrained.
Closes the user migration path: save the reference's .pth files, run the
CLI, load the framework."""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _ref_import import (  # noqa: E402
    load_ref_liteflownet,
    load_ref_monodepth2,
    randomize_module,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("torch_ckpts")
    EncCls, DecCls = load_ref_monodepth2()
    enc = EncCls(18, False)
    dec = DecCls(enc.num_ch_enc)
    enc.eval(); dec.eval()
    randomize_module(enc, seed=1)
    randomize_module(dec, seed=2)
    # monodepth2's checkpoints carry non-tensor metadata (run_mono_depth
    # loads and filters them); the converter must skip those
    enc_sd = dict(enc.state_dict())
    enc_sd["height"] = 192
    enc_sd["width"] = 640
    torch.save(enc_sd, d / "encoder.pth")
    torch.save(dec.state_dict(), d / "depth.pth")
    _, build_network = load_ref_liteflownet()
    flow = build_network()
    flow.eval()
    randomize_module(flow, seed=3)
    torch.save(flow.state_dict(), d / "network-default.pytorch")
    return d, enc, dec, flow


class TestConvertCLI:
    def test_cli_and_from_pretrained(self, ckpt_dir, tmp_path):
        d, enc, dec, flow = ckpt_dir
        from tools.convert_weights import main

        out = str(tmp_path / "weights")
        main(["--out", out,
              "--flow", str(d / "network-default.pytorch"),
              "--depth-encoder", str(d / "encoder.pth"),
              "--depth-decoder", str(d / "depth.pth")])
        assert os.path.exists(os.path.join(out, "flow.npz")) or \
            os.path.exists(os.path.join(out, "flow"))

        from vido_slam_tpu.models.maskrcnn.model import MaskRCNNConfig
        from vido_slam_tpu.models.perception import PerceptionModel

        m = PerceptionModel.from_pretrained(
            out, 64, 96, MaskRCNNConfig(input_h=64, input_w=96),
            use_pallas=False)
        # converted tensors match the torch source (layout transform only)
        w_t = enc.state_dict()["encoder.conv1.weight"]  # (64, 3, 7, 7)
        w_j = np.asarray(m.depth_params["encoder.conv1.weight"])
        np.testing.assert_allclose(
            w_j, w_t.permute(2, 3, 1, 0).numpy(), rtol=1e-6)
        f_t = flow.state_dict()["netFeatures.netOne.0.weight"]
        f_j = np.asarray(m.flow_params["netFeatures.netOne.0.weight"])
        np.testing.assert_allclose(
            f_j, f_t.permute(2, 3, 1, 0).numpy(), rtol=1e-6)
        # mask bundle absent -> random init, still constructs
        assert "backbone.body.stem.conv1.weight" in m.mask_params or \
            len(m.mask_params) > 0

    def test_forward_matches_reference_depth(self, ckpt_dir, tmp_path):
        """End-to-end: converted-from-FILE weights drive the JAX net to the
        same disparity the torch source produces."""
        d, enc, dec, _ = ckpt_dir
        from tools.convert_weights import convert_depth
        from vido_slam_tpu.models.monodepth2 import monodepth2_disp

        params = convert_depth(str(d / "encoder.pth"), str(d / "depth.pth"))
        rng = np.random.RandomState(0)
        x = rng.rand(1, 192, 640, 3).astype(np.float32)
        with torch.no_grad():
            feats = enc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            disp_t = dec(feats)[("disp", 0)].numpy()[0, 0]
        import jax.numpy as jnp
        disp_j = np.asarray(monodepth2_disp(params, jnp.asarray(x)))[0]
        if disp_j.ndim == 3:
            disp_j = disp_j[..., 0]
        np.testing.assert_allclose(disp_j, disp_t, atol=2e-4, rtol=1e-3)
