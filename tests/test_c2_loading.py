"""Detectron/caffe2 checkpoint translation (models/maskrcnn/c2_loading.py)
vs the REFERENCE's own rename rules executed from /root/reference source
(maskrcnn_benchmark/utils/c2_model_loading.py). Closes the deployed-weights
path: the X-101-32x8d checkpoint the ROS node loads (run_mask_rcnn.py:30)
is a caffe2 pickle — this is the only loader that can ingest it."""

import importlib.util
import os
import pickle
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vido_slam_tpu.models.maskrcnn.c2_loading import (  # noqa: E402
    C2_STAGE_NAMES,
    align_c2_to_model,
    load_c2_pickle,
    rename_c2_keys,
    remap_dcn_conv2,
    translate_c2_blobs,
)

REF_C2 = ("/root/reference/src/thirdparty/mask_rcnn/maskrcnn_benchmark/"
          "utils/c2_model_loading.py")

STAGE_BLOCKS = {"R-50": (3, 4, 6, 3), "R-101": (3, 4, 23, 3)}


def make_c2_blobs(arch="R-50", groups=1, width_per_group=64,
                  with_momentum=True, tiny=True):
    """Synthetic Detectron blob dict with the real blob-name grammar for an
    e2e Mask R-CNN FPN checkpoint (stem/stages/FPN/RPN/box/mask + the
    ImageNet fc head and momentum blobs that must be dropped).
    `tiny=False` emits full real shapes (for end-to-end load tests)."""
    rs = np.random.RandomState(0)

    def t(*shape):
        if tiny:
            return rs.randn(1).astype(np.float32)
        return (rs.randn(*shape) * 0.05).astype(np.float32)

    blobs = {}

    def add(name, *shape):
        blobs[name] = t(*shape)
        if with_momentum and name.endswith("_w"):
            blobs[name + "_momentum"] = t(*shape)

    add("conv1_w", 64, 3, 7, 7)
    blobs["res_conv1_bn_s"] = t(64)
    blobs["res_conv1_bn_b"] = t(64)
    width = groups * width_per_group
    cin = 64
    last = []
    for si, nb in enumerate(STAGE_BLOCKS[arch]):
        planes = width * (2 ** si)
        cout = 256 * (2 ** si)
        S = si + 2
        for b in range(nb):
            q = f"res{S}_{b}"
            add(f"{q}_branch2a_w", planes, cin if b == 0 else cout, 1, 1)
            blobs[f"{q}_branch2a_bn_s"] = t(planes)
            blobs[f"{q}_branch2a_bn_b"] = t(planes)
            add(f"{q}_branch2b_w", planes, planes // groups, 3, 3)
            blobs[f"{q}_branch2b_bn_s"] = t(planes)
            blobs[f"{q}_branch2b_bn_b"] = t(planes)
            add(f"{q}_branch2c_w", cout, planes, 1, 1)
            blobs[f"{q}_branch2c_bn_s"] = t(cout)
            blobs[f"{q}_branch2c_bn_b"] = t(cout)
            if b == 0:
                add(f"{q}_branch1_w", cout, cin, 1, 1)
                blobs[f"{q}_branch1_bn_s"] = t(cout)
                blobs[f"{q}_branch1_bn_b"] = t(cout)
        cin = cout
        last.append(f"res{S}_{nb - 1}")
    # FPN: lateral (inner) convs carry a _lateral suffix except the top
    # stage (c2_model_loading.py:66-74 strips ".lateral" only for idx<4)
    for idx, lname in enumerate(last, 1):
        c = 256 * (2 ** (idx - 1))
        lat = "_lateral" if idx < 4 else ""
        add(f"fpn_inner_{lname}_sum{lat}_w", 256, c, 1, 1)
        blobs[f"fpn_inner_{lname}_sum{lat}_b"] = t(256)
        add(f"fpn_{lname}_sum_w", 256, 256, 3, 3)
        blobs[f"fpn_{lname}_sum_b"] = t(256)
    # RPN (shared across levels -> single fpn2 blob)
    add("conv_rpn_fpn2_w", 256, 256, 3, 3)
    blobs["conv_rpn_fpn2_b"] = t(256)
    add("rpn_cls_logits_fpn2_w", 3, 256, 1, 1)
    blobs["rpn_cls_logits_fpn2_b"] = t(3)
    add("rpn_bbox_pred_fpn2_w", 12, 256, 1, 1)
    blobs["rpn_bbox_pred_fpn2_b"] = t(12)
    # box head
    add("fc6_w", 1024, 256 * 7 * 7)
    blobs["fc6_b"] = t(1024)
    add("fc7_w", 1024, 1024)
    blobs["fc7_b"] = t(1024)
    add("cls_score_w", 81, 1024)
    blobs["cls_score_b"] = t(81)
    add("bbox_pred_w", 324, 1024)
    blobs["bbox_pred_b"] = t(324)
    # mask head
    for i in range(1, 5):
        add(f"_[mask]_fcn{i}_w", 256, 256, 3, 3)
        blobs[f"_[mask]_fcn{i}_b"] = t(256)
    add("conv5_mask_w", 256, 256, 2, 2)
    blobs["conv5_mask_b"] = t(256)
    add("mask_fcn_logits_w", 81, 256, 1, 1)
    blobs["mask_fcn_logits_b"] = t(81)
    # ImageNet classifier head (dropped via the fc1000 rename)
    add("pred_w", 1000, 2048)
    blobs["pred_b"] = t(1000)
    return blobs


def load_ref_c2_module():
    """Exec the reference c2_model_loading.py with its import seams
    stubbed (torch._six, model_serialization) — we only call the pure
    rename functions."""
    if "maskrcnn_benchmark" not in sys.modules:
        mb = types.ModuleType("maskrcnn_benchmark")
        mb.__path__ = []
        sys.modules["maskrcnn_benchmark"] = mb
    for name, attrs in [
        ("maskrcnn_benchmark.utils", {"__path__": []}),
        ("maskrcnn_benchmark.utils.model_serialization",
         {"load_state_dict": lambda *a, **k: None}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    # registry is tiny and self-contained; exec the real one
    if "maskrcnn_benchmark.utils.registry" not in sys.modules:
        rp = ("/root/reference/src/thirdparty/mask_rcnn/"
              "maskrcnn_benchmark/utils/registry.py")
        spec = importlib.util.spec_from_file_location(
            "maskrcnn_benchmark.utils.registry", rp)
        reg = importlib.util.module_from_spec(spec)
        sys.modules["maskrcnn_benchmark.utils.registry"] = reg
        spec.loader.exec_module(reg)
    import torch
    if not hasattr(torch, "_six"):  # removed in modern torch
        torch._six = types.SimpleNamespace(PY3=True)
    spec = importlib.util.spec_from_file_location("_ref_c2", REF_C2)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRenameParity:
    @pytest.mark.parametrize("arch,groups,wpg", [
        ("R-50", 1, 64),
        ("R-101", 32, 8),   # X-101-32x8d rides the R-101 conv body
    ])
    def test_key_and_shape_parity_vs_reference(self, arch, groups, wpg):
        ref = load_ref_c2_module()
        blobs = make_c2_blobs(arch, groups, wpg)
        ref_out = ref._rename_weights_for_resnet(
            dict(blobs), list(C2_STAGE_NAMES[arch]))
        ours = translate_c2_blobs(blobs, arch)
        assert set(ours.keys()) == set(ref_out.keys())
        for k in ref_out:
            assert tuple(ours[k].shape) == tuple(ref_out[k].shape), k

    def test_momentum_dropped_and_fc1000_renamed(self):
        blobs = make_c2_blobs("R-50")
        out = translate_c2_blobs(blobs, "R-50")
        assert not any("momentum" in k for k in out)
        assert "fc1000.weight" in out and "fc1000.bias" in out
        assert "pred_w" not in out

    def test_known_key_translations(self):
        names = rename_c2_keys(
            ["conv1_w", "res_conv1_bn_s", "res2_0_branch2a_w",
             "res2_0_branch2a_bn_b", "res2_0_branch1_w",
             "res4_5_branch2b_bn_s", "fpn_inner_res3_3_sum_lateral_w",
             "fpn_res5_2_sum_b", "conv_rpn_fpn2_w",
             "rpn_cls_logits_fpn2_b", "rpn_bbox_pred_fpn2_w",
             "fc6_w", "cls_score_b", "_[mask]_fcn1_w", "conv5_mask_b",
             "mask_fcn_logits_w"],
            C2_STAGE_NAMES["R-50"])
        assert names == [
            "conv1.weight", "bn1.weight", "layer1.0.conv1.weight",
            "layer1.0.bn1.bias", "layer1.0.downsample.0.weight",
            "layer3.5.bn2.weight", "fpn_inner2.weight",
            "fpn_layer4.bias", "rpn.head.conv.weight",
            "rpn.head.cls_logits.bias", "rpn.head.bbox_pred.weight",
            "fc6.weight", "cls_score.bias", "mask_fcn1.weight",
            "conv5_mask.bias", "mask_fcn_logits.weight",
        ]

    def test_dcn_remap_matches_reference_semantics(self):
        state = {
            "backbone.body.layer2.0.conv2.weight": np.zeros(1),
            "backbone.body.layer2.0.conv1.weight": np.zeros(1),
            "backbone.body.layer1.0.conv2.weight": np.zeros(1),
        }
        out = remap_dcn_conv2(state, (False, True, False, False))
        assert "backbone.body.layer2.0.conv2.conv.weight" in out
        assert "backbone.body.layer2.0.conv2.weight" not in out
        assert "backbone.body.layer1.0.conv2.weight" in out
        assert "backbone.body.layer2.0.conv1.weight" in out


class TestEndToEndLoad:
    @pytest.mark.parametrize("arch", ["R-50", "X-101"])
    def test_pickle_to_model_params(self, arch, tmp_path):
        """Full path: caffe2-format pickle on disk -> convert_mask_c2 ->
        every model key present with the model's shape; BN stats keep the
        AffineChannel defaults; loaded conv values land NHWC-transposed."""
        import jax

        from tools.convert_weights import convert_mask_c2
        from vido_slam_tpu.models.maskrcnn import model as mm

        cfg = mm.RESNET50_FPN if arch == "R-50" else mm.RESNEXT101_FPN
        groups = cfg.resnet.num_groups
        wpg = cfg.resnet.width_per_group
        body = "R-50" if arch == "R-50" else "R-101"
        blobs = make_c2_blobs(body, groups, wpg, tiny=False)
        pkl = tmp_path / "model.pkl"
        with open(pkl, "wb") as f:
            pickle.dump({"blobs": blobs}, f)

        params = convert_mask_c2(str(pkl), arch)
        init = mm.init_maskrcnn_params(jax.random.PRNGKey(0), cfg)
        assert set(params.keys()) == set(init.keys())
        for k in init:
            assert tuple(np.shape(params[k])) == tuple(np.shape(init[k])), k
        # conv layout: stem conv OIHW (64,3,7,7) -> HWIO (7,7,3,64)
        got = np.asarray(params["backbone.body.stem.conv1.weight"])
        want = blobs["conv1_w"].transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, want)
        # fc transpose
        got = np.asarray(
            params["roi_heads.box.feature_extractor.fc6.weight"])
        np.testing.assert_allclose(got, blobs["fc6_w"].T)
        # AffineChannel -> FrozenBN backfill
        np.testing.assert_allclose(
            np.asarray(params["backbone.body.stem.bn1.running_mean"]), 0.0)
        np.testing.assert_allclose(
            np.asarray(params["backbone.body.stem.bn1.running_var"]), 1.0)
        np.testing.assert_allclose(
            np.asarray(params["backbone.body.stem.bn1.weight"]),
            blobs["res_conv1_bn_s"])

    def test_load_c2_pickle_blobs_key(self, tmp_path):
        pkl = tmp_path / "x.pkl"
        with open(pkl, "wb") as f:
            pickle.dump({"blobs": {"a_w": np.ones(3), "lr": 0.1}}, f)
        out = load_c2_pickle(str(pkl))
        assert list(out) == ["a_w"]
