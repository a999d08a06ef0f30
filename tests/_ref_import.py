"""Helpers to instantiate the REFERENCE torch networks from /root/reference
source on CPU for whole-net parity tests (VERDICT r1 item 3).

The reference env assumes CUDA + torchvision + CuPy; none are available
here, so this module provides the minimal seams:
  - a faithful torchvision.models.resnet stub (standard public ResNet18
    architecture with torchvision's exact state_dict layout) so
    mono_depth2/src/networks/resnet_encoder.py imports and constructs;
  - a CPU torch re-implementation of the CuPy correlation kernel semantics
    (flow_net/src/correlation/correlation.py:34-102: zero-pad 3*stride,
    49 channels tc -> displacement ((tc%7)-3, (tc//7)-3)*stride, channel
    MEAN of products, output ceil(H/stride) x ceil(W/stride));
  - import utilities that exec reference modules by file path with the
    stubs pre-registered.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference/src/thirdparty"


# ---------------------------------------------------------------------------
# torchvision stub: standard ResNet-18 (public architecture) with
# torchvision's state_dict key layout, enough for ResnetEncoder.
# ---------------------------------------------------------------------------

class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):  # not used by ResnetEncoder, kept for completeness
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _resnet18(pretrained=False, **kw):
    assert not pretrained, "stub cannot download weights"
    return ResNet(BasicBlock, [2, 2, 2, 2], **kw)


def install_torchvision_stub():
    """Register a minimal torchvision in sys.modules (idempotent)."""
    if "torchvision" in sys.modules and not getattr(
            sys.modules["torchvision"], "_vido_stub", False):
        return  # a real torchvision exists; use it
    tv = types.ModuleType("torchvision")
    tv._vido_stub = True
    models = types.ModuleType("torchvision.models")
    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.ResNet = ResNet
    resnet_mod.model_urls = {}
    models.ResNet = ResNet
    models.resnet = resnet_mod
    models.resnet18 = _resnet18
    models.resnet34 = models.resnet50 = models.resnet101 = models.resnet152 = (
        lambda *a, **k: (_ for _ in ()).throw(NotImplementedError))
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet_mod


# ---------------------------------------------------------------------------
# CPU correlation with the CUDA kernel's exact semantics
# ---------------------------------------------------------------------------

def cpu_correlation(tenFirst: torch.Tensor, tenSecond: torch.Tensor,
                    intStride: int) -> torch.Tensor:
    """correlation.py kernel_Correlation_updateOutput on CPU.

    out[n, tc, y, x] = mean_c pad(first)[n, c, y1, x1] *
                              pad(second)[n, c, y1 + s2p, x1 + s2o]
    with pad = 3*stride zeros, y1 = (y+3)*stride, s2o = ((tc%7)-3)*stride,
    s2p = ((tc//7)-3)*stride; output spatial = ceil(H/stride), ceil(W/stride)
    (correlation.py:46-101, 289-291)."""
    first, second = tenFirst, tenSecond
    N, C, H, W = first.shape
    pad = 3 * intStride
    f = torch.nn.functional.pad(first, (pad, pad, pad, pad))
    s = torch.nn.functional.pad(second, (pad, pad, pad, pad))
    Ho = int(math.ceil(H / intStride))
    Wo = int(math.ceil(W / intStride))
    ys = torch.arange(Ho) * intStride + pad
    xs = torch.arange(Wo) * intStride + pad
    fc = f[:, :, ys][:, :, :, xs]
    out = torch.empty(N, 49, Ho, Wo, dtype=first.dtype)
    for tc in range(49):
        dy = (tc // 7 - 3) * intStride
        dx = (tc % 7 - 3) * intStride
        sc = s[:, :, ys + dy][:, :, :, xs + dx]
        out[:, tc] = (fc * sc).mean(dim=1)
    return out


def install_correlation_stub():
    """Register `from correlation import correlation` with CPU semantics."""
    pkg = types.ModuleType("correlation")
    mod = types.ModuleType("correlation.correlation")
    mod.FunctionCorrelation = cpu_correlation

    class ModuleCorrelation(nn.Module):
        def forward(self, a, b, s):
            return cpu_correlation(a, b, s)

    mod.ModuleCorrelation = ModuleCorrelation
    pkg.correlation = mod
    sys.modules["correlation"] = pkg
    sys.modules["correlation.correlation"] = mod


# ---------------------------------------------------------------------------
# reference module import by path
# ---------------------------------------------------------------------------

def import_ref_module(modname: str, relpath: str, syspaths=()):
    """Exec a reference module from /root/reference with extra sys.path
    entries active (for its Python-2-style absolute imports)."""
    added = []
    for p in syspaths:
        full = os.path.join(REF, p)
        if full not in sys.path:
            sys.path.insert(0, full)
            added.append(full)
    try:
        spec = importlib.util.spec_from_file_location(
            modname, os.path.join(REF, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        for p in added:
            sys.path.remove(p)


def load_ref_monodepth2():
    """Reference ResnetEncoder + DepthDecoder classes."""
    install_torchvision_stub()
    enc = import_ref_module(
        "ref_md2_encoder", "mono_depth2/src/networks/resnet_encoder.py",
        syspaths=["mono_depth2/src"])
    dec = import_ref_module(
        "ref_md2_decoder", "mono_depth2/src/networks/depth_decoder.py",
        syspaths=["mono_depth2/src"])
    return enc.ResnetEncoder, dec.DepthDecoder


def load_ref_liteflownet():
    """Reference LiteFlowNet Network class, CUDA-free.

    flow_net/src/layers.py calls .cuda() on the backwarp grid and
    torch.set_grad_enabled(False) at import; both are neutralised here.
    Network.__init__ loads weights from disk — construction is done with
    torch.load/load_state_dict temporarily no-op'd so the caller gets the
    randomly initialised module."""
    install_correlation_stub()
    grad_was = torch.is_grad_enabled()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        layers = import_ref_module(
            "ref_lfn_layers", "flow_net/src/layers.py",
            syspaths=["flow_net/src"])
    finally:
        torch.set_grad_enabled(grad_was)

    def build_network():
        orig_load = torch.load
        orig_lsd = nn.Module.load_state_dict
        torch.load = lambda *a, **k: {}
        nn.Module.load_state_dict = lambda self, sd, **kw: None
        try:
            net = layers.Network("unused")
        finally:
            torch.load = orig_load
            nn.Module.load_state_dict = orig_lsd
        return net

    return layers, build_network


def randomize_module(mod: nn.Module, seed: int = 0) -> None:
    """Non-trivial weights everywhere: conv/linear weights, biases, BN
    affine AND running stats (fresh BN has mean 0/var 1, which would hide
    running-stat conversion bugs)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d, nn.Linear)):
                # fan-in-scaled so deep activations stay O(1): fixed-std
                # init makes layer-4 features O(10^3), where f32 reduction
                # ordering noise dwarfs any sensible tolerance
                fan_in = m.weight.shape[1] * (
                    m.weight.shape[2] * m.weight.shape[3]
                    if m.weight.dim() == 4 else 1)
                m.weight.normal_(0.0, 1.0 / (fan_in ** 0.5), generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.05, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


# ---------------------------------------------------------------------------
# maskrcnn_benchmark: instantiate the REFERENCE backbone / RPN head / ROI
# heads from /root/reference source. The package's GPU-only seams
# (layers._C extensions, yacs config) are replaced with minimal stubs; the
# model code itself (resnet.py, fpn.py, backbone.py, poolers.py, rpn.py,
# roi_*_feature_extractors.py, roi_*_predictors.py) is executed verbatim.
# ---------------------------------------------------------------------------

MRB = "mask_rcnn/maskrcnn_benchmark"


class _AttrDict(dict):
    """Tiny yacs.CfgNode stand-in: attribute access + clone()."""

    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        return self


def _mask_rcnn_cfg():
    """The R-50-FPN inference config subset the imported modules read
    (reference configs/e2e_mask_rcnn_R_50_FPN_1x.yaml over config/defaults.py)."""
    c = _AttrDict()
    c.MODEL = _AttrDict(
        RPN_ONLY=False,
        RETINANET_ON=False,
        FBNET_ON=False,
        MASK_ON=True,
        CLS_AGNOSTIC_BBOX_REG=False,
        BACKBONE=_AttrDict(CONV_BODY="R-50-FPN", FREEZE_CONV_BODY_AT=2),
        RESNETS=_AttrDict(
            NUM_GROUPS=1,
            WIDTH_PER_GROUP=64,
            STRIDE_IN_1X1=True,
            STEM_OUT_CHANNELS=64,
            RES2_OUT_CHANNELS=256,
            BACKBONE_OUT_CHANNELS=256,
            STEM_FUNC="StemWithFixedBatchNorm",
            TRANS_FUNC="BottleneckWithFixedBatchNorm",
            STAGE_WITH_DCN=(False, False, False, False),
            WITH_MODULATED_DCN=False,
            DEFORMABLE_GROUPS=1,
            RES5_DILATION=1,
        ),
        GROUP_NORM=_AttrDict(DIM_PER_GP=-1, NUM_GROUPS=32, EPSILON=1e-5),
        FPN=_AttrDict(USE_GN=False, USE_RELU=False),
        RPN=_AttrDict(RPN_HEAD="SingleConvRPNHead"),
        ROI_BOX_HEAD=_AttrDict(
            POOLER_RESOLUTION=7,
            POOLER_SCALES=(0.25, 0.125, 0.0625, 0.03125),
            POOLER_SAMPLING_RATIO=2,
            MLP_HEAD_DIM=1024,
            USE_GN=False,
            NUM_CLASSES=81,
            PREDICTOR="FPNPredictor",
            FEATURE_EXTRACTOR="FPN2MLPFeatureExtractor",
        ),
        ROI_MASK_HEAD=_AttrDict(
            POOLER_RESOLUTION=14,
            POOLER_SCALES=(0.25, 0.125, 0.0625, 0.03125),
            POOLER_SAMPLING_RATIO=2,
            CONV_LAYERS=(256, 256, 256, 256),
            USE_GN=False,
            DILATION=1,
            PREDICTOR="MaskRCNNC4Predictor",
            FEATURE_EXTRACTOR="MaskRCNNFPNFeatureExtractor",
            SHARE_BOX_FEATURE_EXTRACTOR=False,
        ),
    )
    return c


class _CPUROIAlign(nn.Module):
    """CPU torch ROIAlign with the csrc semantics (Detectron-1 convention,
    csrc/cpu/ROIAlign_cpu.cpp): no half-pixel shift, samples outside
    (-1, size-1) contribute zero, in-range coordinates clamp. Used by the
    reference Pooler in place of the _C extension."""

    def __init__(self, output_size, spatial_scale, sampling_ratio):
        super().__init__()
        self.output_size = output_size
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio

    def forward(self, feat, rois):
        # feat (N, C, H, W); rois (R, 5) [batch_idx, x1, y1, x2, y2]
        res = self.output_size[0] if isinstance(
            self.output_size, (tuple, list)) else self.output_size
        s = self.sampling_ratio
        N, C, H, W = feat.shape
        R = rois.shape[0]
        out = torch.zeros(R, C, res, res, dtype=feat.dtype)
        for ri in range(R):
            b = int(rois[ri, 0])
            x1, y1, x2, y2 = [float(v) * self.spatial_scale
                              for v in rois[ri, 1:]]
            bw = max(x2 - x1, 1.0) / res
            bh = max(y2 - y1, 1.0) / res
            for ph in range(res):
                for pw in range(res):
                    acc = torch.zeros(C, dtype=feat.dtype)
                    for iy in range(s):
                        y = y1 + ph * bh + (iy + 0.5) * bh / s
                        for ix in range(s):
                            x = x1 + pw * bw + (ix + 0.5) * bw / s
                            if y < -1.0 or y > H - 1 or x < -1.0 or x > W - 1:
                                continue
                            yc = min(max(y, 0.0), H - 1.0)
                            xc = min(max(x, 0.0), W - 1.0)
                            y0, x0 = int(yc), int(xc)
                            y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                            ly, lx = yc - y0, xc - x0
                            acc += (
                                feat[b, :, y0, x0] * (1 - ly) * (1 - lx)
                                + feat[b, :, y0, x1i] * (1 - ly) * lx
                                + feat[b, :, y1i, x0] * ly * (1 - lx)
                                + feat[b, :, y1i, x1i] * ly * lx
                            )
                    out[ri, :, ph, pw] = acc / (s * s)
        return out


class FakeBoxList:
    """Minimal BoxList: .bbox (R, 4) xyxy tensor, area(), len()."""

    def __init__(self, bbox):
        self.bbox = bbox

    def area(self):
        b = self.bbox
        return (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)

    def __len__(self):
        return self.bbox.shape[0]


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _exec_pkg_module(modname, relpath):
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    # attach to parent package so relative/attribute access works
    parent, _, leaf = modname.rpartition(".")
    if parent in sys.modules:
        setattr(sys.modules[parent], leaf, mod)
    return mod


def load_ref_maskrcnn():
    """Returns (cfg, modules dict) with the reference backbone builder, RPN
    head class, box/mask feature extractors and predictors, executed from
    /root/reference source with _C/yacs seams stubbed."""
    if "maskrcnn_benchmark" in sys.modules:
        mb = sys.modules["maskrcnn_benchmark"]
        if getattr(mb, "_vido_loaded", None):
            return mb._vido_loaded

    for name in [k for k in sys.modules if k.startswith("maskrcnn_benchmark")]:
        del sys.modules[name]

    mb = _stub_module("maskrcnn_benchmark")
    mb.__path__ = []

    # layers: real FrozenBatchNorm2d + misc Conv2d/ConvTranspose2d wrappers,
    # stub ROIAlign (CPU), DFConv2d unused for R-50
    bn_mod = _exec_pkg_module(
        "maskrcnn_benchmark._vido_batch_norm", f"{MRB}/layers/batch_norm.py")
    misc_mod = _exec_pkg_module(
        "maskrcnn_benchmark._vido_misc", f"{MRB}/layers/misc.py")
    _stub_module(
        "maskrcnn_benchmark.layers",
        FrozenBatchNorm2d=bn_mod.FrozenBatchNorm2d,
        Conv2d=misc_mod.Conv2d,
        ConvTranspose2d=misc_mod.ConvTranspose2d,
        BatchNorm2d=getattr(misc_mod, "BatchNorm2d", nn.BatchNorm2d),
        interpolate=getattr(misc_mod, "interpolate", None),
        ROIAlign=_CPUROIAlign,
        DFConv2d=None,
    )
    cfg = _mask_rcnn_cfg()
    _stub_module("maskrcnn_benchmark.config", cfg=cfg)
    utils_pkg = _stub_module("maskrcnn_benchmark.utils")
    utils_pkg.__path__ = []
    _exec_pkg_module("maskrcnn_benchmark.utils.registry",
                     f"{MRB}/utils/registry.py")

    modeling = _stub_module("maskrcnn_benchmark.modeling")
    modeling.__path__ = []
    _exec_pkg_module("maskrcnn_benchmark.modeling.registry",
                     f"{MRB}/modeling/registry.py")
    _exec_pkg_module("maskrcnn_benchmark.modeling.utils",
                     f"{MRB}/modeling/utils.py")
    _exec_pkg_module("maskrcnn_benchmark.modeling.poolers",
                     f"{MRB}/modeling/poolers.py")
    _exec_pkg_module("maskrcnn_benchmark.modeling.make_layers",
                     f"{MRB}/modeling/make_layers.py")
    _exec_pkg_module("maskrcnn_benchmark.modeling.box_coder",
                     f"{MRB}/modeling/box_coder.py")

    backbone_pkg = _stub_module("maskrcnn_benchmark.modeling.backbone")
    backbone_pkg.__path__ = []
    _exec_pkg_module("maskrcnn_benchmark.modeling.backbone.resnet",
                     f"{MRB}/modeling/backbone/resnet.py")
    _exec_pkg_module("maskrcnn_benchmark.modeling.backbone.fpn",
                     f"{MRB}/modeling/backbone/fpn.py")
    bb = _exec_pkg_module("maskrcnn_benchmark.modeling.backbone.backbone",
                          f"{MRB}/modeling/backbone/backbone.py")

    # rpn: stub the loss/inference/anchor/retinanet factories (not needed
    # for head-parity), exec the real rpn.py for RPNHead
    rpn_pkg = _stub_module("maskrcnn_benchmark.modeling.rpn")
    rpn_pkg.__path__ = []
    _stub_module("maskrcnn_benchmark.modeling.rpn.loss",
                 make_rpn_loss_evaluator=lambda *a, **k: None)
    _stub_module("maskrcnn_benchmark.modeling.rpn.inference",
                 make_rpn_postprocessor=lambda *a, **k: None)
    _stub_module("maskrcnn_benchmark.modeling.rpn.anchor_generator",
                 make_anchor_generator=lambda *a, **k: None)
    retinanet_pkg = _stub_module("maskrcnn_benchmark.modeling.rpn.retinanet")
    retinanet_pkg.__path__ = []
    _stub_module("maskrcnn_benchmark.modeling.rpn.retinanet.retinanet",
                 build_retinanet=lambda *a, **k: None)
    rpn_mod = _exec_pkg_module("maskrcnn_benchmark.modeling.rpn.rpn",
                               f"{MRB}/modeling/rpn/rpn.py")

    rh_pkg = _stub_module("maskrcnn_benchmark.modeling.roi_heads")
    rh_pkg.__path__ = []
    bh_pkg = _stub_module("maskrcnn_benchmark.modeling.roi_heads.box_head")
    bh_pkg.__path__ = []
    bfe = _exec_pkg_module(
        "maskrcnn_benchmark.modeling.roi_heads.box_head.roi_box_feature_extractors",
        f"{MRB}/modeling/roi_heads/box_head/roi_box_feature_extractors.py")
    bpr = _exec_pkg_module(
        "maskrcnn_benchmark.modeling.roi_heads.box_head.roi_box_predictors",
        f"{MRB}/modeling/roi_heads/box_head/roi_box_predictors.py")
    mh_pkg = _stub_module("maskrcnn_benchmark.modeling.roi_heads.mask_head")
    mh_pkg.__path__ = []
    mfe = _exec_pkg_module(
        "maskrcnn_benchmark.modeling.roi_heads.mask_head.roi_mask_feature_extractors",
        f"{MRB}/modeling/roi_heads/mask_head/roi_mask_feature_extractors.py")
    mpr = _exec_pkg_module(
        "maskrcnn_benchmark.modeling.roi_heads.mask_head.roi_mask_predictors",
        f"{MRB}/modeling/roi_heads/mask_head/roi_mask_predictors.py")

    out = (cfg, {
        "build_backbone": bb.build_backbone,
        "RPNHead": rpn_mod.RPNHead,
        "FPN2MLPFeatureExtractor": bfe.FPN2MLPFeatureExtractor,
        "FPNPredictor": bpr.FPNPredictor,
        "MaskRCNNFPNFeatureExtractor": mfe.MaskRCNNFPNFeatureExtractor,
        "MaskRCNNC4Predictor": mpr.MaskRCNNC4Predictor,
    })
    sys.modules["maskrcnn_benchmark"]._vido_loaded = out
    return out


# ---------------------------------------------------------------------------
# Full reference detection pipeline on CPU: anchor generation + RPN
# post-processing + box/mask post-processing, executed from /root/reference
# source with only the CUDA nms swapped for a CPU re-expression of
# csrc/cuda/nms.cu semantics (keep indices in descending-score order, +1
# box areas, suppress at IoU >= threshold). Used for detection-output-level
# whole-net parity (X-101 / R-50).
# ---------------------------------------------------------------------------

def cuda_nms_semantics(boxes: "torch.Tensor", scores: "torch.Tensor",
                       threshold: float) -> "torch.Tensor":
    """CPU re-expression of csrc/cuda/nms.cu: greedy suppression over
    descending scores, Detectron +1 areas, returns kept indices in
    score order (the deployed GPU path's order, unlike nms_cpu.cpp which
    returns original order)."""
    order = torch.argsort(scores, descending=True)
    b = boxes[order].numpy()
    areas = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    n = b.shape[0]
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(b[i, 0], b[i + 1:, 0])
        yy1 = np.maximum(b[i, 1], b[i + 1:, 1])
        xx2 = np.minimum(b[i, 2], b[i + 1:, 2])
        yy2 = np.minimum(b[i, 3], b[i + 1:, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[i + 1:] - inter)
        suppressed[i + 1:] |= iou >= threshold
    return order[torch.as_tensor(keep, dtype=torch.long)]


def load_ref_maskrcnn_full(x101: bool = False):
    """load_ref_maskrcnn + the reference's full inference path: returns
    (cfg, mods) where mods additionally carries make_anchor_generator,
    make_rpn_postprocessor, make_roi_box_post_processor,
    make_roi_mask_post_processor, BoxCoder, ImageList, BoxList.
    `x101=True` reconfigures the cfg for X-101-32x8d (R-101-FPN conv body,
    groups=32, width 8, stride NOT in 1x1 — the caffe2 yaml)."""
    cfg, mods = load_ref_maskrcnn()
    if x101:
        cfg.MODEL.BACKBONE.CONV_BODY = "R-101-FPN"
        cfg.MODEL.RESNETS.NUM_GROUPS = 32
        cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
        cfg.MODEL.RESNETS.STRIDE_IN_1X1 = False
    else:
        cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
        cfg.MODEL.RESNETS.NUM_GROUPS = 1
        cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 64
        cfg.MODEL.RESNETS.STRIDE_IN_1X1 = True
    # inference-path config (caffe2 e2e yamls over config/defaults.py)
    cfg.MODEL.RPN.update(dict(
        USE_FPN=True,
        ANCHOR_SIZES=(32, 64, 128, 256, 512),
        ANCHOR_STRIDE=(4, 8, 16, 32, 64),
        ASPECT_RATIOS=(0.5, 1.0, 2.0),
        STRADDLE_THRESH=0,
        PRE_NMS_TOP_N_TRAIN=2000,
        POST_NMS_TOP_N_TRAIN=2000,
        FPN_POST_NMS_TOP_N_TRAIN=2000,
        PRE_NMS_TOP_N_TEST=1000,
        POST_NMS_TOP_N_TEST=1000,
        FPN_POST_NMS_TOP_N_TEST=1000,
        FPN_POST_NMS_PER_BATCH=True,
        NMS_THRESH=0.7,
        MIN_SIZE=0,
    ))
    cfg.MODEL.ROI_HEADS = _AttrDict(
        USE_FPN=True,
        BBOX_REG_WEIGHTS=(10.0, 10.0, 5.0, 5.0),
        SCORE_THRESH=0.05,
        NMS=0.5,
        DETECTIONS_PER_IMG=100,
    )
    cfg.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS = False
    cfg.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS_THRESHOLD = 0.5
    cfg.TEST = _AttrDict(BBOX_AUG=_AttrDict(ENABLED=False))

    if "full" in mods:
        return cfg, mods

    layers = sys.modules["maskrcnn_benchmark.layers"]
    layers.nms = cuda_nms_semantics
    # mask_head/inference imports maskrcnn_benchmark.layers.misc directly
    sys.modules["maskrcnn_benchmark.layers.misc"] = \
        sys.modules["maskrcnn_benchmark._vido_misc"]

    structures = _stub_module("maskrcnn_benchmark.structures")
    structures.__path__ = []
    _exec_pkg_module("maskrcnn_benchmark.structures.bounding_box",
                     f"{MRB}/structures/bounding_box.py")
    _exec_pkg_module("maskrcnn_benchmark.structures.boxlist_ops",
                     f"{MRB}/structures/boxlist_ops.py")
    if "memory_profiler" not in sys.modules:  # image_list.py imports it
        _stub_module("memory_profiler", profile=lambda f: f)
    il = _exec_pkg_module("maskrcnn_benchmark.structures.image_list",
                          f"{MRB}/structures/image_list.py")
    _exec_pkg_module("maskrcnn_benchmark.modeling.rpn.utils",
                     f"{MRB}/modeling/rpn/utils.py")
    ag = _exec_pkg_module("maskrcnn_benchmark.modeling.rpn.anchor_generator",
                          f"{MRB}/modeling/rpn/anchor_generator.py")
    # generate_anchors uses the np.float alias removed in numpy>=1.24;
    # give the module its own np namespace with the alias restored
    ag.np = types.SimpleNamespace(**{**np.__dict__, "float": float})
    ri = _exec_pkg_module("maskrcnn_benchmark.modeling.rpn.inference",
                          f"{MRB}/modeling/rpn/inference.py")
    bi = _exec_pkg_module(
        "maskrcnn_benchmark.modeling.roi_heads.box_head.inference",
        f"{MRB}/modeling/roi_heads/box_head/inference.py")
    mi = _exec_pkg_module(
        "maskrcnn_benchmark.modeling.roi_heads.mask_head.inference",
        f"{MRB}/modeling/roi_heads/mask_head/inference.py")
    bc = sys.modules["maskrcnn_benchmark.modeling.box_coder"]
    bb_mod = sys.modules["maskrcnn_benchmark.structures.bounding_box"]
    mods["full"] = True
    mods["make_anchor_generator"] = ag.make_anchor_generator
    mods["make_rpn_postprocessor"] = ri.make_rpn_postprocessor
    mods["make_roi_box_post_processor"] = bi.make_roi_box_post_processor
    mods["make_roi_mask_post_processor"] = mi.make_roi_mask_post_processor
    mods["BoxCoder"] = bc.BoxCoder
    mods["ImageList"] = il.ImageList
    mods["BoxList"] = bb_mod.BoxList
    return cfg, mods
