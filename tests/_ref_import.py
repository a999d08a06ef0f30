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
