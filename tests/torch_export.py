"""Torch reconstructions of the released model families + ONNX export shim.

Full-scale synthetic stand-ins for the released files (SURVEY.md §2.4):
`TorchSCRFD` follows the public SCRFD-10GF configuration (ResNetV1e deep
stem + avg-down shortcuts, stage_blocks/planes from the paper's NAS result,
PAFPN neck, GN head with cls/box/kps branches; arXiv:2105.04714) and
`TorchIResNet` the iResNet-50 / MobileFaceNet ArcFace trunks
(BN-Conv-BN-PReLU-Conv-BN blocks, BN-flatten-FC-BN embedding head). Exported
through torch.onnx (TorchScript exporter) with `export_onnx` below, they
produce real ModelProto bytes with the same op idioms the released files
use (GroupNorm -> Reshape/InstanceNormalization/Mul/Add, nearest Resize,
avg-down AveragePool, NCHW flatten before Gemm), so the executor and the
importer are exercised at full scale with random weights until the real
files are supplied (zero-egress environment; download.sh documents the
sources).
"""
from __future__ import annotations

import io
from typing import List, Sequence, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def export_onnx(model: nn.Module, x: torch.Tensor, path: str,
                opset: int = 11, dynamic_batch: bool = True) -> None:
    """torch.onnx.export without the `onnx` package: the exporter only
    imports onnx in its final onnxscript-function injection pass, which is
    a no-op for plain graphs — patch it to identity.

    dynamic_batch matches the released files: reshapes become Shape-op
    chains instead of baked batch-1 constants (the executor folds them
    per traced batch size)."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = \
        lambda model_bytes, custom_opsets: model_bytes
    kwargs = {}
    if dynamic_batch:
        kwargs = {"input_names": ["input"],
                  "dynamic_axes": {"input": {0: "batch"}}}
    try:
        model.eval()
        torch.onnx.export(model, x, path, opset_version=opset, dynamo=False,
                          **kwargs)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


# --------------------------------------------------------------------- SCRFD

class ConvBNReLU(nn.Sequential):
    def __init__(self, cin, cout, k=3, s=1, relu=True):
        layers = [nn.Conv2d(cin, cout, k, s, k // 2, bias=False),
                  nn.BatchNorm2d(cout)]
        if relu:
            layers.append(nn.ReLU(inplace=False))
        super().__init__(*layers)


class BasicBlockV1e(nn.Module):
    """mmdet ResNetV1e BasicBlock with avg-down shortcut."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = ConvBNReLU(cin, cout, 3, stride)
        self.conv2 = ConvBNReLU(cout, cout, 3, 1, relu=False)
        self.down = None
        if stride != 1 or cin != cout:
            down = []
            if stride != 1:
                down.append(nn.AvgPool2d(stride, stride, ceil_mode=True,
                                         count_include_pad=False))
            down += [nn.Conv2d(cin, cout, 1, 1, 0, bias=False),
                     nn.BatchNorm2d(cout)]
            self.down = nn.Sequential(*down)

    def forward(self, x):
        # main chain BEFORE the shortcut: mmdet's BasicBlock computes the
        # residual branch first, so the traced node order (what the ordered
        # importer zips against) matches the released files' graphs
        out = self.conv2(self.conv1(x))
        identity = self.down(x) if self.down is not None else x
        return F.relu(out + identity)


class ResNetV1e(nn.Module):
    """Deep-stem (3 convs) + maxpool + 4 stages; stage1 stride 1.

    Returns stages 2..4 (strides 8/16/32)."""

    def __init__(self, stem=56, blocks=(3, 5, 2, 3),
                 planes=(56, 56, 144, 248)):
        super().__init__()
        self.stem = nn.Sequential(
            ConvBNReLU(3, stem // 2, 3, 2), ConvBNReLU(stem // 2, stem // 2),
            ConvBNReLU(stem // 2, stem))
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        stages = []
        cin = stem
        for si, (n, p) in enumerate(zip(blocks, planes)):
            mods = []
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                mods.append(BasicBlockV1e(cin, p, stride))
                cin = p
            stages.append(nn.Sequential(*mods))
        self.stages = nn.ModuleList(stages)

    def forward(self, x):
        x = self.maxpool(self.stem(x))
        outs = []
        for si, stage in enumerate(self.stages):
            x = stage(x)
            if si >= 1:
                outs.append(x)
        return outs


class PAFPNTorch(nn.Module):
    def __init__(self, in_channels: Sequence[int], out: int):
        super().__init__()
        self.lateral = nn.ModuleList(
            [nn.Conv2d(c, out, 1) for c in in_channels])
        self.fpn = nn.ModuleList(
            [nn.Conv2d(out, out, 3, padding=1) for _ in in_channels])
        self.down = nn.ModuleList(
            [nn.Conv2d(out, out, 3, 2, 1) for _ in in_channels[1:]])
        self.pafpn = nn.ModuleList(
            [nn.Conv2d(out, out, 3, padding=1) for _ in in_channels[1:]])

    def forward(self, feats: List[torch.Tensor]):
        lats = [l(f) for l, f in zip(self.lateral, feats)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], scale_factor=2.0, mode="nearest")
        outs = [f(l) for f, l in zip(self.fpn, lats)]
        for i in range(len(outs) - 1):
            outs[i + 1] = self.pafpn[i](self.down[i](outs[i]) + outs[i + 1])
        return outs


class SCRFDHeadTorch(nn.Module):
    """Stacked conv+GN+ReLU tower shared across levels; cls/box/kps convs."""

    def __init__(self, cin: int, feat: int, stacks: int, anchors: int = 2,
                 kps: int = 5, gn_groups: int = 16):
        super().__init__()
        tower = []
        for i in range(stacks):
            tower.append(nn.Conv2d(cin if i == 0 else feat, feat, 3,
                                   padding=1, bias=False))
            tower.append(nn.GroupNorm(gn_groups, feat))
            tower.append(nn.ReLU(inplace=False))
        self.tower = nn.Sequential(*tower)
        self.cls = nn.Conv2d(feat, anchors * 1, 3, padding=1)
        self.box = nn.Conv2d(feat, anchors * 4, 3, padding=1)
        self.kps = nn.Conv2d(feat, anchors * kps * 2, 3, padding=1)

    def forward(self, x, scale: torch.Tensor):
        t = self.tower(x)
        b = x.shape[0]
        s = torch.sigmoid(self.cls(t))
        d = self.box(t) * scale
        k = self.kps(t)
        # (B, A*C, H, W) -> (B, H*W*A, C), the released 9-output layout
        def to_nc(v, c):
            a = v.shape[1] // c
            return v.permute(0, 2, 3, 1).reshape(b, -1, c)
        return to_nc(s, 1), to_nc(d, 4), to_nc(k, 10)


class TorchSCRFD(nn.Module):
    """Outputs the 9-tensor [score x3, bbox x3, kps x3] contract
    (/root/reference/models/scrfd.py:89-94)."""

    def __init__(self, stem=56, blocks=(3, 5, 2, 3),
                 planes=(56, 56, 144, 248), neck=56, head_feat=80,
                 head_stacks=3, gn_groups=16):
        super().__init__()
        self.backbone = ResNetV1e(stem, blocks, planes)
        self.neck = PAFPNTorch(planes[1:], neck)
        self.head = SCRFDHeadTorch(neck, head_feat, head_stacks,
                                   gn_groups=gn_groups)
        self.scales = nn.Parameter(torch.ones(3))

    def forward(self, x):
        feats = self.neck(self.backbone(x))
        scores, boxes, kps = [], [], []
        for li, f in enumerate(feats):
            s, d, k = self.head(f, self.scales[li])
            scores.append(s)
            boxes.append(d)
            kps.append(k)
        return tuple(scores + boxes + kps)


# ------------------------------------------------------------------- ArcFace

class IBasicBlock(nn.Module):
    """iResNet block: BN-Conv-BN-PReLU-Conv-BN (+1x1-conv shortcut)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.prelu = nn.PReLU(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        # residual branch first (arcface_torch iresnet.py computes the
        # downsample after the main chain; node order must match its trace)
        y = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        identity = self.down(x) if self.down is not None else x
        return y + identity


class TorchIResNet(nn.Module):
    """iResNet-style ArcFace trunk (w600k_r50 = blocks (3,4,14,3))."""

    def __init__(self, blocks=(3, 4, 14, 3), planes=(64, 128, 256, 512),
                 emb=512, fp16_bn=False):
        super().__init__()
        self.conv1 = nn.Conv2d(3, planes[0], 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes[0])
        self.prelu = nn.PReLU(planes[0])
        layers = []
        cin = planes[0]
        for n, p in zip(blocks, planes):
            for bi in range(n):
                layers.append(IBasicBlock(cin, p, 2 if bi == 0 else 1))
                cin = p
        self.body = nn.Sequential(*layers)
        self.bn2 = nn.BatchNorm2d(planes[-1])
        self.fc = nn.Linear(planes[-1] * 7 * 7, emb)
        self.features = nn.BatchNorm1d(emb)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        x = self.bn2(self.body(x))
        x = torch.flatten(x, 1)
        return self.features(self.fc(x))


def seeded(model: nn.Module, seed: int = 0) -> nn.Module:
    """Deterministic nontrivial weights (BN stats included)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)
            elif name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
    return model.eval()


# ------------------------------------------------------- MobileFaceNet (mbf)

class MBFConvBlock(nn.Sequential):
    """Conv-BN-PReLU (the public MobileFaceNet unit; arXiv:1804.07573)."""

    def __init__(self, cin, cout, k=1, s=1, p=0, groups=1):
        super().__init__(
            nn.Conv2d(cin, cout, k, s, p, groups=groups, bias=False),
            nn.BatchNorm2d(cout), nn.PReLU(cout))


class MBFLinearBlock(nn.Sequential):
    """Conv-BN, no activation."""

    def __init__(self, cin, cout, k=1, s=1, p=0, groups=1):
        super().__init__(
            nn.Conv2d(cin, cout, k, s, p, groups=groups, bias=False),
            nn.BatchNorm2d(cout))


class MBFDepthWise(nn.Module):
    """1x1 expand -> 3x3 depthwise(groups) -> 1x1 project [+ residual]."""

    def __init__(self, cin, cout, groups, stride=2, residual=False):
        super().__init__()
        self.residual = residual
        self.layers = nn.Sequential(
            MBFConvBlock(cin, groups, 1, 1, 0),
            MBFConvBlock(groups, groups, 3, stride, 1, groups=groups),
            MBFLinearBlock(groups, cout, 1, 1, 0))

    def forward(self, x):
        y = self.layers(x)
        return x + y if self.residual else y


class TorchMobileFaceNet(nn.Module):
    """w600k_mbf stand-in: the public insightface MobileFaceNet
    (blocks=(1,4,6,2), scale=2) with grouped/depthwise conv + PReLU idioms
    and the GDC head; exports the exact ONNX op patterns the released file
    uses (grouped Conv, PReLU with per-channel slopes, 7x7 depthwise)."""

    def __init__(self, blocks=(1, 4, 6, 2), scale=2, emb=512,
                 stem_filters=None, stem_dw_groups=64, stage_filters=None,
                 down_groups=(128, 256, 512),
                 res_groups=(128, 128, 256, 256), sep_filters=512):
        super().__init__()
        c64, c128 = 64 * scale, 128 * scale
        stem = stem_filters or c64
        sf = tuple(stage_filters or (c64, c128, c128))
        layers = [MBFConvBlock(3, stem, 3, 2, 1)]
        if blocks[0] == 1:
            layers.append(MBFConvBlock(stem, stem, 3, 1, 1,
                                       groups=stem_dw_groups))
        else:
            layers += [MBFDepthWise(stem, stem, res_groups[0], 1,
                                    residual=True)
                       for _ in range(blocks[0])]
        cin = stem
        for si in range(3):
            layers.append(MBFDepthWise(cin, sf[si], down_groups[si], 2))
            layers += [MBFDepthWise(sf[si], sf[si], res_groups[si + 1], 1,
                                    residual=True)
                       for _ in range(blocks[si + 1])]
            cin = sf[si]
        self.body = nn.Sequential(*layers)
        self.conv_sep = MBFConvBlock(cin, sep_filters, 1, 1, 0)
        self.gdc = MBFLinearBlock(sep_filters, sep_filters, 7, 1, 0,
                                  groups=sep_filters)
        self.fc = nn.Linear(sep_filters, emb, bias=False)
        self.features = nn.BatchNorm1d(emb)

    def forward(self, x):
        x = self.conv_sep(self.body(x))
        x = self.gdc(x)
        x = torch.flatten(x, 1)
        return self.features(self.fc(x))


# --------------------------------------------- the five released-graph kin

# Full-scale stand-in constructors for every released file (SURVEY.md §2.4):
# torch graphs with the same op idioms + comparable parameter budgets,
# exported to real ONNX bytes for executor/importer sign-off until the real
# weights can be downloaded (tools/verify_release.py runs all five).
STAND_INS = {
    "det_500m": lambda: TorchSCRFD(stem=16, blocks=(3, 3, 2, 2),
                                   planes=(16, 16, 40, 72), neck=24,
                                   head_feat=96, head_stacks=3),
    "det_2.5g": lambda: TorchSCRFD(stem=24, blocks=(3, 4, 2, 3),
                                   planes=(24, 48, 48, 80), neck=24,
                                   head_feat=64, head_stacks=2),
    "det_10g": lambda: TorchSCRFD(),
    "w600k_mbf": lambda: TorchMobileFaceNet(),
    "w600k_r50": lambda: TorchIResNet(blocks=(3, 4, 14, 3)),
}

# Width/depth-MUTATED stand-ins: every knob deliberately perturbed away
# from SCRFD_CONFIGS / ARCFACE_CONFIGS. If the real released graphs' NAS
# widths differ from the registry guesses, loading must still work — these
# prove config_from_graph + the ordered importer handle graphs the
# registry has never heard of (VERDICT r3 item 1).
MUTATED_STAND_INS = {
    "det_10g": lambda: TorchSCRFD(stem=40, blocks=(2, 4, 3, 2),
                                  planes=(40, 64, 120, 200), neck=48,
                                  head_feat=72, head_stacks=2, gn_groups=8),
    "w600k_mbf": lambda: TorchMobileFaceNet(
        blocks=(1, 3, 5, 2), scale=2, stem_filters=96, stem_dw_groups=48,
        stage_filters=(96, 192, 320), down_groups=(192, 320, 448),
        res_groups=(96, 96, 192, 320), sep_filters=448),
    "w600k_r50": lambda: TorchIResNet(blocks=(2, 3, 8, 2),
                                      planes=(48, 96, 176, 400)),
}


def calibrate_detector(model: TorchSCRFD) -> TorchSCRFD:
    """Make a seeded stand-in emit PLAUSIBLE geometry.

    seeded() randomizes every parameter, which leaves the FCOS per-level
    scales ~N(0, 0.1): box distances collapse to sub-pixel sizes, NMS/IoU
    and the max_num area metric then operate on degenerate near-tied boxes
    and e2e comparisons stress tie-breaking instead of the pipeline. Set
    the scales to distinct O(1) values and bias the box/kps branches so
    decoded faces are tens of pixels with data-dependent variation — the
    regime the real graphs produce."""
    with torch.no_grad():
        model.scales.copy_(torch.tensor([1.0, 1.15, 0.85]))
        model.head.box.bias.fill_(3.0)     # ~3 stride-units per side
        model.head.box.weight.mul_(3.0)    # data-driven size variation
        model.head.kps.bias.copy_(
            torch.linspace(-1.0, 1.0, model.head.kps.bias.numel()))
        model.head.kps.weight.mul_(3.0)
    return model
