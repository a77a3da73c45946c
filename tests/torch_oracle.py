"""Torch (CPU) oracle forward passes over the Flax parameter trees.

Each oracle walks the exact same parameter tree the Flax model produced and
re-computes the forward with torch.nn.functional in NCHW, providing an
independent implementation of the same architecture. Parity between the two
validates layouts (HWIO vs OIHW, NHWC flatten order), padding/stride/group
semantics, and the flattened anchor ordering contract.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def t_conv(x, kernel, bias=None, stride=1, padding=0, groups=1):
    w = _t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))
    b = _t(bias) if bias is not None else None
    return F.conv2d(x, w, b, stride=stride, padding=padding, groups=groups)


def t_bn(x, p, s, eps=1e-5):
    """p: params subtree {scale, bias}; s: batch_stats subtree {mean, var}."""
    return F.batch_norm(x, _t(s["mean"]), _t(s["var"]), _t(p["scale"]),
                        _t(p["bias"]), training=False, eps=eps)


def t_prelu(x, alpha):
    a = _t(alpha)
    if x.dim() == 4:
        a = a.view(1, -1, 1, 1)
    return torch.where(x >= 0, x, a * x)


def t_convbn(x, p, s, stride=1, padding=1, groups=1, act=None):
    """Mirror of models.layers.ConvBN."""
    conv = p["conv"]
    bias = conv.get("bias")
    x = t_conv(x, conv["kernel"], bias, stride=stride, padding=padding, groups=groups)
    if "bn" in p:
        x = t_bn(x, p["bn"], s["bn"])
    if "prelu" in p:
        x = t_prelu(x, p["prelu"]["alpha"])
    elif act == "relu":
        x = F.relu(x)
    return x


def t_groupnorm(x, p, num_groups=16, eps=1e-5):
    return F.group_norm(x, num_groups, _t(p["scale"]), _t(p["bias"]), eps=eps)


def _flatten_nhwc(x: torch.Tensor) -> torch.Tensor:
    """NCHW -> flatten in NHWC (h, w, c) order to match the Flax reshape."""
    return x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)


# ---------------------------------------------------------------- ArcFace


def oracle_iresnet(variables, config, x_nhwc: np.ndarray) -> np.ndarray:
    p = variables["params"]
    s = variables["batch_stats"]
    x = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)), dtype=torch.float32)

    x = t_conv(x, p["stem_conv"]["kernel"], padding=1)
    x = t_bn(x, p["stem_bn"], s["stem_bn"])
    x = t_prelu(x, p["stem_prelu"]["alpha"])

    for si, (nblocks, filters) in enumerate(zip(config.stage_blocks, config.stage_filters)):
        for bi in range(nblocks):
            stride = 2 if bi == 0 else 1
            name = f"layer{si + 1}_block{bi}"
            bp, bs = p[name], s[name]
            out = t_bn(x, bp["bn1"], bs["bn1"])
            out = t_conv(out, bp["conv1"]["kernel"], padding=1)
            out = t_bn(out, bp["bn2"], bs["bn2"])
            out = t_prelu(out, bp["prelu"]["alpha"])
            out = t_conv(out, bp["conv2"]["kernel"], stride=stride, padding=1)
            out = t_bn(out, bp["bn3"], bs["bn3"])
            if "down_conv" in bp:
                idn = t_conv(x, bp["down_conv"]["kernel"], stride=stride)
                idn = t_bn(idn, bp["down_bn"], bs["down_bn"])
            else:
                idn = x
            x = out + idn

    x = t_bn(x, p["head_bn"], s["head_bn"])
    x = _flatten_nhwc(x)
    x = x @ _t(p["fc"]["kernel"]) + _t(p["fc"]["bias"])
    x = F.batch_norm(x, _t(s["features_bn"]["mean"]), _t(s["features_bn"]["var"]),
                     _t(p["features_bn"]["scale"]), _t(p["features_bn"]["bias"]),
                     training=False, eps=1e-5)
    return x.numpy()


def _mbf_depthwise(x, bp, bs, groups, stride, residual):
    out = t_convbn(x, bp["expand"], bs["expand"], padding=0)
    out = t_convbn(out, bp["dw"], bs["dw"], stride=stride, padding=1,
                   groups=groups)
    out = t_convbn(out, bp["project"], bs["project"], padding=0)
    return out + x if residual else out


def oracle_mobilefacenet(variables, config, x_nhwc: np.ndarray) -> np.ndarray:
    """Mirror of the faithful (arcface_torch) MobileFaceNet in models/
    arcface.py: grouped stem-dw (groups=64), DepthWise downsamples with
    group widths 128/256/512, residual stacks 128/256/256, conv_sep + GDC."""
    p = variables["params"]
    s = variables["batch_stats"]
    sc = config.mbf_scale
    x = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)), dtype=torch.float32)

    x = t_convbn(x, p["stem"], s["stem"], stride=2, padding=1)
    if config.mbf_blocks[0] == 1:
        x = t_convbn(x, p["stem_dw"], s["stem_dw"], padding=1, groups=64)
    else:
        for bi in range(config.mbf_blocks[0]):
            name = f"stage0_block{bi}"
            x = _mbf_depthwise(x, p[name], s[name], 128, 1, True)

    down_groups = {0: 128, 1: 256, 2: 512}
    for si, n in enumerate(config.mbf_blocks[1:]):
        name = f"down{si}"
        x = _mbf_depthwise(x, p[name], s[name], down_groups[si], 2, False)
        res_groups = 128 if si == 0 else 256
        for bi in range(n):
            name = f"stage{si + 1}_block{bi}"
            x = _mbf_depthwise(x, p[name], s[name], res_groups, 1, True)

    x = t_convbn(x, p["conv_sep"], s["conv_sep"], padding=0)
    x = t_convbn(x, p["gdc"], s["gdc"], padding=0, groups=512)
    x = _flatten_nhwc(x)
    x = x @ _t(p["fc"]["kernel"])
    x = F.batch_norm(x, _t(s["features_bn"]["mean"]), _t(s["features_bn"]["var"]),
                     _t(p["features_bn"]["scale"]), _t(p["features_bn"]["bias"]),
                     training=False, eps=1e-5)
    return x.numpy()


# ----------------------------------------------------------------- SCRFD


def _res_block(x, bp, bs, stride):
    out = t_convbn(x, bp["conv1"], bs["conv1"], stride=stride, padding=1, act="relu")
    out = t_convbn(out, bp["conv2"], bs["conv2"], padding=1)
    if "down" in bp:
        idn = x
        if stride != 1:
            idn = F.avg_pool2d(idn, stride)
        idn = t_convbn(idn, bp["down"], bs["down"], padding=0)
    else:
        idn = x
    return F.relu(out + idn)


def oracle_scrfd(variables, config, x_nhwc: np.ndarray):
    p = variables["params"]
    s = variables["batch_stats"]
    x = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)), dtype=torch.float32)

    bp, bs = p["backbone"], s["backbone"]
    # ResNetV1e deep stem (3 convs) + 3x3/2 maxpool; stage 1 stride 1
    x = t_convbn(x, bp["stem1"], bs["stem1"], stride=2, padding=1, act="relu")
    x = t_convbn(x, bp["stem2"], bs["stem2"], padding=1, act="relu")
    x = t_convbn(x, bp["stem3"], bs["stem3"], padding=1, act="relu")
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = []
    for si, (nblocks, filters) in enumerate(zip(config.stage_blocks, config.stage_filters)):
        for bi in range(nblocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            name = f"stage{si + 1}_block{bi}"
            x = _res_block(x, bp[name], bs[name], stride)
        if si >= 1:
            feats.append(x)

    # mmdet-faithful PAFPN: bare convs, no activations
    np_, ns = p["neck"], s["neck"]
    lats = [t_convbn(f, np_[f"lateral{i}"], ns[f"lateral{i}"], padding=0)
            for i, f in enumerate(feats)]
    td = [None] * 3
    td[2] = lats[2]
    for i in (1, 0):
        td[i] = lats[i] + F.interpolate(td[i + 1], scale_factor=2, mode="nearest")
    td = [t_convbn(t, np_[f"td_smooth{i}"], ns[f"td_smooth{i}"], padding=1)
          for i, t in enumerate(td)]
    outs = [td[0]]
    for i in (1, 2):
        down = t_convbn(outs[-1], np_[f"bu_down{i}"], ns[f"bu_down{i}"],
                        stride=2, padding=1)
        outs.append(t_convbn(down + td[i], np_[f"bu_smooth{i}"], ns[f"bu_smooth{i}"],
                             padding=1))

    hp = p["head"]
    scores, bboxes, kpss = [], [], []
    for li, f in enumerate(outs):
        t = f
        for i in range(config.head_stacks):
            tp = hp[f"tower{i}"]
            t = t_conv(t, tp["conv"]["kernel"], tp["conv"]["bias"], padding=1)
            t = t_groupnorm(t, tp["gn"])
            t = F.relu(t)
        scale = float(np.asarray(hp[f"scale{li}"])[0])
        b = f.shape[0]

        def branch(name, ch):
            y = t_conv(t, hp[name]["kernel"], hp[name]["bias"], padding=1)
            # NCHW -> NHWC -> (B, H*W*A, ch): matches the Flax reshape.
            return y.permute(0, 2, 3, 1).reshape(b, -1, ch)

        scores.append(torch.sigmoid(branch("cls", 1)).numpy())
        bboxes.append((branch("box", 4) * scale).numpy())
        kpss.append(branch("kps", config.num_kps * 2).numpy())
    return {"scores": scores, "bboxes": bboxes, "kps": kpss}
