"""SCRFD detector family (det_500m / det_2.5g / det_10g) in Flax.

TPU-native re-implementation of the anchor-free FPN face detector the
reference runs through onnxruntime (/root/reference/models/scrfd.py). The
hard I/O contract (scrfd.py:38-47, 89-94) is preserved exactly:

- 3 FPN strides (8, 16, 32), 2 anchors per location, keypoints enabled;
- 9 outputs ordered [score x3, bbox x3, kps x3] with shapes
  (B, H/s * W/s * 2, {1, 4, 10}); scores are post-sigmoid; bbox/kps
  predictions are in stride units (decode multiplies by stride).

Architecture follows the SCRFD paper (arXiv:2105.04714): a
ResNet-style backbone whose per-stage depth/width are the paper's
compute-redistributed configurations, a PAFPN neck, and a head of stacked
3x3 conv + GroupNorm towers shared across scales. Exact channel counts per
variant are chosen to land near the released models' parameter budgets
(SURVEY.md §2.4); when real ONNX weights are supplied the importer
(models/onnx_import.py) maps them onto these modules.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvBN, conv_kernel_init


@dataclasses.dataclass(frozen=True)
class SCRFDConfig:
    name: str
    stem_filters: int
    stage_blocks: Sequence[int]
    stage_filters: Sequence[int]
    neck_filters: int
    head_stacks: int
    head_filters: int
    strides: Sequence[int] = (8, 16, 32)
    num_anchors: int = 2
    num_kps: int = 5
    # Head GroupNorm group count. The released graphs encode it in their
    # InstanceNormalization lowering; config_from_graph reads it from the
    # file instead of trusting this default.
    gn_groups: int = 16
    # Space-to-depth stem: the (H, W, 3) input pads its 3-channel minor dim
    # 42x in the TPU conv layout, making the first conv bandwidth-bound
    # (~44% of the whole forward). s2d repacks to (H/2, W/2, 12) and an
    # exactly-equivalent 2x2 stem conv (see s2d_input/stem_kernel_to_s2d).
    s2d_stem: bool = False


SCRFD_CONFIGS = {
    # Approximations of the paper's SCRFD-0.5GF / 2.5GF / 10GF settings,
    # sized to the released weight files (2.41 / 3.14 / 16.1 MB fp32).
    "det_500m": SCRFDConfig("det_500m", 16, (3, 3, 2, 2), (16, 16, 40, 72),
                            neck_filters=24, head_stacks=3, head_filters=96),
    "det_2.5g": SCRFDConfig("det_2.5g", 24, (3, 4, 2, 3), (24, 48, 48, 80),
                            neck_filters=24, head_stacks=2, head_filters=64),
    "det_10g": SCRFDConfig("det_10g", 56, (3, 5, 2, 3), (56, 56, 144, 248),
                           neck_filters=56, head_stacks=3, head_filters=80),
}


class ResBlock(nn.Module):
    """Pre-activation-free basic residual block with ReLU (backbone unit)."""
    filters: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = ConvBN(self.filters, (3, 3), strides=(self.stride, self.stride),
                     padding=1, act=nn.relu, dtype=self.dtype,
                     name="conv1")(x, train=train)
        out = ConvBN(self.filters, (3, 3), padding=1, dtype=self.dtype,
                     name="conv2")(out, train=train)
        if self.stride != 1 or x.shape[-1] != self.filters:
            # ResNetV1e-style downsample: avg-pool then 1x1 conv.
            identity = x
            if self.stride != 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = ConvBN(self.filters, (1, 1), padding=0,
                              dtype=self.dtype, name="down")(identity, train=train)
        else:
            identity = x
        return nn.relu(out + identity)


def s2d_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/2, W/2, 12); channel packing dy*6 + dx*3 + c
    (layers.s2d_pack — one definition keeps stem_kernel_to_s2d's channel
    order assumption in one place)."""
    from .layers import s2d_pack

    return s2d_pack(x)


def stem_kernel_to_s2d(w: "np.ndarray") -> "np.ndarray":
    """(3, 3, 3, C) stride-2 kernel -> exactly-equivalent (2, 2, 12, C)
    kernel over the s2d input (source row 2i+ky-1 = 2(i+dy_blk)+dy_sub)."""
    import numpy as np_

    c_out = w.shape[-1]
    out = np_.zeros((2, 2, 12, c_out), w.dtype)
    for ky in range(3):
        dby, dsy = divmod(ky - 1, 2)
        for kx in range(3):
            dbx, dsx = divmod(kx - 1, 2)
            for c in range(3):
                out[dby + 1, dbx + 1, dsy * 6 + dsx * 3 + c] = w[ky, kx, c]
    return out


def s2d_kernel_to_stem(w: "np.ndarray") -> "np.ndarray":
    """(2, 2, 12, C) space-to-depth stem kernel -> plain (3, 3, 3, C).

    Exact inverse of `stem_kernel_to_s2d` for kernels that scatter produced
    (injective mapping, unused slots zero) — used by checkpoint
    reconciliation and by the ONNX exporter (models/onnx_export.py). A
    GENERAL (2, 2, 12, C) conv has a 4x4 receptive field with 48 taps; if
    the 21 slots outside the scatter's image are nonzero (e.g. a model
    fine-tuned with s2d_stem=True drifted them), no 3x3 equivalent exists
    and this raises instead of silently dropping learned weights."""
    import numpy as np_

    w = np_.asarray(w)
    c_out = w.shape[-1]
    out = np_.zeros((3, 3, 3, c_out), w.dtype)
    used = np_.zeros(w.shape[:3], bool)
    for ky in range(3):
        dby, dsy = divmod(ky - 1, 2)
        for kx in range(3):
            dbx, dsx = divmod(kx - 1, 2)
            for c in range(3):
                out[ky, kx, c] = w[dby + 1, dbx + 1, dsy * 6 + dsx * 3 + c]
                used[dby + 1, dbx + 1, dsy * 6 + dsx * 3 + c] = True
    resid = float(np_.abs(w[~used]).max()) if (~used).any() else 0.0
    if resid > 1e-7 * max(1.0, float(np_.abs(w).max())):
        raise ValueError(
            "s2d stem kernel carries weight outside the 3x3 scatter image "
            f"(max |tap| {resid:.3e}): it was trained as a true 4x4 "
            "space-to-depth conv and has no exact plain-stem equivalent")
    return out


def adapt_stem_variables(variables, s2d_stem: bool):
    """Reconcile a variables tree's stem layout with the target model's.

    Training checkpoints store the plain (3, 3, 3, C) stride-2 stem
    (build_scrfd / SCRFD_CONFIGS default s2d_stem=False), while the serving
    `Detector` defaults to the exactly-equivalent space-to-depth stem
    ((2, 2, 12, C) over the repacked input). When the layouts differ,
    rewrite `params/backbone/stem1/conv/kernel` via `stem_kernel_to_s2d` /
    `s2d_kernel_to_stem` (both exact, not approximate) instead of letting
    XLA raise a feature-count mismatch on the first frame.
    """
    import numpy as np_

    try:
        kernel = variables["params"]["backbone"]["stem1"]["conv"]["kernel"]
    except (KeyError, TypeError):
        return variables  # foreign layout (e.g. graph-executor variables)
    shape = tuple(kernel.shape[:3])
    if s2d_stem and shape == (3, 3, 3):
        new_kernel = stem_kernel_to_s2d(np_.asarray(kernel))
    elif not s2d_stem and shape == (2, 2, 12):
        new_kernel = s2d_kernel_to_stem(np_.asarray(kernel))
    else:
        return variables

    # copy-on-write along the mutated path only (works for plain dicts
    # and FrozenDicts alike; leaves are shared, never mutated)
    def _set(tree, path, value):
        tree = dict(tree)
        if len(path) == 1:
            tree[path[0]] = value
        else:
            tree[path[0]] = _set(tree[path[0]], path[1:], value)
        return tree

    return _set(variables,
                ("params", "backbone", "stem1", "conv", "kernel"),
                jnp.asarray(new_kernel, kernel.dtype))


class Backbone(nn.Module):
    """ResNetV1e backbone; returns C3 (s8), C4 (s16), C5 (s32).

    Faithful to the mmdet ResNetV1e the released SCRFD graphs were trained
    with (arXiv:2105.04714; the public scrfd configs): a DEEP STEM of three
    3x3 convs (first stride 2) — or its space-to-depth equivalent — then a
    3x3/2 maxpool, then 4 stages whose first blocks stride 2 except
    stage 1 (already at stride 4 after the maxpool). Matching the real
    structure keeps the ordered ONNX importer's module sequence aligned
    with the released files' node order.
    """
    config: SCRFDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        cfg = self.config
        if cfg.s2d_stem:
            x = s2d_input(x)
            x = ConvBN(cfg.stem_filters // 2, (2, 2),
                       padding=[(1, 0), (1, 0)], act=nn.relu,
                       dtype=self.dtype, name="stem1")(x, train=train)
        else:
            x = ConvBN(cfg.stem_filters // 2, (3, 3), strides=(2, 2),
                       padding=1, act=nn.relu, dtype=self.dtype,
                       name="stem1")(x, train=train)
        x = ConvBN(cfg.stem_filters // 2, (3, 3), padding=1, act=nn.relu,
                   dtype=self.dtype, name="stem2")(x, train=train)
        x = ConvBN(cfg.stem_filters, (3, 3), padding=1, act=nn.relu,
                   dtype=self.dtype, name="stem3")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        feats = []
        for si, (nblocks, filters) in enumerate(zip(cfg.stage_blocks, cfg.stage_filters)):
            for bi in range(nblocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = ResBlock(filters, stride, dtype=self.dtype,
                             name=f"stage{si + 1}_block{bi}")(x, train=train)
            if si >= 1:  # stages 2..4 sit at strides 8/16/32
                feats.append(x)
        return feats


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample (FPN top-down path)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class PAFPN(nn.Module):
    """Path-aggregation FPN: top-down + bottom-up over 3 levels.

    Faithful to mmdet's PAFPN as configured by the public scrfd models
    (norm_cfg=None, act_cfg=None): every neck conv is a bare conv with
    bias — NO normalization and NO activation. (ConvBN here still carries
    a BN so the trainers can normalize; the ONNX importer loads released
    graphs' bare convs as conv + exact identity-BN.)
    """
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        f = self.filters
        # Lateral 1x1 projections.
        lats = [
            ConvBN(f, (1, 1), padding=0, dtype=self.dtype,
                   name=f"lateral{i}")(feat, train=train)
            for i, feat in enumerate(feats)
        ]
        # Top-down.
        td = [None] * len(lats)
        td[-1] = lats[-1]
        for i in range(len(lats) - 2, -1, -1):
            td[i] = lats[i] + _upsample2x(td[i + 1])
        td = [
            ConvBN(f, (3, 3), padding=1, dtype=self.dtype,
                   name=f"td_smooth{i}")(t, train=train)
            for i, t in enumerate(td)
        ]
        # Bottom-up augmentation.
        outs = [td[0]]
        for i in range(1, len(td)):
            down = ConvBN(f, (3, 3), strides=(2, 2), padding=1,
                          dtype=self.dtype, name=f"bu_down{i}")(outs[-1], train=train)
            outs.append(ConvBN(f, (3, 3), padding=1,
                               dtype=self.dtype, name=f"bu_smooth{i}")(down + td[i],
                                                                      train=train))
        return outs


class GNConv(nn.Module):
    """3x3 conv + GroupNorm + ReLU (head tower unit)."""
    filters: int
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="conv")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="gn")(x)
        return nn.relu(x)


class SCRFDHead(nn.Module):
    """Anchor-free head, weights shared across FPN levels.

    Per level: a stacked conv tower, then cls / bbox / kps 3x3 conv branches
    with a per-level learnable scale on the bbox distances (FCOS-style).
    """
    config: SCRFDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> Dict[str, List[jnp.ndarray]]:
        cfg = self.config
        a = cfg.num_anchors
        tower = [GNConv(cfg.head_filters, groups=cfg.gn_groups,
                        dtype=self.dtype, name=f"tower{i}")
                 for i in range(cfg.head_stacks)]
        cls_conv = nn.Conv(a * 1, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(-4.595),  # prior p=0.01
                           dtype=self.dtype, name="cls")
        box_conv = nn.Conv(a * 4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="box")
        kps_conv = nn.Conv(a * cfg.num_kps * 2, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="kps")

        scores, bboxes, kpss = [], [], []
        for li, x in enumerate(feats):
            t = x
            for mod in tower:
                t = mod(t)
            scale = self.param(f"scale{li}", nn.initializers.ones, (1,), jnp.float32)
            b = x.shape[0]
            s = nn.sigmoid(cls_conv(t)).reshape(b, -1, 1)
            d = (box_conv(t) * scale.astype(self.dtype)).reshape(b, -1, 4)
            k = kps_conv(t).reshape(b, -1, cfg.num_kps * 2)
            scores.append(s.astype(jnp.float32))
            bboxes.append(d.astype(jnp.float32))
            kpss.append(k.astype(jnp.float32))
        return {"scores": scores, "bboxes": bboxes, "kps": kpss}


class SCRFDNet(nn.Module):
    """Full detector: backbone -> PAFPN -> head.

    Input: (B, H, W, 3) normalized RGB. Output: dict of per-stride lists in
    the reference's 9-output ordering; anchor layout matches
    ops/anchors.py (row-major grid x 2 anchors).
    """
    config: SCRFDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, List[jnp.ndarray]]:
        feats = Backbone(self.config, dtype=self.dtype, name="backbone")(x, train=train)
        feats = PAFPN(self.config.neck_filters, dtype=self.dtype,
                      name="neck")(feats, train=train)
        return SCRFDHead(self.config, dtype=self.dtype, name="head")(feats)


def build_scrfd(name: str, dtype: Any = jnp.float32,
                s2d_stem: bool = False) -> SCRFDNet:
    cfg = SCRFD_CONFIGS[name]
    if s2d_stem:
        cfg = dataclasses.replace(cfg, s2d_stem=True)
    return SCRFDNet(cfg, dtype=dtype)
