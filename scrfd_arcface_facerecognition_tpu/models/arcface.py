"""ArcFace embedders: iResNet (w600k_r50) and MobileFaceNet (w600k_mbf).

TPU-native Flax re-implementations of the two recognition graphs the
reference runs through onnxruntime (/root/reference/models/arcface.py:18-21;
weights listed at README.md:60-61). Contract (arcface.py:13-14, 26, 36):
112x112 input normalized (x-127.5)/127.5 RGB, single 512-d output.

Architectures follow the public insightface training code for these weights:
- w600k_r50  = iResNet-50: 3x3 stem (stride 1), IBasicBlocks
  [BN-Conv-BN-PReLU-Conv(s)-BN] with stages (3, 4, 14, 3) x (64, 128, 256,
  512), head BN -> flatten(7*7*512) -> FC(512) -> feature BN.
- w600k_mbf  = MobileFaceNet: PReLU depthwise-separable bottlenecks + global
  depthwise conv (GDC) head -> FC(512) -> feature BN.

NHWC layout; params live in f32, compute dtype is configurable (bf16 on TPU).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import PReLU, ConvBN, conv_kernel_init


@dataclasses.dataclass(frozen=True)
class ArcFaceConfig:
    name: str
    arch: str                      # "iresnet" | "mobilefacenet"
    emb_dim: int = 512
    input_size: Tuple[int, int] = (112, 112)
    # iresnet
    stage_blocks: Sequence[int] = (3, 4, 14, 3)
    stage_filters: Sequence[int] = (64, 128, 256, 512)
    # mobilefacenet
    mbf_blocks: Sequence[int] = (1, 4, 6, 2)
    mbf_scale: int = 2
    # Explicit MobileFaceNet widths. None -> the public get_mbf defaults
    # derived from mbf_scale; config_from_graph fills them from the actual
    # conv shapes of a released/foreign .onnx so imports never depend on
    # the scale-derived guesses.
    mbf_stem_filters: Any = None        # default 64*scale
    mbf_stem_dw_groups: Any = None      # default 64
    mbf_stage_filters: Any = None       # per-stage out, default (64s,128s,128s)
    mbf_down_groups: Any = None         # downsample dw groups (128, 256, 512)
    mbf_res_groups: Any = None          # residual dw groups (128, 128, 256, 256)
    mbf_sep_filters: Any = None         # conv_sep/GDC width, default 512
    def mbf_widths(self) -> dict:
        """Effective MobileFaceNet widths (explicit fields, else the
        public insightface get_mbf defaults derived from mbf_scale)."""
        s = self.mbf_scale
        return {
            "stem": self.mbf_stem_filters or 64 * s,
            "stem_dw_groups": self.mbf_stem_dw_groups or 64,
            "stage_filters": tuple(self.mbf_stage_filters
                                   or (64 * s, 128 * s, 128 * s)),
            "down_groups": tuple(self.mbf_down_groups or (128, 256, 512)),
            "res_groups": tuple(self.mbf_res_groups or (128, 128, 256, 256)),
            "sep": self.mbf_sep_filters or 512,
        }

    # Phase-split s2d stem (iresnet): the stride-1 3-channel stem conv
    # wastes ~42x of its MXU window on channel padding; the split runs the
    # exact same math as four 2x2 convs over a 12-channel packing
    # (layers.conv3x3_s1_phase_s2d). Parameter layout unchanged.
    s2d_stem: bool = False


class IBasicBlock(nn.Module):
    """Improved-ResNet basic block: BN-Conv3x3-BN-PReLU-Conv3x3(s)-BN + skip."""
    filters: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn_kw = dict(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype)
        out = nn.BatchNorm(name="bn1", **bn_kw)(x)
        out = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, kernel_init=conv_kernel_init,
                      dtype=self.dtype, name="conv1")(out)
        out = nn.BatchNorm(name="bn2", **bn_kw)(out)
        out = PReLU(dtype=self.dtype, name="prelu")(out)
        out = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=conv_kernel_init, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.BatchNorm(name="bn3", **bn_kw)(out)

        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=conv_kernel_init,
                               dtype=self.dtype, name="down_conv")(x)
            identity = nn.BatchNorm(name="down_bn", **bn_kw)(identity)
        else:
            identity = x
        return out + identity


class IResNet(nn.Module):
    """iResNet trunk + ArcFace embedding head."""
    config: ArcFaceConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        bn_kw = dict(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        if cfg.s2d_stem:
            from .layers import PhaseSplitStemConv

            x = PhaseSplitStemConv(cfg.stage_filters[0], dtype=self.dtype,
                                   name="stem_conv")(x)
        else:
            x = nn.Conv(cfg.stage_filters[0], (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(name="stem_bn", **bn_kw)(x)
        x = PReLU(dtype=self.dtype, name="stem_prelu")(x)

        for si, (nblocks, filters) in enumerate(zip(cfg.stage_blocks, cfg.stage_filters)):
            for bi in range(nblocks):
                stride = 2 if bi == 0 else 1
                x = IBasicBlock(filters, stride, dtype=self.dtype,
                                name=f"layer{si + 1}_block{bi}")(x, train=train)

        x = nn.BatchNorm(name="head_bn", **bn_kw)(x)
        x = x.reshape(x.shape[0], -1)  # (B, 7*7*512) for 112x112 r50
        x = nn.Dense(cfg.emb_dim, dtype=self.dtype, name="fc")(x)
        # Feature BN (1-d affine over the embedding, as in insightface).
        x = nn.BatchNorm(name="features_bn", use_scale=True, use_bias=True, **bn_kw)(x)
        return x.astype(jnp.float32)


class MBFDepthWise(nn.Module):
    """MobileFaceNet unit: 1x1 expand -> 3x3 grouped dw -> 1x1 linear
    project (+ residual). Mirrors the public insightface
    arcface_torch/backbones/mobilefacenet.py `DepthWise`/`Residual` modules
    behind the released w600k_mbf weights, so the ordered ONNX importer maps
    the real file onto this structure weight-for-weight."""
    filters: int
    groups: int
    stride: int = 1
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = ConvBN(self.groups, (1, 1), padding=0, prelu=True,
                     dtype=self.dtype, name="expand")(x, train=train)
        out = ConvBN(self.groups, (3, 3), strides=(self.stride, self.stride),
                     padding=1, groups=self.groups, prelu=True,
                     dtype=self.dtype, name="dw")(out, train=train)
        out = ConvBN(self.filters, (1, 1), padding=0,
                     dtype=self.dtype, name="project")(out, train=train)
        if self.residual:
            out = out + x
        return out


class MobileFaceNet(nn.Module):
    """MobileFaceNet (w600k_mbf: blocks=(1,4,6,2), scale=2, GDC head).

    Faithful to the public graph (arXiv:1804.07573 + insightface
    arcface_torch `get_mbf`): grouped 3x3 stem-dw with groups=64 (NOT
    64*scale), per-stage DepthWise downsample + residual stacks with
    constant group widths (128/256/512), 1x1 conv_sep to 512, 7x7
    global-depthwise (GDC), linear FC, feature BN."""
    config: ArcFaceConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        w = cfg.mbf_widths()
        stem, sep = w["stem"], w["sep"]
        x = x.astype(self.dtype)
        x = ConvBN(stem, (3, 3), strides=(2, 2), padding=1, prelu=True,
                   dtype=self.dtype, name="stem")(x, train=train)
        if cfg.mbf_blocks[0] == 1:
            x = ConvBN(stem, (3, 3), padding=1, groups=w["stem_dw_groups"],
                       prelu=True, dtype=self.dtype,
                       name="stem_dw")(x, train=train)
        else:
            for bi in range(cfg.mbf_blocks[0]):
                x = MBFDepthWise(stem, w["res_groups"][0], 1, residual=True,
                                 dtype=self.dtype,
                                 name=f"stage0_block{bi}")(x, train=train)
        # (out_channels, downsample group width, residual block count);
        # residual blocks use the narrower res_groups widths
        stages = [(w["stage_filters"][si], w["down_groups"][si],
                   cfg.mbf_blocks[si + 1]) for si in range(3)]
        for si, (c, g_down, n) in enumerate(stages):
            x = MBFDepthWise(c, g_down, 2, dtype=self.dtype,
                             name=f"down{si}")(x, train=train)
            for bi in range(n):
                x = MBFDepthWise(c, w["res_groups"][si + 1], 1, residual=True,
                                 dtype=self.dtype,
                                 name=f"stage{si + 1}_block{bi}")(x, train=train)
        x = ConvBN(sep, (1, 1), padding=0, prelu=True,
                   dtype=self.dtype, name="conv_sep")(x, train=train)
        # Global depthwise conv over the final map (GDC: 7x7 for 112 input).
        gk = cfg.input_size[0] // 16
        x = ConvBN(sep, (gk, gk), padding=0, groups=sep,
                   dtype=self.dtype, name="gdc")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(cfg.emb_dim, use_bias=False, dtype=self.dtype, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="features_bn")(x)
        return x.astype(jnp.float32)


ARCFACE_CONFIGS = {
    "w600k_r50": ArcFaceConfig(name="w600k_r50", arch="iresnet",
                               stage_blocks=(3, 4, 14, 3),
                               stage_filters=(64, 128, 256, 512)),
    # blocks (1, 4, 6, 2) per the public insightface MobileFaceNet behind
    # the released w600k_mbf weights (arcface_torch backbones/mobilefacenet)
    "w600k_mbf": ArcFaceConfig(name="w600k_mbf", arch="mobilefacenet",
                               mbf_blocks=(1, 4, 6, 2), mbf_scale=2),
}


def build_arcface(name: str, dtype: Any = jnp.float32,
                  s2d_stem: bool = False) -> nn.Module:
    cfg = ARCFACE_CONFIGS[name]
    if cfg.arch == "iresnet":
        if s2d_stem:
            cfg = dataclasses.replace(cfg, s2d_stem=True)
        return IResNet(cfg, dtype=dtype)
    return MobileFaceNet(cfg, dtype=dtype)
