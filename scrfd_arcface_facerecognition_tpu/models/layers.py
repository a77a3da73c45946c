"""Shared NN building blocks (NHWC, MXU-friendly)."""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class PReLU(nn.Module):
    """Channel-wise PReLU (the ArcFace family's activation).

    One learnable slope per channel, matching the ONNX PRelu nodes in the
    released w600k graphs (slope tensor of shape [C]).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32
        ).astype(self.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class ConvBN(nn.Module):
    """Conv + BatchNorm (+ optional activation), inference-or-train.

    BatchNorm keeps running stats in the `batch_stats` collection; inference
    (`train=False`) uses them (the ONNX graphs bake BN as affine ops — the
    importer writes running stats + scale/bias here without folding, so the
    same module serves training).
    """
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 1
    groups: int = 1
    use_bn: bool = True
    act: Optional[Callable] = None
    prelu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=pad,
            feature_group_count=self.groups, use_bias=not self.use_bn,
            kernel_init=conv_kernel_init, dtype=self.dtype, name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        if self.prelu:
            x = PReLU(dtype=self.dtype, name="prelu")(x)
        elif self.act is not None:
            x = self.act(x)
        return x


def s2d_pack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel packing dy*2C + dx*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def conv3x3_s1_phase_s2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3x3 conv on a tiny-channel input via phase-split s2d.

    Exactly equivalent to lax.conv(x, kernel, stride 1, SAME): the input
    packs 2x2 spatial blocks into channels (3 -> 12), and each of the four
    output phases (py, px) is one 2x2 conv over the packed tensor whose
    kernel is a scatter of the canonical (3, 3, C, F) weights; outputs
    interleave back to full resolution. Rationale: the TPU conv layout pads
    the minor (channel) dim to the lane tile, so a 3-channel stride-1 stem
    looks like it wastes ~42x of its MXU window — packing quadruples the
    useful K dim (27 -> 48 taps). MEASURED on v5e (B=320, 112x112, bf16):
    the direct conv runs 0.49 ms vs 3.7 ms for this split — XLA's native
    lowering already handles the tiny-channel stem well and the 4-conv +
    interleave overhead dominates, so this stays an OFF-by-default option
    (docs/PERF.md). The parameter keeps the canonical layout, so importers
    and checkpoints are unaffected either way (same layout trick as the
    detector's stride-2 stem, models/scrfd.py stem_kernel_to_s2d).
    """
    import jax

    b, h, w, c = x.shape
    co = kernel.shape[-1]
    xs = s2d_pack(x)                                   # (B, H/2, W/2, 4C)
    outs = {}
    for py in (0, 1):
        for px in (0, 1):
            k = jnp.zeros((2, 2, 4 * c, co), kernel.dtype)
            for ky in range(3):
                q, sy = divmod(py - 1 + ky, 2)
                a = q + (1 - py)
                for kx in range(3):
                    qx, sx = divmod(px - 1 + kx, 2)
                    bx = qx + (1 - px)
                    ch = sy * 2 * c + sx * c
                    k = k.at[a, bx, ch:ch + c, :].set(kernel[ky, kx])
            outs[(py, px)] = jax.lax.conv_general_dilated(
                xs, k, window_strides=(1, 1),
                padding=[(1, 0) if py == 0 else (0, 1),
                         (1, 0) if px == 0 else (0, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
    row0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)
    row1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
    y = jnp.stack([row0, row1], axis=2)                # (B, H/2, 2, W/2, 2, F)
    return y.reshape(b, h, w, co)


class PhaseSplitStemConv(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), stride 1, no bias) on 3-channel
    inputs: same parameter tree ({kernel: (3, 3, C, F)}), phase-split s2d
    execution (conv3x3_s1_phase_s2d)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", conv_kernel_init,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        return conv3x3_s1_phase_s2d(x.astype(self.dtype),
                                    kernel.astype(self.dtype))
