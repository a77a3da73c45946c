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
