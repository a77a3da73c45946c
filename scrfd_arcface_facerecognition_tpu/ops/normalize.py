"""Image normalization matching cv2.dnn.blobFromImage semantics, NHWC-native.

The reference feeds both models through blobFromImage with swapRB=True
(BGR->RGB), per-channel mean subtraction and a scalar scale
(scrfd.py:76-82: mean 127.5, 1/128; arcface.py:44-50: mean 127.5, 1/127.5),
producing NCHW blobs. On TPU we stay NHWC (the native convolution layout)
and fold the channel swap into the normalize.
"""
from __future__ import annotations

import jax.numpy as jnp

SCRFD_MEAN = 127.5    # scrfd.py:44
SCRFD_STD = 128.0     # scrfd.py:45
ARCFACE_MEAN = 127.5  # arcface.py:13
ARCFACE_STD = 127.5   # arcface.py:14


def normalize_image(image: jnp.ndarray, mean: float, std: float,
                    swap_rb: bool = True,
                    dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """(..., H, W, 3) uint8/float BGR -> normalized RGB float, NHWC.

    Equivalent to cv2.dnn.blobFromImage(img, 1/std, size, (mean,)*3,
    swapRB=True) minus the NCHW transpose (we keep NHWC for the MXU-friendly
    conv layout).
    """
    x = image.astype(jnp.float32)
    if swap_rb:
        x = x[..., ::-1]
    x = (x - mean) * (1.0 / std)
    return x.astype(dtype)
