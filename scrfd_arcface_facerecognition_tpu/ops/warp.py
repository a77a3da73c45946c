"""Affine warp (cv2.warpAffine parity) for 112x112 face alignment.

Replicates /root/reference/utils/helpers.py:56-59: cv2.warpAffine(image, M,
(112, 112), borderValue=0.0) with the default INTER_LINEAR + inverse-map
convention — M maps src->dst and warpAffine samples dst pixels from
src = M^-1 @ (x, y, 1), bilinear, zero outside the source image.

Implemented as a batched bilinear gather in pure XLA (vmapped over faces);
a Pallas VMEM-tiled variant lives in ops/pallas_kernels.py for the hot path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 2, 3) affine matrices."""
    a, b, tx = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    c, d, ty = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    det = a * d - b * c
    inv_det = 1.0 / det
    ia = d * inv_det
    ib = -b * inv_det
    ic = -c * inv_det
    id_ = a * inv_det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _bilinear_sample(image: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    """Sample image (H, W, C) at float coords; zero outside (border constant).

    Each of the four taps contributes only if it lies inside the image,
    matching cv2's BORDER_CONSTANT handling of partial-overlap pixels.
    """
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, wgt):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        vals = image[yc, xc]  # gather -> (..., C)
        return vals * (wgt * inside.astype(jnp.float32))[..., None]

    out = (
        tap(y0i, x0i, (1 - fx) * (1 - fy))
        + tap(y0i, x0i + 1, fx * (1 - fy))
        + tap(y0i + 1, x0i, (1 - fx) * fy)
        + tap(y0i + 1, x0i + 1, fx * fy)
    )
    return out


def warp_affine(image: jnp.ndarray, m: jnp.ndarray,
                out_hw: Tuple[int, int] = (112, 112)) -> jnp.ndarray:
    """Warp (H, W, C) image by src->dst matrix m (2, 3) into (h, w, C).

    cv2.warpAffine parity: inverse mapping, INTER_LINEAR, zero border.
    """
    oh, ow = out_hw
    minv = invert_affine(m)
    xs = jnp.arange(ow, dtype=jnp.float32)
    ys = jnp.arange(oh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (oh, ow)
    sx = minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]
    sy = minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]
    return _bilinear_sample(image.astype(jnp.float32), sx, sy)


def warp_affine_batch(image: jnp.ndarray, ms: jnp.ndarray,
                      out_hw: Tuple[int, int] = (112, 112)) -> jnp.ndarray:
    """Warp F crops out of one frame: (H, W, C), (F, 2, 3) -> (F, h, w, C)."""
    return jax.vmap(lambda m: warp_affine(image, m, out_hw))(ms)


def warp_affine_flat(frames: jnp.ndarray, ms: jnp.ndarray,
                     frame_idx: jnp.ndarray,
                     out_hw: Tuple[int, int] = (112, 112)) -> jnp.ndarray:
    """Warp F crops out of a frame batch with ONE flat gather.

    frames: (B, H, W, C) (uint8 or float); ms: (F, 2, 3) src->dst matrices;
    frame_idx: (F,) which frame each crop samples. Returns (F, h, w, C) f32.

    All four bilinear taps for all crops go through a single row-gather on a
    (B*H*W, C) view — one XLA gather op instead of 4 per (frame, face) pair
    of the vmapped path, which matters on TPU where gather dispatch
    overhead dominates.
    """
    b, h, w, c = frames.shape
    oh, ow = out_hw
    f = ms.shape[0]
    minv = invert_affine(ms.astype(jnp.float32))     # (F, 2, 3)
    gx, gy = jnp.meshgrid(jnp.arange(ow, dtype=jnp.float32),
                          jnp.arange(oh, dtype=jnp.float32))
    sx = (minv[:, 0, 0, None, None] * gx + minv[:, 0, 1, None, None] * gy
          + minv[:, 0, 2, None, None])               # (F, oh, ow)
    sy = (minv[:, 1, 0, None, None] * gx + minv[:, 1, 1, None, None] * gy
          + minv[:, 1, 2, None, None])
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = frames.reshape(b * h * w, c).astype(jnp.float32)
    base = (frame_idx.astype(jnp.int32) * h)[:, None, None]

    def tap(yi, xi, wgt):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        lin = (base + jnp.clip(yi, 0, h - 1)) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, lin, axis=0)            # (F, oh, ow, C)
        return vals * (wgt * inside.astype(jnp.float32))[..., None]

    return (tap(y0i, x0i, (1 - fx) * (1 - fy))
            + tap(y0i, x0i + 1, fx * (1 - fy))
            + tap(y0i + 1, x0i, (1 - fx) * fy)
            + tap(y0i + 1, x0i + 1, fx * fy))


def norm_crop(image: jnp.ndarray, landmarks: jnp.ndarray,
              image_size: int = 112) -> jnp.ndarray:
    """Align-and-crop by 5 landmarks (helpers.py:56-59).

    image: (H, W, C); landmarks: (5, 2) or (F, 5, 2).
    Returns (image_size, image_size, C) or (F, image_size, image_size, C).
    """
    from .umeyama import estimate_norm

    m = estimate_norm(landmarks, image_size)
    if landmarks.ndim == 2:
        return warp_affine(image, m, (image_size, image_size))
    return warp_affine_batch(image, m, (image_size, image_size))
