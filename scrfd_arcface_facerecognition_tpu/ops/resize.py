"""Bilinear resize + letterbox with cv2.resize(INTER_LINEAR) parity, as matmuls.

The reference letterboxes every frame with an aspect-preserving cv2.resize
followed by zero-padding to 640x640 (/root/reference/models/scrfd.py:122-138).
cv2's INTER_LINEAR uses half-pixel-center sampling with edge clamping:

    src_x = (dst_x + 0.5) * (src_w / dst_w) - 0.5

On TPU we express the separable interpolation as two dense matrices
Wy (new_h, H) and Wx (new_w, W) with two non-zeros per row, so the whole
resize is two MXU matmuls over the batch — no gathers, no dynamic shapes.
The matrices are built host-side once per (src, dst) shape pair (shapes are
static under jit) and folded in as constants.

Note on parity: cv2 resizes uint8 in fixed point (coefficients quantized to
11 bits) and rounds to uint8; we compute in float32. The difference is below
1 LSB per pixel and covered by test tolerances (tests/test_resize.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _interp_matrix(dst_size: int, src_size: int) -> np.ndarray:
    """(dst, src) row-stochastic bilinear interpolation matrix, cv2 semantics."""
    w = np.zeros((dst_size, src_size), dtype=np.float32)
    if dst_size == src_size:
        np.fill_diagonal(w, 1.0)
        return w
    scale = src_size / dst_size
    for d in range(dst_size):
        sx = (d + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        frac = sx - x0
        x0c = min(max(x0, 0), src_size - 1)
        x1c = min(max(x0 + 1, 0), src_size - 1)
        w[d, x0c] += 1.0 - frac
        w[d, x1c] += frac
    return w


def resize_bilinear(images: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """(..., H, W, C) -> (..., h, w, C) float32, cv2 INTER_LINEAR semantics."""
    h_in, w_in = images.shape[-3], images.shape[-2]
    h_out, w_out = out_hw
    wy = jnp.asarray(_interp_matrix(h_out, h_in))
    wx = jnp.asarray(_interp_matrix(w_out, w_in))
    x = images.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", wy, x)
    x = jnp.einsum("pw,...owc->...opc", wx, x)
    return x


@dataclasses.dataclass(frozen=True)
class LetterboxPlan:
    """Static letterbox geometry for a (frame, model) shape pair.

    Mirrors scrfd.py:125-138: aspect-preserving resize to (new_h, new_w)
    anchored at the top-left of a zero (model_h, model_w) canvas.
    """
    frame_hw: Tuple[int, int]
    model_hw: Tuple[int, int]
    new_hw: Tuple[int, int]
    det_scale: float


def letterbox_plan(frame_hw: Tuple[int, int],
                   model_hw: Tuple[int, int] = (640, 640)) -> LetterboxPlan:
    fh, fw = frame_hw
    mh, mw = model_hw
    im_ratio = fh / fw
    model_ratio = mh / mw
    if im_ratio > model_ratio:
        new_h = mh
        new_w = int(new_h / im_ratio)
    else:
        new_w = mw
        new_h = int(new_w * im_ratio)
    det_scale = float(new_h) / fh
    return LetterboxPlan(frame_hw=(fh, fw), model_hw=(mh, mw),
                         new_hw=(new_h, new_w), det_scale=det_scale)


def tight_letterbox_plan(frame_hw: Tuple[int, int],
                         model_hw: Tuple[int, int] = (640, 640),
                         multiple: int = 64,
                         min_hw: Tuple[int, int] = (64, 512)) -> LetterboxPlan:
    """Letterbox plan whose canvas trims the all-zero pad band to the next
    `multiple` (e.g. 1080p -> (384, 640) instead of (640, 640)).

    Same det_scale and resized content as the reference's square canvas
    (scrfd.py:125-138) — SCRFD is fully convolutional, so this stops
    spending MXU cycles convolving a contentless pad region (44% of the
    canvas for 16:9 video). NOT bit-exact: normalization maps the
    zero-pixel pad to the constant (0-127.5)/128 = -0.996, so the trim
    swaps part of that band for conv zero-padding and a halo drifts into
    content rows at the coarse strides — measured <= 2e-3 on scores /
     0.5 stride-units on boxes (test_tight_canvas_agrees_with_square),
    noise at detection level. The production pipeline takes the trim
    (FacePipeline tight_canvas=True); the single-image reference API does
    not (pipeline/detector.py).
    """
    full = letterbox_plan(frame_hw, model_hw)
    nh, nw = full.new_hw
    # min_hw floors the canvas at the Pallas warp kernel's envelope: its
    # pyramid level 1 needs >= BAND_SRC rows and a PW-lane x-window
    # (ops/pallas_warp.py) — portrait frames would otherwise trim the
    # canvas narrower than the window.
    mh = min(full.model_hw[0], max(min_hw[0], -(-nh // multiple) * multiple))
    mw = min(full.model_hw[1], max(min_hw[1], -(-nw // multiple) * multiple))
    return LetterboxPlan(frame_hw=full.frame_hw, model_hw=(mh, mw),
                         new_hw=full.new_hw, det_scale=full.det_scale)


def letterbox(frames: jnp.ndarray, plan: LetterboxPlan) -> jnp.ndarray:
    """(..., H, W, C) frames -> (..., model_h, model_w, C) float32 canvas.

    Resized content sits at the top-left; padding is zeros (scrfd.py:137-138).
    """
    new_h, new_w = plan.new_hw
    mh, mw = plan.model_hw
    resized = resize_bilinear(frames, (new_h, new_w))
    pad = [(0, 0)] * (resized.ndim - 3) + [(0, mh - new_h), (0, mw - new_w), (0, 0)]
    return jnp.pad(resized, pad)
