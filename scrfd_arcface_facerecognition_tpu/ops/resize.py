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
11 bits) and rounds to uint8; the default path here computes in float32. The
difference is below 1 LSB per pixel and covered by test tolerances
(tests/test_ops_resize_warp.py). For bit-exactness, `resize_bilinear_u8_exact`
reproduces cv2's integer pipeline (11-bit short coefficients, the u8 vertical
descale `((b*(H>>4))>>16 + ... + 2) >> 2`) and is tested array_equal vs cv2.
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


def resize_bilinear(images: jnp.ndarray, out_hw: Tuple[int, int],
                    dtype=None) -> jnp.ndarray:
    """(..., H, W, C) -> (..., h, w, C) float32, cv2 INTER_LINEAR semantics.

    dtype selects the einsum compute precision: None/f32 is the
    cv2-parity default; bf16 halves the matmul time on TPU (the detector
    consumes the canvas in bf16 anyway — <=1 intensity LSB difference,
    inside the pipeline's 1e-3 budget; see test_bf16_letterbox_close).
    """
    h_in, w_in = images.shape[-3], images.shape[-2]
    h_out, w_out = out_hw
    ct = dtype or jnp.float32
    wy = jnp.asarray(_interp_matrix(h_out, h_in)).astype(ct)
    wx = jnp.asarray(_interp_matrix(w_out, w_in)).astype(ct)
    x = images.astype(ct)
    x = jnp.einsum("oh,...hwc->...owc", wy, x)
    x = jnp.einsum("pw,...owc->...opc", wx, x)
    return x.astype(jnp.float32)


# ----------------------------------------------------------------------
# Exact cv2 uint8 fixed-point path
# ----------------------------------------------------------------------

_COEF_BITS = 11                       # INTER_RESIZE_COEF_BITS
_COEF_SCALE = 1 << _COEF_BITS         # 2048


@functools.lru_cache(maxsize=64)
def _fixed_taps(dst_size: int, src_size: int, horizontal: bool):
    """cv2 u8 resize taps: (idx0, idx1, a0, a1) int arrays of length dst.

    Mirrors imgproc/resize.cpp coefficient setup: half-pixel mapping,
    cvFloor, then short quantization saturate_cast<short>(coef * 2048) with
    cvRound's round-half-to-even (np.rint matches). Border handling differs
    by axis (verified bit-exact vs cv2 in tests): the horizontal tap setup
    clamps the coefficient too (sx<0 -> fx=0; sx>=w-1 -> fx=0, sx=w-1),
    while the vertical pass (resizeGeneric_ row fetch) only clips the row
    index and KEEPS the fractional beta — border rows mix the replicated
    row with split coefficients, which rounds differently from a single
    2048 tap.
    """
    scale = src_size / dst_size
    idx0 = np.zeros(dst_size, np.int32)
    idx1 = np.zeros(dst_size, np.int32)
    a0 = np.zeros(dst_size, np.int32)
    a1 = np.zeros(dst_size, np.int32)
    one = np.float32(1.0)
    coef = np.float32(_COEF_SCALE)
    for d in range(dst_size):
        # cv2 works in float32 from this cast on; the f32-vs-double coef
        # rounding differs by 1 LSB on ~1e-4 of pixels, so mirror it exactly.
        fx = np.float32((d + 0.5) * scale - 0.5)
        sx = int(np.floor(fx))
        fx = np.float32(fx - sx)
        if horizontal:
            if sx < 0:
                fx, sx = np.float32(0.0), 0
            if sx >= src_size - 1:
                fx, sx = np.float32(0.0), src_size - 1
            idx0[d] = sx
            idx1[d] = min(sx + 1, src_size - 1)
        else:
            idx0[d] = min(max(sx, 0), src_size - 1)
            idx1[d] = min(max(sx + 1, 0), src_size - 1)
        a0[d] = int(np.rint((one - fx) * coef))
        a1[d] = int(np.rint(fx * coef))
    return idx0, idx1, a0, a1


def resize_bilinear_u8_exact(images: jnp.ndarray,
                             out_hw: Tuple[int, int]) -> jnp.ndarray:
    """(..., H, W, C) uint8 -> (..., h, w, C) uint8, bit-exact to
    cv2.resize(INTER_LINEAR) on uint8 inputs.

    cv2 resizes u8 through an integer pipeline (resize.cpp HResizeLinear /
    VResizeLinear<uchar>): horizontal pass accumulates src*short_coef into
    int32 rows; the u8 vertical pass then computes
        dst = uchar(((b0*(H0>>4))>>16) + ((b1*(H1>>4))>>16) + 2) >> 2.
    The horizontal pass fits exactly in f32 integers (<= 255*2048*2 < 2^24),
    so it runs as the same two-matmul form as the float path; the vertical
    descale needs true int32 shifts and runs on the VPU. Used behind the
    `exact_u8=True` flag where bit-parity matters more than speed.
    """
    if images.dtype != jnp.uint8:
        raise ValueError(f"exact u8 resize needs uint8 input, got {images.dtype}")
    h_in, w_in = images.shape[-3], images.shape[-2]
    h_out, w_out = out_hw
    if h_in == 2 * h_out and w_in == 2 * w_out:
        # cv2 silently reroutes exact 2x-down INTER_LINEAR to the INTER_AREA
        # fast path (resize.cpp: "if is_area_fast && iscale == 2"):
        # dst = (s00 + s01 + s10 + s11 + 2) >> 2.
        x = images.astype(jnp.int32)
        s = (x[..., 0::2, 0::2, :] + x[..., 0::2, 1::2, :]
             + x[..., 1::2, 0::2, :] + x[..., 1::2, 1::2, :])
        return ((s + 2) >> 2).astype(jnp.uint8)
    xi0, xi1, xa0, xa1 = _fixed_taps(w_out, w_in, horizontal=True)
    yi0, yi1, yb0, yb1 = _fixed_taps(h_out, h_in, horizontal=False)

    # horizontal pass as an exact-integer f32 matmul: (w_out, w_in) matrix
    wx = np.zeros((w_out, w_in), np.float32)
    for d in range(w_out):
        wx[d, xi0[d]] += xa0[d]
        wx[d, xi1[d]] += xa1[d]
    hrows = jnp.einsum("pw,...hwc->...hpc", jnp.asarray(wx),
                       images.astype(jnp.float32))
    hrows = hrows.astype(jnp.int32) >> 4                      # S >> 4

    r0 = jnp.take(hrows, jnp.asarray(yi0), axis=-3)
    r1 = jnp.take(hrows, jnp.asarray(yi1), axis=-3)
    b0 = jnp.asarray(yb0, jnp.int32).reshape((-1, 1, 1))
    b1 = jnp.asarray(yb1, jnp.int32).reshape((-1, 1, 1))
    acc = ((b0 * r0) >> 16) + ((b1 * r1) >> 16)
    out = (acc + 2) >> 2
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


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
    # pyramid level 1 needs >= SRC_MIN_H rows and a PW-lane x-window
    # (ops/pallas_warp.py) — portrait frames would otherwise trim the
    # canvas narrower than the window.
    mh = min(full.model_hw[0], max(min_hw[0], -(-nh // multiple) * multiple))
    mw = min(full.model_hw[1], max(min_hw[1], -(-nw // multiple) * multiple))
    return LetterboxPlan(frame_hw=full.frame_hw, model_hw=(mh, mw),
                         new_hw=full.new_hw, det_scale=full.det_scale)


def letterbox_matrices(frame_hw: Tuple[int, int],
                       padded_hw: Tuple[int, int],
                       model_hw: Tuple[int, int] = (640, 640)):
    """Full per-image letterbox matrices for heterogeneous batching.

    Returns (wy (model_h, padded_h), wx (model_w, padded_w), det_scale):
    the interpolation taps are built from the ORIGINAL frame_hw, rows past
    the resized content are all-zero (they produce the zero letterbox pad),
    and columns past the content are never tapped — so applying these to a
    zero-padded (padded_hw) buffer yields exactly the canvas that
    exact-shape letterboxing of the original image would (adding zero terms
    is exact in f32). This is what makes shape-bucketed web ingestion
    numerically identical to per-shape processing (apps/clustering.py).
    """
    plan = letterbox_plan(frame_hw, model_hw)
    nh, nw = plan.new_hw
    fh, fw = frame_hw
    ph, pw = padded_hw
    mh, mw = model_hw
    if ph < fh or pw < fw:
        raise ValueError(f"padded {padded_hw} smaller than frame {frame_hw}")
    wy = np.zeros((mh, ph), np.float32)
    wy[:nh, :fh] = _interp_matrix(nh, fh)
    wx = np.zeros((mw, pw), np.float32)
    wx[:nw, :fw] = _interp_matrix(nw, fw)
    return wy, wx, plan.det_scale


def letterbox_dynamic(frames: jnp.ndarray, wy: jnp.ndarray,
                      wx: jnp.ndarray) -> jnp.ndarray:
    """(B, Hp, Wp, C) frames + per-image matrices -> (B, mh, mw, C) f32.

    wy: (B, mh, Hp); wx: (B, mw, Wp) from letterbox_matrices, stacked.
    """
    x = frames.astype(jnp.float32)
    x = jnp.einsum("boh,bhwc->bowc", wy, x)
    return jnp.einsum("bpw,bowc->bopc", wx, x)


def letterbox(frames: jnp.ndarray, plan: LetterboxPlan,
              exact_u8: bool = False, dtype=None) -> jnp.ndarray:
    """(..., H, W, C) frames -> (..., model_h, model_w, C) float32 canvas.

    Resized content sits at the top-left; padding is zeros (scrfd.py:137-138).
    exact_u8=True routes uint8 frames through the bit-exact cv2 fixed-point
    resize (resize_bilinear_u8_exact) before the float conversion.
    """
    new_h, new_w = plan.new_hw
    mh, mw = plan.model_hw
    if exact_u8 and frames.dtype == jnp.uint8:
        resized = resize_bilinear_u8_exact(frames, (new_h, new_w))
        resized = resized.astype(jnp.float32)
    else:
        resized = resize_bilinear(frames, (new_h, new_w), dtype=dtype)
    pad = [(0, 0)] * (resized.ndim - 3) + [(0, mh - new_h), (0, mw - new_w), (0, 0)]
    return jnp.pad(resized, pad)
