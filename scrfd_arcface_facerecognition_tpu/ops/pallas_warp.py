"""Pallas TPU kernel: batched similarity face warp (the align hot path).

Replaces cv2.warpAffine in the reference's align step (reference
utils/helpers.py:56-59) for the TPU pipeline. XLA's gather cannot sample
112x112 crops efficiently on TPU (the 3-channel minor dim forces a
42x-padded relayout; per-tap gathers cost ~60 ns), so the warp is
decomposed into resampling passes that are legal, fast TPU operations:

    similarity warp  =  Scale(sigma) . Rot(phi)
    Rot(phi)         =  ShearX(u) . ShearY(v) . ShearX(u)     (Paeth),
                        u = -tan(phi/2), v = sin(phi)

Pass formulation (the round-3 "v2" kernel; see tools/exp_warp2.py for the
measured evolution from the original 5-pass band-mix kernel):

- **Scale passes ride the MXU**: separable x-then-y bilinear resampling is
  a banded matrix multiply with hat weights W[i, r] = max(0, 1-|a*i+g-r|).
  Weights are split hi/lo into two bf16 operands (~17 carried mantissa
  bits; u8 sources are exact in bf16), so each scale pass is 2-3 matmuls
  accumulated in f32. Measured on-chip deviation from the exact-f32 band
  kernel: max 0.009 u8 units over 320 random crops. Under interpret mode
  (CPU tests) the dots run in exact f32 instead — XLA:CPU's bf16 dot
  accumulates at lower precision than the MXU and would add ~1 u8 of
  noise that the hardware does not have.
- **Shear passes are binary shift chains**: a shear's per-lane source
  offset k = floor(u*(l-CQ)) spans < 64 rows inside the rotation
  envelope, so it is applied as 6 conditional pltpu.roll steps
  (t = where(bit_j(m), roll(t, -2^j), t)) on a zero-padded scratch,
  followed by ONE exact 2-tap lerp — O(log spread) relayouts instead of
  the O(spread) hat-weighted taps of a band mix. Bit-identical to the
  band-mix shear up to f32 summation order (measured max 0.004).

The source frame (and the 640 letterbox canvas, used as a pyramid level
for large faces) is DMA'd into VMEM once per frame as bf16 planes; the
grid iterates crops sorted by frame and re-uses the resident planes.

Measured (tools/exp_warp2.py, 16x1080p frames / 320 crops, real chip):
43.4 us/crop (5-pass band kernel) -> 18.9 us/crop (this kernel), 2.3x.

Numerics: for phi == 0 the result equals direct bilinear exactly (both
are exact separable interpolation); with rotation the multi-pass
resampling differs from single-pass bilinear by O(tan(phi)) sub-pixel tap
placement — validated against the exact XLA warp in tests (pixel atol
~1.5 at 15 degrees; embedding-level cosine effect < 1e-4).

Crops whose rotation or footprint exceeds the kernel envelope (|phi| >
PHI_MAX or canvas footprint > coverage) are flagged for the XLA fallback
path by prepare_warp_params.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Static kernel geometry.
OUT = 112            # output crop side
Q = 192              # working canvas side
PW = 512             # source x-window width (lanes), multiple of 128
R = 384              # scale-pass source row window (16-aligned)
QP = 256             # shear scratch rows (Q data + zero pad for the rolls)
NBITS = 6            # shift-chain bits: per-lane offset m in [0, 64)
CQ = (Q - 1) / 2.0   # canvas center
C0 = (OUT - 1) / 2.0  # crop center (55.5)
LANE_OFF = int(CQ - C0 + 0.5)  # 40: final lane extraction offset
SRC_MIN_H = 32       # minimum level-0 frame height

# Per-pass shear geometry: kf = beta*l + gamma with l in [0, Q) spans the
# ranges below inside the PHI_MAX envelope (u = tan(phi/2) <= 0.122,
# v = sin(phi) <= 0.24); kmin floors the span, OFF places the data region
# inside the zero-padded scratch so every read lands in bounds.
#  p3 inner shear-x: kf = u*(l-CQ)           in [-11.7, 11.7] -> kmin -16
#  p4 shear-y:       kf = v*(l-CQ)           in [-23.0, 23.0] -> kmin -28
#  p5 outer shear-x: kf = u*(l-CQ) + (CQ-C0) in [ 28.3, 51.7] -> kmin  24
P3 = dict(kmin=-16, off=16)
P4 = dict(kmin=-28, off=32)   # off 8-aligned (aligned scratch writes)
P5 = dict(kmin=24, off=0)
PHI_MAX = 0.24       # |phi| <= ~13.9 deg (v=sin(phi)<=0.24, u=tan(phi/2)<=0.122)

# The scale passes sample sigma*CQ columns either side of the crop center.
# x: the 128-aligned window origin keeps the window-local center mx in
# [192, 320); mx + sigma*CQ <= PW must hold -> sigma <= (PW-320)/CQ ~ 2.0.
# y: the 16-aligned row window origin j0 >= gamma1 - 17 must still cover
# my + sigma*CQ + 1 within R rows -> 2*sigma*CQ + 19 <= R (sigma ~ 1.91).
SIGMA_MAX = min((PW - 320) / CQ, (R - 19) / (2 * CQ))


class WarpParams(NamedTuple):
    iparams: jnp.ndarray   # (F, 8) int32: b, level, 0 (reserved), ox, pad...
                           # (rows are always full-plane; the kernel reads
                           # only indices 0, 1, 3)
    fparams: jnp.ndarray   # (F, 8) f32: sigma, u, v, my, mx, pad...
    fallback: jnp.ndarray  # (F,) bool — crop exceeds kernel envelope
    order: jnp.ndarray     # (F,) int32 — crops sorted by (frame, level)


def prepare_warp_params(matrices: jnp.ndarray, frame_idx: jnp.ndarray,
                        frame_hw: Tuple[int, int], det_scale: float,
                        canvas_hw: Tuple[int, int] = (640, 640)) -> WarpParams:
    """Decompose per-crop umeyama matrices into kernel scalars.

    matrices: (F, 2, 3) src->dst; frame_idx: (F,). Computes the inverse
    similarity, selects pyramid level 0 (full frame) or 1 (letterbox
    canvas), and the 8/128-aligned patch origin.
    """
    from .warp import invert_affine

    minv = invert_affine(matrices.astype(jnp.float32))   # dst -> src
    a = minv[:, 0, 0]
    c = minv[:, 1, 0]
    sigma0 = jnp.sqrt(a * a + c * c)
    cos_phi = a / jnp.maximum(sigma0, 1e-12)
    sin_phi = c / jnp.maximum(sigma0, 1e-12)
    u = -sin_phi / jnp.maximum(1.0 + cos_phi, 1e-6)
    v = sin_phi

    # source-space center of the crop
    cx = minv[:, 0, 0] * C0 + minv[:, 0, 1] * C0 + minv[:, 0, 2]
    cy = minv[:, 1, 0] * C0 + minv[:, 1, 1] * C0 + minv[:, 1, 2]

    # level selection: full-res when the window covers it, else the canvas
    # (frames narrower than the x-window or shorter than a minimal row
    # count can't host level 0; the 640-canvas always can).
    # warp_crops_pallas pads the plane minor dim to the 128-lane alignment
    # Mosaic requires, and rows to a 16-multiple >= R; pad pixels are
    # zero, which is exactly the zero-border the warp defines.
    frame_ok = (frame_hw[1] >= PW) & (frame_hw[0] >= SRC_MIN_H)
    level = jnp.where((sigma0 <= SIGMA_MAX) & frame_ok, 0, 1)
    lam = jnp.where(level == 0, 1.0, det_scale)
    sigma = sigma0 * lam
    cxl = cx * lam
    cyl = cy * lam

    fh, fw = frame_hw
    ch, cw = canvas_hw
    src_h = jnp.where(level == 0, fh, ch)
    src_w = jnp.where(level == 0, fw, cw)

    # canvas-level faces that still exceed the envelope -> XLA fallback.
    # cos_phi > 0 is part of the envelope: |sin(phi)| alone cannot tell
    # phi~0 from phi~180 deg, and near-inverted faces send the shear
    # u = -sin/(1+cos) far past its bound while v stays small — without
    # this term they'd slip through and the shift-chain would clip to
    # garbage rows instead of being repaired by the exact-warp path.
    fallback = ((jnp.abs(v) > PHI_MAX) | (sigma > SIGMA_MAX)
                | (cos_phi <= 0.0))

    # rows stay in full source coordinates (whole planes are VMEM-resident);
    # only the x-window needs a 128-aligned origin. The upper clamp must
    # itself be 128-aligned (the kernel promises pl.multiple_of(ox, 128) to
    # Mosaic): clamp against the lane-PADDED width. Sources narrower than
    # PW never reach here: level 0 requires fw >= PW and the canvas is
    # floored at 512 wide (ops.tight_letterbox_plan min_hw).
    oy = jnp.zeros_like(src_h)
    padded_w = ((src_w + 127) // 128) * 128
    # round to the NEAREST 128 (not floor): flooring put the window-local
    # center mx in [256, 384), so near-SIGMA_MAX crops at unlucky phases
    # sampled past PW and silently zeroed their right edge; nearest keeps
    # mx in [192, 320) and 320 + SIGMA_MAX*CQ <= PW. Edge clamps only
    # shift mx where out-of-window taps are true zero-border anyway.
    ox = jnp.clip((((cxl - PW / 2 + 64) // 128).astype(jnp.int32)) * 128, 0,
                  jnp.maximum(padded_w - PW, 0))
    my = cyl
    mx = cxl - ox.astype(jnp.float32)

    f = matrices.shape[0]
    iparams = jnp.stack([
        frame_idx.astype(jnp.int32), level.astype(jnp.int32), oy, ox,
        jnp.zeros((f,), jnp.int32), jnp.zeros((f,), jnp.int32),
        jnp.zeros((f,), jnp.int32), jnp.zeros((f,), jnp.int32)], axis=1)
    fparams = jnp.stack([
        sigma, u, v, my, mx,
        jnp.zeros((f,)), jnp.zeros((f,)), jnp.zeros((f,))], axis=1)
    order = jnp.argsort(frame_idx * 2 + level, stable=True).astype(jnp.int32)
    return WarpParams(iparams=iparams, fparams=fparams, fallback=fallback,
                      order=order)


def _hat_weights(alpha, gamma, n_out: int, n_src: int, transpose=False):
    """f32 hat weights W[i, r] = max(0, 1 - |alpha*i + gamma - r|), shape
    (n_out, n_src), or built directly as (n_src, n_out) when transpose."""
    shape = (n_src, n_out) if transpose else (n_out, n_src)
    di, dr = (1, 0) if transpose else (0, 1)
    i = jax.lax.broadcasted_iota(jnp.int32, shape, di).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, dr).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(alpha * i + gamma - r))


# The lo half is pre-scaled by 2^9 (exact) and unscaled after its matmul:
# without this, XLA's algebraic simplifier merges dot(A, hi) + dot(A, lo)
# into dot(A, hi + lo) whose operand ADD runs in bf16 — silently
# destroying the split (measured: exactly +-0.5 errors). A scaled lo makes
# the rewrite invalid. Mosaic compiles the on-TPU kernel, but
# defense-in-depth costs one exact multiply.
LO_SCALE = 512.0


def _hilo(w):
    hi = w.astype(jnp.bfloat16)
    lo = ((w - hi.astype(jnp.float32)) * LO_SCALE).astype(jnp.bfloat16)
    return hi, lo


def _scale_mm(src_vm, src_rows: int, j0, ox, sigma, my, mx, exact: bool):
    """Both scale passes as MXU matmuls: returns (3, Q, Q) f32, y-major.

    src_vm: (3, rows, lanes) bf16 plane ref. Window rows [j0, j0+R)
    (j0 16-aligned), cols [ox, ox+PW). x-first: C = srcwin @ W2T
    ((3,R,PW)@(PW,Q)), then A = W1 @ C ((Q,R)@(3,R,Q)).

    exact=True (interpret mode): single f32 dots — XLA:CPU's bf16 dot
    accumulates at lower precision than the MXU and is not representative
    of the hardware. exact=False (Mosaic): bf16 hi/lo split operands,
    f32 accumulation; weights carry ~17 mantissa bits and u8 sources are
    exact in bf16 (measured max 0.009 u8 vs exact over random crops).
    """
    gamma_y = my - sigma * CQ
    gamma_x = mx - sigma * CQ
    w2t = _hat_weights(sigma, gamma_x, Q, PW, transpose=True)  # (PW, Q)
    w1 = _hat_weights(sigma, gamma_y - j0.astype(jnp.float32), Q, R)  # (Q, R)

    if exact:
        outs = []
        for ch in range(3):
            srcw = src_vm[ch, pl.ds(j0, R), pl.ds(ox, PW)].astype(jnp.float32)
            c = jnp.dot(srcw, w2t, preferred_element_type=jnp.float32)
            outs.append(jnp.dot(w1, c, preferred_element_type=jnp.float32))
        return jnp.stack(outs, axis=0)

    w2t_hi, w2t_lo = _hilo(w2t)
    w1_hi, w1_lo = _hilo(w1)
    inv = 1.0 / LO_SCALE
    outs = []
    for ch in range(3):
        srcw = src_vm[ch, pl.ds(j0, R), pl.ds(ox, PW)]   # (R, PW) bf16
        c = (jnp.dot(srcw, w2t_hi, preferred_element_type=jnp.float32)
             + jnp.dot(srcw, w2t_lo, preferred_element_type=jnp.float32)
             * inv)
        c_hi, c_lo = _hilo(c)
        a = (jnp.dot(w1_hi, c_hi, preferred_element_type=jnp.float32)
             + jnp.dot(w1_hi, c_lo, preferred_element_type=jnp.float32)
             * inv
             + jnp.dot(w1_lo, c_hi, preferred_element_type=jnp.float32)
             * inv)
        outs.append(a)
    return jnp.stack(outs, axis=0)                        # (3, Q, Q) y-major


def _shear_shift(buf_ref, beta, gamma, kmin: int, off: int, n_out: int,
                 rows: int):
    """One shear pass over a zero-padded scratch via a binary roll chain.

    buf_ref: (3, rows, Q) f32 with the pass input at rows [off, off+Q) and
    zeros elsewhere. Computes out[x, l] = lerp(data[x + k_l], f_l) where
    kf = beta*l + gamma, k = floor(kf), f = kf - k. The per-lane integer
    offset m = k - kmin in [0, 64) is applied as NBITS conditional
    pltpu.roll steps; reads past the data region land on the zero pad,
    which is the zero-border the warp defines. Returns (3, n_out, Q).
    """
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1).astype(jnp.float32)
    kf = beta * lanes + gamma                            # (1, Q)
    k = jnp.floor(kf)
    m = jnp.clip(k.astype(jnp.int32) - kmin, 0, (1 << NBITS) - 1)  # (1, Q)
    t = buf_ref[:]                                       # (3, rows, Q)
    for j in range(NBITS):
        bit = ((m >> j) & 1)[None].astype(jnp.bool_)     # (1, 1, Q)
        t = jnp.where(bit, pltpu.roll(t, rows - (1 << j), axis=1), t)
    # t[y] = buf[(y + m) mod rows] = data[y + m - off]
    s = kmin + off                                       # static read offset
    a = t[:, s:s + n_out, :]
    b = t[:, s + 1:s + 1 + n_out, :]
    # two-product hat arithmetic (matches the exact warp's lerp exactly)
    fpos = kf - k
    wa = (1.0 - jnp.abs(fpos))[None]
    wb = (1.0 - jnp.abs(fpos - 1.0))[None]
    return a * wa + b * wb


def _make_kernel(exact_dots: bool):
    def kernel(iparams, fparams, frames_hbm, canvas_hbm, out_ref,
               frame_vm, canvas_vm, buf_b, s3, s4, s5, last_b_smem, sem):
        k = pl.program_id(0)
        b = iparams[k, 0]
        level = iparams[k, 1]
        ox = pl.multiple_of(iparams[k, 3], 128)
        sigma = fparams[k, 0]
        u = fparams[k, 1]
        v = fparams[k, 2]
        my = fparams[k, 3]
        mx = fparams[k, 4]

        fh = frames_hbm.shape[2]
        ch = canvas_hbm.shape[2]

        @pl.when(k == 0)
        def _():
            # zero the shear scratch pads once; the data regions are
            # overwritten per crop and the pads are never touched again
            s3[:] = jnp.zeros_like(s3)
            s4[:] = jnp.zeros_like(s4)

        # ---- frame-resident DMA: reload planes only when the frame changes
        @pl.when((last_b_smem[0] != b) | (k == 0))
        def _():
            cp1 = pltpu.make_async_copy(frames_hbm.at[b], frame_vm, sem)
            cp1.start()
            cp1.wait()
            cp2 = pltpu.make_async_copy(canvas_hbm.at[b], canvas_vm, sem)
            cp2.start()
            cp2.wait()
            last_b_smem[0] = b

        # ---- scale passes (MXU): y-window origin then x-then-y matmuls.
        # Positions are in full source-row coordinates; rows are padded to
        # a 16-multiple >= R so the 16-aligned j0 clamp never truncates
        # bottom coverage (pad rows are zero = the warp's zero border).
        gamma1 = my - sigma * CQ

        def scaled(src_vm, rows):
            j0 = jnp.clip(
                ((jnp.floor(gamma1).astype(jnp.int32) - 1) // 16) * 16,
                0, rows - R)
            j0 = pl.multiple_of(j0, 16)
            return _scale_mm(src_vm, rows, j0, ox, sigma, my, mx,
                             exact=exact_dots)

        @pl.when(level == 0)
        def _():
            buf_b[:] = scaled(frame_vm, fh)

        @pl.when(level != 0)
        def _():
            buf_b[:] = scaled(canvas_vm, ch)

        # buf_b is y-major (iy, ix); the shears want x-major
        a_xmajor = jnp.swapaxes(buf_b[:], -1, -2)

        # ---- Paeth shears as shift chains -------------------------------
        # p3 inner ShearX (x-major): pos = ix + u*(l - CQ)
        s3[:, P3["off"]:P3["off"] + Q, :] = a_xmajor
        p3 = _shear_shift(s3, u, -u * CQ, P3["kmin"], P3["off"], Q, QP)
        # p4 ShearY (y-major): pos = iy + v*(l - CQ)
        s4[:, P4["off"]:P4["off"] + Q, :] = jnp.swapaxes(p3, -1, -2)
        p4 = _shear_shift(s4, v, -v * CQ, P4["kmin"], P4["off"], Q, QP)
        # p5 outer ShearX, emitting final rows (x-major):
        # OUT^T[x, l=y] = D(x + u*(l - CQ) + (CQ - C0), l), x in [0, OUT).
        # kf >= 24 here, so reads stay inside [24, 168) of the unpadded
        # Q-row scratch: no pad region needed.
        s5[:] = jnp.swapaxes(p4, -1, -2)
        p5 = _shear_shift(s5, u, jnp.float32(CQ - C0) - u * CQ,
                          P5["kmin"], P5["off"], OUT, Q)
        out_ref[0] = p5

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_crops_pallas(frames_planar: jnp.ndarray, canvas_planar: jnp.ndarray,
                      params: WarpParams, interpret: bool = False
                      ) -> jnp.ndarray:
    """Run the kernel. frames_planar (B, 3, H, W) u8; canvas_planar
    (B, 3, 640, 640) u8; params from prepare_warp_params (crops pre-sorted
    by `order` happens here). Returns (F, 112, 112, 3) f32 crops in the
    ORIGINAL crop order (x-major result is transposed back).
    """
    f = params.iparams.shape[0]
    ip = params.iparams[params.order]
    fp = params.fparams[params.order]

    # bf16 source planes: u8 pixel values convert exactly (8-bit mantissa
    # covers 0..255) and they feed the scale matmuls as MXU operands
    # directly. One fused XLA cast per batch; planes stay u8 in HBM
    # upstream.
    frames_planar = frames_planar.astype(jnp.bfloat16)
    canvas_planar = canvas_planar.astype(jnp.bfloat16)

    # Mosaic requires 128-aligned minor dims for the plane DMAs, and the
    # kernel always reads a PW-lane x-window: pad the source widths to
    # max(128-aligned, PW). The PW floor is a correctness requirement, not
    # an optimization — planes narrower than PW (detector inputs < 512
    # wide give a canvas narrower than the 512-lane tight_letterbox_plan
    # floor, which caps at model_hw) would otherwise be read out of
    # bounds, producing garbage crops -> NaN embeddings (found by the
    # decision-quality eval at det_size 320, tools/exp_decisions.py).
    # Padded lanes are zero, which is exactly the warp's zero border, so
    # narrow sources are handled EXACTLY: the [0, PW) window covers the
    # whole plane.
    def pad_lanes(p):
        w = p.shape[-1]
        target = max(PW, ((w + 127) // 128) * 128)
        if target > w:
            p = jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, target - w)])
        return p

    # rows padded to a 16-multiple >= R so the 16-aligned j0 window clamp
    # never truncates bottom coverage (pad rows are zero, which is exactly
    # the zero-border the warp defines)
    def pad_rows(p):
        h = p.shape[-2]
        target = max(R, ((h + 15) // 16) * 16)
        if target > h:
            p = jnp.pad(p, [(0, 0)] * (p.ndim - 2)
                        + [(0, target - h), (0, 0)])
        return p

    frames_planar = pad_rows(pad_lanes(frames_planar))
    canvas_planar = pad_rows(pad_lanes(canvas_planar))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(f,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 3, OUT, Q), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM(frames_planar.shape[1:], jnp.bfloat16),  # frame planes
            pltpu.VMEM(canvas_planar.shape[1:], jnp.bfloat16),  # canvas planes
            pltpu.VMEM((3, Q, Q), jnp.float32),    # scale output (y-major)
            pltpu.VMEM((3, QP, Q), jnp.float32),   # shear scratch p3
            pltpu.VMEM((3, QP, Q), jnp.float32),   # shear scratch p4
            pltpu.VMEM((3, Q, Q), jnp.float32),    # shear scratch p5
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _make_kernel(exact_dots=interpret),
        out_shape=jax.ShapeDtypeStruct((f, 3, OUT, Q), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(ip, fp, frames_planar, canvas_planar)

    # x-major (F, C, x=OUT, lanes=y-canvas) -> slice lanes, restore order,
    # and convert to NHWC: out[f, c, x, y+LANE_OFF] == crop[y, x, c].
    crops_sorted = out[:, :, :, LANE_OFF:LANE_OFF + OUT]     # (F, C, X, Y)
    inv = jnp.zeros((f,), jnp.int32).at[params.order].set(
        jnp.arange(f, dtype=jnp.int32))
    crops = crops_sorted[inv]
    return jnp.transpose(crops, (0, 3, 2, 1))                # (F, Y, X, C)


def planarize(frames: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) u8 -> (B, 3, H, W) u8 (kernel-friendly layout)."""
    return jnp.transpose(frames, (0, 3, 1, 2))
