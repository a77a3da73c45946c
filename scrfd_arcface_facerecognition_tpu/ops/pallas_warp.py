"""Pallas TPU kernel: batched similarity face warp (the align hot path).

XLA's gather cannot sample 112x112 crops efficiently on TPU (the 3-channel
minor dim forces a 42x-padded relayout; per-tap gathers cost ~60 ns). This
kernel replaces the gather entirely with resampling passes that are legal,
fast TPU operations:

    similarity warp  =  Scale(sigma) . Rot(phi)
    Rot(phi)         =  ShearX(u) . ShearY(v) . ShearX(u)     (Paeth),
                        u = -tan(phi/2), v = sin(phi)

Every pass is a "band mix": output row-groups are hat-weighted sums over an
8-aligned band of source rows, with weights that may vary along lanes —
pure VPU work, no gathers, no lane-dynamic slices. Shears run in the
orientation where their shift is a row-position term (3 in-kernel
transposes). The source frame (and the 640 letterbox canvas, used as a
pyramid level for large faces) is DMA'd into VMEM once per frame as bf16
planes (u8 values are exact in bf16; the 16-bit tile halves the pass-1
band an 8-bit source would need): the grid iterates crops sorted by frame
and re-uses the resident planes.

Numerics: passes are exact f32 linear interpolation. For phi == 0 the result
equals direct bilinear exactly; with rotation the multi-pass resampling
differs from single-pass bilinear by O(tan(phi)) sub-pixel tap placement —
validated against the exact XLA warp in tests (pixel atol ~1.5 at 15
degrees; embedding-level cosine effect < 1e-4).

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
G = 8                # output rows per band-mix group
CQ = (Q - 1) / 2.0   # canvas center
C0 = (OUT - 1) / 2.0  # crop center (55.5)
LANE_OFF = int(CQ - C0 + 0.5)  # 40: final lane extraction offset

# Band coverage requirement per pass: alpha*(G-1) + |beta|*(Q-1) + align
# slack (align-1 + floor slack 1) + 2 interp taps <= BAND.
# Pass-1 reads bf16 source planes (u8 pixel values are exact in bf16): the
# 16-bit sublane tile allows 16-aligned dynamic bands, halving the band an
# 8-bit source would need (32-aligned -> BAND 64). Pass 1 is ~half of the
# kernel's tap work (its lanes are PW=512 vs Q=192 elsewhere), so this
# matters more than the 2x plane-byte increase it costs in VMEM.
BAND_SRC = 32        # pass-1 band (bf16 source, 16-aligned): sigma*7+19 <= 32
BAND_SCALE = 40      # pass-2 band (f32, 8-aligned): sigma*7+10 <= 40
BAND_HX = 48         # shear-x: |u|*191 + 17 <= 48 -> |u| <= 0.162
BAND_VY = 72         # shear-y: |v|*191 + 17 <= 72 -> |v| <= 0.287
PHI_MAX = 0.24       # |phi| <= ~13.9 deg (v=sin(phi)<=0.24, u=tan(phi/2)<=0.122)
# The scale passes sample sigma*CQ columns either side of the crop center;
# the 128-aligned window must cover it: 2*sigma*CQ + 132 <= PW (~1.97).
# The pass-1 band adds its own bound: sigma*(G-1) + 19 <= BAND_SRC (~1.86),
# which binds first. Per level; the canvas level rescales sigma by
# det_scale, so only degenerate crops fall back.
SIGMA_MAX = min((PW - 136) / (2 * CQ), (BAND_SRC - 19) / (G - 1))


class WarpParams(NamedTuple):
    iparams: jnp.ndarray   # (F, 8) int32: b, level, oy, ox, pad...
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
    # (frames narrower than the x-window or shorter than a band can't host
    # level 0; the 640-canvas always can). warp_crops_pallas pads the plane
    # minor dim to the 128-lane alignment Mosaic requires, and the level-0
    # window ox+PW <= frame width only ever reads real pixels.
    frame_ok = (frame_hw[1] >= PW) & (frame_hw[0] >= BAND_SRC)
    level = jnp.where((sigma0 <= SIGMA_MAX) & frame_ok, 0, 1)
    lam = jnp.where(level == 0, 1.0, det_scale)
    sigma = sigma0 * lam
    cxl = cx * lam
    cyl = cy * lam

    fh, fw = frame_hw
    ch, cw = canvas_hw
    src_h = jnp.where(level == 0, fh, ch)
    src_w = jnp.where(level == 0, fw, cw)

    # canvas-level faces that still exceed the envelope -> XLA fallback
    fallback = (jnp.abs(v) > PHI_MAX) | (sigma > SIGMA_MAX)

    # rows stay in full source coordinates (whole planes are VMEM-resident);
    # only the x-window needs a 128-aligned origin. The upper clamp must
    # itself be 128-aligned (the kernel promises pl.multiple_of(ox, 128) to
    # Mosaic): clamp against the lane-PADDED width (warp_crops_pallas pads
    # planes to 128 multiples; taps past the logical width read those zero
    # lanes, which is exactly the zero-border the warp defines). Sources
    # narrower than PW never reach here: level 0 requires fw >= PW and the
    # canvas is floored at 512 wide (ops.tight_letterbox_plan min_hw).
    oy = jnp.zeros_like(src_h)
    padded_w = ((src_w + 127) // 128) * 128
    # round to the NEAREST 128 (not floor): flooring put the window-local
    # center mx in [256, 384), so near-SIGMA_MAX crops at unlucky phases
    # sampled past PW and silently zeroed their right edge; nearest keeps
    # mx in [192, 320) and 320 + SIGMA_MAX*CQ = 497 < PW. Edge clamps only
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


def _band_mix(dst_ref, src_ref, n_out: int, src_rows: int, width: int,
              band: int, alpha, beta, gamma, align: int = 8,
              cast: bool = False):
    """dst[iy, l] = sum_r hat(pos(iy, l) - r) * src[r, l] over an aligned
    dynamic band; pos = alpha*iy + beta*l + gamma (alpha > 0). Shapes:
    dst (C, n_out, W), src (C, src_rows, W). One aligned band read per
    8-row output group, static in-band row indexing, exact f32 linear
    interpolation; zero-border falls out of the hat weights.
    """
    c = dst_ref.shape[0]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1).astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).astype(jnp.float32)
    beta_min = jnp.minimum(beta * 0.0, beta * float(width - 1))

    def body(g, _):
        base = pl.multiple_of(g * G, G)
        basef = base.astype(jnp.float32)
        pos = (alpha * (basef + row_ids) + beta * lane_ids + gamma)  # (G, W)
        lo = alpha * basef + beta_min + gamma
        j0 = jnp.floor(lo).astype(jnp.int32) - 1
        j0 = jnp.clip(j0, 0, max(src_rows - band, 0))
        j0 = pl.multiple_of((j0 // align) * align, align)
        j0f = j0.astype(jnp.float32)
        band_arr = src_ref[:, pl.ds(j0, band), :]
        if cast:
            band_arr = band_arr.astype(jnp.float32)
        acc = jnp.zeros((c, G, width), jnp.float32)
        for r in range(band):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(pos - (j0f + r)))   # (G, W)
            acc = acc + band_arr[:, r:r + 1, :] * w[None, :, :]
        dst_ref[:, pl.ds(base, G), :] = acc
        return 0

    jax.lax.fori_loop(0, n_out // G, body, 0, unroll=False)


def _warp_kernel(iparams, fparams, frames_hbm, canvas_hbm, out_ref,
                 frame_vm, canvas_vm, buf_a, buf_at, buf_b, buf_c,
                 last_b_smem, sem):
    k = pl.program_id(0)
    b = iparams[k, 0]
    level = iparams[k, 1]
    ox = pl.multiple_of(iparams[k, 3], 128)
    sigma = fparams[k, 0]
    u = fparams[k, 1]
    v = fparams[k, 2]
    my = fparams[k, 3]
    mx = fparams[k, 4]

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

    fh = frames_hbm.shape[2]
    ch = canvas_hbm.shape[2]

    # ---- pass 1: vertical scale from the source plane window ------------
    # A[iy, l] = SRC(my + sigma*(iy - CQ), ox + l), rows in source coords.
    gamma1 = my - sigma * CQ

    # NOTE: pass-1 positions are in full source-row coordinates (not
    # oy-relative) so the band clamp handles top/bottom borders exactly.
    @pl.when(level == 0)
    def _():
        src = frame_vm.at[:, :, pl.ds(ox, PW)]
        _band_mix(buf_a, src, Q, fh, PW, BAND_SRC,
                  sigma, jnp.float32(0.0), gamma1, align=16, cast=True)

    @pl.when(level != 0)
    def _():
        src = canvas_vm.at[:, :, pl.ds(ox, PW)]
        _band_mix(buf_a, src, Q, ch, PW, BAND_SRC,
                  sigma, jnp.float32(0.0), gamma1, align=16, cast=True)

    # ---- transpose A (C, Q, PW) -> (C, PW, Q) ---------------------------
    buf_at[:] = jnp.swapaxes(buf_a[:], -1, -2)

    # ---- pass 2: horizontal scale (on transposed) -----------------------
    # B'[ix, l=y] = At(mx + sigma*(ix - CQ), l)   [x-major; mx is
    # window-relative already]
    gamma2 = mx - sigma * CQ
    _band_mix(buf_b, buf_at, Q, PW, Q, BAND_SCALE,
              sigma, jnp.float32(0.0), gamma2)

    # ---- pass 3: inner ShearX (x-major): pos = ix + u*(l - CQ) ----------
    _band_mix(buf_c, buf_b, Q, Q, Q, BAND_HX,
              jnp.float32(1.0), u, -u * CQ)

    # ---- transpose -> y-major -------------------------------------------
    buf_b[:] = jnp.swapaxes(buf_c[:], -1, -2)

    # ---- pass 4: ShearY (y-major): pos = iy + v*(l - CQ) ----------------
    _band_mix(buf_c, buf_b, Q, Q, Q, BAND_VY,
              jnp.float32(1.0), v, -v * CQ)

    # ---- transpose -> x-major -------------------------------------------
    buf_b[:] = jnp.swapaxes(buf_c[:], -1, -2)

    # ---- pass 5: outer ShearX, emitting final rows (x-major) ------------
    # OUT^T[x, l=y] = Dt(x + u*(l - CQ) + (CQ - C0), l), x in [0, OUT)
    _band_mix(buf_c, buf_b, OUT, Q, Q, BAND_HX,
              jnp.float32(1.0), u, jnp.float32(CQ - C0) - u * CQ)

    out_ref[0] = buf_c[:, :OUT, :]


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

    # bf16 source planes: u8 pixel values convert exactly (7 mantissa bits
    # cover 0..255) and the 16-bit sublane tile halves the pass-1 band (see
    # BAND_SRC). One fused XLA cast per batch; planes stay u8 in HBM
    # upstream.
    frames_planar = frames_planar.astype(jnp.bfloat16)
    canvas_planar = canvas_planar.astype(jnp.bfloat16)

    # Mosaic requires 128-aligned minor dims for the plane DMAs; pad the
    # source widths (faces preferring level 0 on an unalignable frame are
    # fallback-flagged by prepare_warp_params, so padded lanes are only
    # read under the "force" policy, which documents the degradation).
    def pad_lanes(p):
        w = p.shape[-1]
        pad = (-w) % 128
        if pad:
            p = jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, pad)])
        return p

    frames_planar = pad_lanes(frames_planar)
    canvas_planar = pad_lanes(canvas_planar)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(f,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 3, OUT, Q), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM(frames_planar.shape[1:], jnp.bfloat16),  # frame planes
            pltpu.VMEM(canvas_planar.shape[1:], jnp.bfloat16),  # canvas planes
            pltpu.VMEM((3, Q, PW), jnp.float32),              # A
            pltpu.VMEM((3, PW, Q), jnp.float32),              # A^T
            pltpu.VMEM((3, Q, Q), jnp.float32),               # ping
            pltpu.VMEM((3, Q, Q), jnp.float32),               # pong
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _warp_kernel,
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
