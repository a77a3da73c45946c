"""Experiment (CONCLUDED, round 3): reformulated pallas warp passes.

The original production warp kernel was 5 band-mix passes (hat-weighted
sums over an aligned band of source rows — pure VPU work). Two findings,
measured on the real chip (16x1080p frames / 320 crops, 10 iters):

    kernel                          ms      us/crop   vs band (u8 units)
    5-pass band (original)        13.88       43.4    —
    band scale + shift shears      9.64       30.1    max 0.004
    mm scale   + shift shears      6.05       18.9    max 0.009  <- adopted

  * scale-as-matmul ("mm"): separable x-then-y bilinear resampling IS a
    banded matrix multiply; bf16 hi/lo split operands with f32
    accumulation put the resample on the idle MXU. On-chip deviation vs
    the exact band path: max 0.009 u8. (XLA:CPU's bf16 dot accumulates
    at lower precision — interpret mode showed max 1.2 u8 — so the
    production kernel uses exact f32 dots under interpret.)
  * shears-as-shift-chains ("shift"): the per-lane integer source offset
    spans < 64 rows inside the rotation envelope, so it is applied as 6
    conditional pltpu.roll steps + ONE exact 2-tap lerp — O(log spread)
    relayouts instead of O(spread) hat-weighted taps.

Both were integrated as the production kernel in ops/pallas_warp.py
(2.3x: 43.4 -> 18.9 us/crop). This script retains the ORIGINAL band
kernel inline (moved out of the production module) so the comparison
stays reproducible:

Run: python tools/exp_warp2.py [--check] [--batch 16] [--faces 320]
  --check: interpret-mode small-case parity (band vs production vs exact).

Gotcha for future kernels: XLA's algebraic simplifier merges
dot(A, hi) + dot(A, lo) into dot(A, hi + lo) whose operand ADD runs in
bf16, silently destroying a hi/lo split (measured: exactly +-0.5
errors). Pre-scaling lo by 2^9 (exact) and unscaling after the dot makes
the rewrite invalid; see LO_SCALE in ops/pallas_warp.py.
"""
import argparse
import functools
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scrfd_arcface_facerecognition_tpu import ops
from scrfd_arcface_facerecognition_tpu.ops import pallas_warp as pw
from scrfd_arcface_facerecognition_tpu.ops.pallas_warp import (
    OUT, Q, PW, CQ, C0, LANE_OFF, prepare_warp_params, planarize)
from scrfd_arcface_facerecognition_tpu.ops.warp import warp_affine_flat

# ---- the ORIGINAL 5-pass band kernel (pre-round-3 production) -----------
G = 8                # output rows per band-mix group
BAND_SRC = 32        # pass-1 band (bf16 source, 16-aligned)
BAND_SCALE = 40      # pass-2 band (f32, 8-aligned)
BAND_HX = 48         # shear-x band
BAND_VY = 72         # shear-y band


def _band_mix(dst_ref, src_ref, n_out: int, src_rows: int, width: int,
              band: int, alpha, beta, gamma, align: int = 8,
              cast: bool = False):
    """dst[iy, l] = sum_r hat(pos(iy, l) - r) * src[r, l] over an aligned
    dynamic band; pos = alpha*iy + beta*l + gamma (alpha > 0)."""
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


def _band_kernel(iparams, fparams, frames_hbm, canvas_hbm, out_ref,
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
    gamma1 = my - sigma * CQ

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

    buf_at[:] = jnp.swapaxes(buf_a[:], -1, -2)
    gamma2 = mx - sigma * CQ
    _band_mix(buf_b, buf_at, Q, PW, Q, BAND_SCALE,
              sigma, jnp.float32(0.0), gamma2)
    _band_mix(buf_c, buf_b, Q, Q, Q, BAND_HX,
              jnp.float32(1.0), u, -u * CQ)
    buf_b[:] = jnp.swapaxes(buf_c[:], -1, -2)
    _band_mix(buf_c, buf_b, Q, Q, Q, BAND_VY,
              jnp.float32(1.0), v, -v * CQ)
    buf_b[:] = jnp.swapaxes(buf_c[:], -1, -2)
    _band_mix(buf_c, buf_b, OUT, Q, Q, BAND_HX,
              jnp.float32(1.0), u, jnp.float32(CQ - C0) - u * CQ)
    out_ref[0] = buf_c[:, :OUT, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_crops_band(frames_planar, canvas_planar, params, interpret=False):
    """The original 5-pass band-mix kernel (historical baseline)."""
    f = params.iparams.shape[0]
    ip = params.iparams[params.order]
    fp = params.fparams[params.order]
    frames_planar = frames_planar.astype(jnp.bfloat16)
    canvas_planar = canvas_planar.astype(jnp.bfloat16)

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
            pltpu.VMEM(frames_planar.shape[1:], jnp.bfloat16),
            pltpu.VMEM(canvas_planar.shape[1:], jnp.bfloat16),
            pltpu.VMEM((3, Q, PW), jnp.float32),
            pltpu.VMEM((3, PW, Q), jnp.float32),
            pltpu.VMEM((3, Q, Q), jnp.float32),
            pltpu.VMEM((3, Q, Q), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _band_kernel,
        out_shape=jax.ShapeDtypeStruct((f, 3, OUT, Q), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(ip, fp, frames_planar, canvas_planar)
    crops_sorted = out[:, :, :, LANE_OFF:LANE_OFF + OUT]
    inv = jnp.zeros((f,), jnp.int32).at[params.order].set(
        jnp.arange(f, dtype=jnp.int32))
    return jnp.transpose(crops_sorted[inv], (0, 3, 2, 1))


# ---------------------------------------------------------------------------

def make_workload(rng, n_frames, n_faces, fh=1080, fw=1920):
    frames = jnp.asarray(rng.integers(0, 255, (n_frames, fh, fw, 3),
                                      dtype=np.uint8))
    ms = []
    for _ in range(n_faces):
        sigma = rng.uniform(0.5, min(1.7, pw.SIGMA_MAX - 0.05))
        ang = rng.uniform(-0.2, 0.2)
        cx = rng.uniform(150, fw - 150)
        cy = rng.uniform(150, fh - 150)
        rot = np.array([[np.cos(ang), -np.sin(ang)],
                        [np.sin(ang), np.cos(ang)]]) / sigma
        t = np.array([C0, C0]) - rot @ np.array([cx, cy])
        ms.append(np.concatenate([rot, t[:, None]], axis=1))
    matrices = jnp.asarray(np.stack(ms).astype(np.float32))
    frame_idx = jnp.asarray(np.sort(rng.integers(0, n_frames, n_faces))
                            .astype(np.int32))
    plan = ops.tight_letterbox_plan((fh, fw), (640, 640))
    canvas = jnp.clip(jnp.round(ops.letterbox(frames, plan)), 0, 255
                      ).astype(jnp.uint8)
    prm = prepare_warp_params(matrices, frame_idx, (fh, fw), plan.det_scale,
                              canvas_hw=tuple(canvas.shape[1:3]))
    return frames, canvas, matrices, frame_idx, prm


def check_interpret():
    rng = np.random.default_rng(7)
    frames, canvas, matrices, fidx, prm = make_workload(rng, 2, 12,
                                                        fh=540, fw=960)
    exact = np.asarray(warp_affine_flat(frames, matrices, fidx))
    band = np.asarray(warp_crops_band(planarize(frames), planarize(canvas),
                                      prm, interpret=True))
    prod = np.asarray(pw.warp_crops_pallas(planarize(frames),
                                           planarize(canvas), prm,
                                           interpret=True))
    ok = ~np.asarray(prm.fallback)
    d = np.abs(prod - band)[ok]
    de = np.abs(prod - exact)[ok]
    print(f"  production vs band: max={d.max():.4f} mean={d.mean():.5f}")
    print(f"  production vs exact: mean={de.mean():.4f} "
          f"p99={np.percentile(de, 99):.3f}  (noise content: multi-pass "
          f"resampling differs from single-pass bilinear)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--faces", type=int, default=320)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.check:
        print("interpret-mode parity (small frames):")
        check_interpret()
        return

    rng = np.random.default_rng(0)
    frames, canvas, matrices, fidx, prm = make_workload(
        rng, args.batch, args.faces)
    fp = planarize(frames)
    cp = planarize(canvas)
    nf = args.faces

    def timeit(name, fn):
        out = fn()
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:<28s} {dt * 1e3:8.2f} ms  ({dt / nf * 1e6:6.1f} us/crop)")
        return out

    ok = ~np.asarray(prm.fallback)
    band = timeit("band kernel (original)",
                  lambda: warp_crops_band(fp, cp, prm))
    prod = timeit("production (mm+shift)",
                  lambda: pw.warp_crops_pallas(fp, cp, prm))
    d = np.abs(np.asarray(prod) - np.asarray(band))[ok]
    print(f"    production vs band: max={d.max():.4f} mean={d.mean():.6f}")


if __name__ == "__main__":
    main()
