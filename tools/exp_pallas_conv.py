"""Prototype: Pallas 3x3 stride-1 conv for narrow-channel stages.

The det_10g backbone's 56-channel convs plateau at ~17 TFLOPS under every
standard XLA formulation (docs/PERF.md sweep). This kernel packs the 3 dx
taps into one K=3C contraction and handles the 3 dy taps as 32-bit rolls
of the f32 partial products, with every DMA/copy/slice tile-aligned:

- x planes are dx-pre-shifted in HBM (3, B, C, Hp, Wp) (Mosaic cannot
  lane-rotate 16-bit data); 8 zero pad rows on top so every block's
  24-row window starts at a multiple of 8.
- per image: resident VMEM planes (one DMA); per 8-row output block:
  aligned VMEM copies assemble X3 (3C, 24, Wp), three dots
  (3C, F)^T @ X3 give P_dy (F, 24, Wp), and
  S = roll(P0,+1) + P1 + roll(P2,-1) (f32 rolls are legal) yields the
  block's rows at local [8:16) — an aligned slice.
- optional fused per-channel affine + ReLU epilogue (folded BatchNorm),
  so surrounding XLA ops don't pay extra HBM round-trips.

Run: python tools/exp_pallas_conv.py  (real chip; prints ms + TFLOPS)
"""
import sys
import os
import time
import functools

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOP = 8     # aligned top pad rows
WIN = 24    # rows read per 8-row output block


def _kern(x_hbm, w_ref, ab_ref, y_ref, planes, x3, sem, *, c, f, wp, h,
          relu):
    bi = pl.program_id(0)
    cp = pltpu.make_async_copy(x_hbm.at[:, bi], planes, sem)
    cp.start()
    cp.wait()
    scale = ab_ref[0]          # (F, 8, Wp), pre-broadcast outside
    bias = ab_ref[1]
    for ri in range(h // 8):
        r0 = ri * 8
        for dx in range(3):
            x3[dx * c:(dx + 1) * c, :, :] = planes[dx, :, r0:r0 + WIN, :]
        ps = []
        for dy in range(3):
            ps.append(jax.lax.dot_general(
                w_ref[dy], x3[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))     # (F, WIN, Wp)
        s = (pltpu.roll(ps[0], 1, axis=1) + ps[1]
             + pltpu.roll(ps[2], WIN - 1, axis=1))
        out = s[:, 8:16, :] * scale + bias
        if relu:
            out = jnp.maximum(out, 0.0)
        y_ref[0, :, r0:r0 + 8, :] = out.astype(y_ref.dtype)


def pallas_conv3x3(x_planar, w3, scale=None, bias=None, relu=False,
                   interpret=False):
    """x_planar (B, C, H, Wp) bf16 (zero pad cols >= W, >=1 col slack);
    w3 (3, 3C, F) bf16, w3[dy] rows ordered (dx, c). Optional fused
    per-channel affine (scale, bias) + ReLU. Returns (B, F, H, Wp) bf16."""
    b, c, h, wp = x_planar.shape
    if h % 8:
        raise ValueError(f"height {h} must be a multiple of 8")
    f = w3.shape[2]
    bot = WIN - 8                  # window overrun past the last block
    xpad = jnp.pad(x_planar, ((0, 0), (0, 0), (TOP - 1, 0), (0, 0)))
    xpad = jnp.pad(xpad, ((0, 0), (0, 0), (1, bot), (0, 0)))
    # plane row TOP + g = image row g; dx copies: lane w holds x[w + dx - 1]
    xsh = jnp.stack([jnp.roll(xpad, 1 - dx, axis=3) for dx in range(3)])
    hp = xpad.shape[2]

    if scale is None:
        scale = jnp.ones((f,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((f,), jnp.float32)
    # pre-broadcast to the output-block shape: Mosaic rejects in-kernel
    # rank-extension reshapes of sublane vectors
    ab = jnp.stack([
        jnp.broadcast_to(jnp.asarray(scale, jnp.float32)[:, None, None],
                         (f, 8, wp)),
        jnp.broadcast_to(jnp.asarray(bias, jnp.float32)[:, None, None],
                         (f, 8, wp))])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3 * c, f), lambda bi: (0, 0, 0)),
            pl.BlockSpec((2, f, 8, wp), lambda bi: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, h, wp), lambda bi: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((3, c, hp, wp), jnp.bfloat16),
            pltpu.VMEM((3 * c, WIN, wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(_kern, c=c, f=f, wp=wp, h=h, relu=relu)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, f, h, wp), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xsh, w3, ab)


def pack_weights(k):
    """(3, 3, C, F) -> (3, 3C, F): w3[dy] rows ordered (dx, c)."""
    return np.ascontiguousarray(k.transpose(0, 1, 2, 3).reshape(
        3, 3 * k.shape[2], k.shape[3]))


def main():
    B, H, W, C, F = 64, 96, 160, 56, 56
    WP = 256
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    k = rng.normal(scale=0.1, size=(3, 3, C, F)).astype(np.float32)

    xp = np.zeros((B, C, H, WP), np.float32)
    xp[:, :, :, :W] = x.transpose(0, 3, 1, 2)
    w3 = pack_weights(k)

    xpj = jnp.asarray(xp).astype(jnp.bfloat16)
    w3j = jnp.asarray(w3).astype(jnp.bfloat16)

    interpret = jax.default_backend() != "tpu"
    fjit = jax.jit(lambda a, b_: pallas_conv3x3(a, b_, interpret=interpret))
    y = fjit(xpj, w3j)
    _ = np.asarray(y[0, 0, 0, 0])

    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x).astype(jnp.bfloat16),
        jnp.asarray(k).astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32))
    got = np.asarray(y.astype(jnp.float32))[:, :, :, :W].transpose(0, 2, 3, 1)
    err = np.abs(got - want).max()
    print(f"max abs err vs XLA conv: {err:.4f} "
          f"(scale {np.abs(want).max():.2f})")

    def sync(o):
        _ = np.asarray(o.ravel()[0])

    n = 30
    sync(fjit(xpj, w3j))
    t0 = time.perf_counter()
    for _ in range(n):
        o = fjit(xpj, w3j)
    sync(o)
    dt = (time.perf_counter() - t0) / n * 1000
    gflop = 2 * B * H * W * 9 * C * F / 1e9
    print(f"pallas conv: {dt:.3f} ms  {gflop / dt:.1f} TFLOPS "
          f"(XLA reference: 3.29 ms / 16.9 TFLOPS)")


if __name__ == "__main__":
    main()
