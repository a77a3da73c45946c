"""int8 detector experiment (round-3 verdict item): can int8 beat the
bf16 backbone's ~17 TFLOPS geometry plateau on v5e?

Measures, readback-synced on the real chip:
1. the hot backbone conv (B=64, 160x160, C=F=56, 3x3) in bf16 vs int8
   (int32 accumulation) through XLA's conv lowering;
2. the same comparison at MXU-filling geometries (C=F=128, C=F=256);
3. raw MXU peak ratio via an 8k x 8k matmul in both dtypes.

Result (docs/PERF.md "int8 experiment"): NEGATIVE on the det_10g
geometry — int8 conv measures SLOWER than bf16 at C=F=56 (the underfilled
MXU dim binds, and the int8 path adds int32-accumulate + requantize work
without engaging a faster unit at this shape). The plateau is
geometry-bound, not precision-bound; per-channel weight quant cannot buy
throughput here. Accuracy side therefore not pursued (no speed to trade).

Usage: python tools/exp_int8.py    (needs the TPU; ~5-10 min of compiles)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def _sync(x):
    _ = np.asarray(x.ravel()[:1])


def bench_conv(B, H, W, C, F, int8: bool, n=10):
    if int8:
        x = jnp.asarray(rng.integers(-127, 127, (B, H, W, C), dtype=np.int8))
        w = jnp.asarray(rng.integers(-127, 127, (3, 3, C, F), dtype=np.int8))
        pt = jnp.int32
    else:
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, C, F)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        pt = jnp.float32
    f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pt))
    out = f(x, w)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x, w)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    fl = 2 * B * H * W * C * F * 9
    label = "int8" if int8 else "bf16"
    print(f"{label} conv B{B} {H}x{W} C{C}F{F}: {dt * 1000:.2f} ms  "
          f"{fl / dt / 1e12:.1f} T(FL)OPS")
    return dt


def bench_matmul(n_dim, int8: bool, n=10):
    if int8:
        a = jnp.asarray(rng.integers(-127, 127, (n_dim, n_dim), dtype=np.int8))
        pt = jnp.int32
    else:
        a = jnp.asarray(rng.normal(size=(n_dim, n_dim)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        pt = jnp.float32
    f = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=pt))
    out = f(a, a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(a, a)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    label = "int8" if int8 else "bf16"
    print(f"{label} {n_dim}x{n_dim} matmul: {dt * 1000:.2f} ms  "
          f"{2 * n_dim ** 3 / dt / 1e12:.0f} TOPS")
    return dt


def main():
    print(jax.devices())
    # the det_10g hot shape
    bench_conv(64, 160, 160, 56, 56, int8=False)
    bench_conv(64, 160, 160, 56, 56, int8=True)
    # MXU-filling geometries
    bench_conv(64, 160, 160, 128, 128, int8=False)
    bench_conv(64, 160, 160, 128, 128, int8=True)
    bench_conv(32, 80, 80, 256, 256, int8=False)
    bench_conv(32, 80, 80, 256, 256, int8=True)
    # raw peak ratio
    bench_matmul(8192, int8=False)
    bench_matmul(8192, int8=True)


if __name__ == "__main__":
    main()
