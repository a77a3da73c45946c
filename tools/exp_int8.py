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
    # the achievable chain-level speedup incl. dequant/BN/requant
    dt_bf = bench_chain(int8=False)
    dt_i8 = bench_chain(int8=True)
    print(f"chain speedup int8/bf16: {dt_bf / dt_i8:.2f}x")


# ---------------------------------------------------------------- chain

def bench_chain(int8: bool, n=10):
    """A det_10g-backbone-shaped conv chain with the REAL int8 costs:
    conv(int8 x int8 -> int32) -> scale+BN+ReLU in bf16 -> requantize to
    int8 for the next layer. The requant VPU traffic is what a kernel-level
    conv comparison hides; this measures the achievable chain speedup.
    Shapes follow SCRFD_CONFIGS['det_10g'] at a 640x640 canvas, B=16.
    """
    B = 16
    # (H, W, Cin, Cout, stride) per conv of the backbone trunk
    shapes = [(320, 320, 28, 28, 1), (320, 320, 28, 56, 1)]
    stage_hw = {1: 160, 2: 80, 3: 40, 4: 20}
    blocks = {1: (3, 56, 56), 2: (5, 56, 56), 3: (2, 56, 144),
              4: (3, 144, 248)}
    for si in (1, 2, 3, 4):
        nb, cin, cout = blocks[si]
        hw = stage_hw[si]
        for bi in range(nb):
            c0 = cin if bi == 0 else cout
            shapes.append((hw, hw, c0, cout, 1))
            shapes.append((hw, hw, cout, cout, 1))

    ws, scales, bns = [], [], []
    for (h, w, ci, co, s) in shapes:
        if int8:
            ws.append(jnp.asarray(
                rng.integers(-127, 127, (3, 3, ci, co), dtype=np.int8)))
        else:
            ws.append(jnp.asarray(
                rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.05
            ).astype(jnp.bfloat16))
        scales.append(jnp.float32(0.01))
        bns.append((jnp.asarray(rng.normal(size=co).astype(np.float32)),
                    jnp.asarray(rng.normal(size=co).astype(np.float32))))

    # simpler: jit one whole chain where each conv gets a fresh input of
    # its own shape (measures conv+requant cost; skips inter-stage
    # resampling, identical between the two variants)
    xs = []
    for (h, w, ci, co, s) in shapes:
        if int8:
            xs.append(jnp.asarray(
                rng.integers(-127, 127, (B, h, w, ci), dtype=np.int8)))
        else:
            xs.append(jnp.asarray(
                rng.normal(size=(B, h, w, ci)).astype(np.float32)
            ).astype(jnp.bfloat16))

    @jax.jit
    def whole(xs, ws):
        tot = jnp.float32(0)
        for x, wt, s, (g, b) in zip(xs, ws, scales, bns):
            acc = jax.lax.conv_general_dilated(
                x, wt, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32 if int8 else jnp.float32)
            y = acc.astype(jnp.float32) * (s if int8 else 1.0)
            y = jnp.maximum(y * g + b, 0.0)
            if int8:
                # requant for the next layer (the cost a kernel-level conv
                # comparison hides); full-tensor sums keep XLA from
                # narrowing the convs via slice pushdown
                q = jnp.clip(jnp.round(y * 12.7), -127, 127).astype(jnp.int8)
                tot += jnp.sum(q.astype(jnp.float32))
            else:
                tot += jnp.sum(y.astype(jnp.float32))
        return tot

    out = whole(xs, ws)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = whole(xs, ws)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    fl = sum(2 * B * h * w * ci * co * 9 for (h, w, ci, co, s) in shapes)
    label = "int8" if int8 else "bf16"
    print(f"{label} backbone-shaped chain (38 convs + BN/ReLU"
          f"{' + requant' if int8 else ''}): {dt * 1000:.2f} ms  "
          f"{fl / dt / 1e12:.1f} T(FL)OPS")
    return dt


if __name__ == "__main__":
    main()
