"""r50 embedder forward experiment (round 3, post-warp-v2): the ArcFace
iResNet-50 forward is now the largest single device-time item in the
embed stage (docs/PERF.md "Remaining candidates"). The recorded
"~65-70 TFLOPS bf16" figure is a round-1 measurement at B=32; this tool
re-measures at the production shape (960 crops = B=96 frames x 10 face
slots, 112x112) and probes the remaining formulation levers:

1. full forward, bf16 NHWC (production path) — time + effective TFLOPS
   (FLOP count from XLA's own cost analysis, not hand math);
2. per-stage-group breakdown (stem / layer1..4 / head) via cumulative
   prefixes, so the report shows WHERE the time goes;
3. layout variant: NCHW input (XLA repacks internally; measures whether
   the NHWC choice costs anything at this geometry);
4. f32 control (how much bf16 is actually buying);
5. batch sweep 240/480/960 (is the forward batch-saturated?).

Usage: python tools/exp_r50.py   (needs the TPU; several minutes of compiles)
Findings land in docs/PERF.md.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from scrfd_arcface_facerecognition_tpu.models import build_arcface
from scrfd_arcface_facerecognition_tpu.models.init_utils import cpu_init

rng = np.random.default_rng(0)


def _sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(f, *args, n=10):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def flops_of(f, *args):
    try:
        cost = jax.jit(f).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    print(f"devices: {jax.devices()}")
    model = build_arcface("w600k_r50", dtype=jnp.bfloat16)
    variables = cpu_init(model, 0, (1, 112, 112, 3))

    def fwd(v, x):
        return model.apply(v, x)

    x960 = jnp.asarray(
        rng.normal(size=(960, 112, 112, 3)).astype(np.float32))

    # 1. production-shape forward
    fl = flops_of(fwd, variables, x960)
    f = jax.jit(fwd)
    dt = timed(f, variables, x960)
    print(f"[1] r50 bf16 NHWC B=960: {dt*1e3:.1f} ms   "
          f"{fl/dt/1e12:.1f} TFLOPS (XLA-counted {fl/1e12:.2f} TF)   "
          f"{dt/960*1e6:.1f} us/crop")
    base = dt

    # 5. batch sweep (done early so the numbers sit near [1] in the log)
    for b in (240, 480):
        xb = x960[:b]
        dtb = timed(jax.jit(fwd), variables, xb)
        print(f"[5] B={b}: {dtb*1e3:.1f} ms  {dtb/b*1e6:.1f} us/crop")

    # 2. cumulative stage-group prefixes: time stem, stem+layer1, ... so
    # differences isolate each group. Rebuild trunk prefixes by running
    # the full model with a capture hook is intrusive; instead rely on
    # flax's ability to run submodules via Sow? Simpler: re-apply with
    # method=None but truncate by monkey-layering is fragile — use
    # separate prefix models sharing the same params (names line up
    # because module names are deterministic).
    import flax.linen as nn
    from scrfd_arcface_facerecognition_tpu.models.arcface import (
        ARCFACE_CONFIGS, IBasicBlock, PReLU)
    from scrfd_arcface_facerecognition_tpu.models.layers import (
        conv_kernel_init)

    cfg = ARCFACE_CONFIGS["w600k_r50"]

    class Prefix(nn.Module):
        upto: int  # number of stage groups to include (0 = stem only)
        dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            bn_kw = dict(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)
            x = x.astype(self.dtype)
            x = nn.Conv(cfg.stage_filters[0], (3, 3),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=conv_kernel_init, dtype=self.dtype,
                        name="stem_conv")(x)
            x = nn.BatchNorm(name="stem_bn", **bn_kw)(x)
            x = PReLU(dtype=self.dtype, name="stem_prelu")(x)
            for si in range(self.upto):
                nblocks = cfg.stage_blocks[si]
                filters = cfg.stage_filters[si]
                for bi in range(nblocks):
                    stride = 2 if bi == 0 else 1
                    x = IBasicBlock(filters, stride, dtype=self.dtype,
                                    name=f"layer{si+1}_block{bi}")(x)
            return x

    prev = 0.0
    names = ["stem", "layer1(64ch,56^2)", "layer2(128ch,28^2)",
             "layer3(256ch,14^2,x14)", "layer4(512ch,7^2)"]
    for upto in range(5):
        pm = Prefix(upto=upto)
        pv = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
        dtp = timed(jax.jit(pm.apply), pv, x960)
        print(f"[2] +{names[upto]}: cumulative {dtp*1e3:.1f} ms  "
              f"(group {max(dtp-prev, 0)*1e3:+.1f} ms)")
        prev = dtp
    print(f"[2] head (full - trunk): {(base - prev)*1e3:+.1f} ms")

    # 3. NCHW input variant (transpose at entry; XLA picks layouts inside)
    def fwd_nchw(v, x):
        return model.apply(v, jnp.transpose(x, (0, 2, 3, 1)))

    x_nchw = jnp.transpose(x960, (0, 3, 1, 2))
    dt_nchw = timed(jax.jit(fwd_nchw), variables, x_nchw)
    print(f"[3] NCHW entry: {dt_nchw*1e3:.1f} ms ({dt_nchw/base:.2f}x)")

    # 4. f32 control
    model32 = build_arcface("w600k_r50", dtype=jnp.float32)
    dt32 = timed(jax.jit(model32.apply), variables, x960)
    print(f"[4] f32: {dt32*1e3:.1f} ms ({dt32/base:.2f}x of bf16)")


if __name__ == "__main__":
    main()
