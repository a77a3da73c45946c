"""SCRFD forward-time experiments: submodule breakdown + layout variants.

Usage: python tools/exp_scrfd.py [--batch 32] [--iters 20]
"""
import argparse
import dataclasses
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def timeit(name, fn, args, iters, sync):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<46s} {dt * 1e3:8.2f} ms")
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.models.scrfd import (
        SCRFD_CONFIGS, SCRFDConfig, SCRFDNet, Backbone, PAFPN, SCRFDHead)
    from scrfd_arcface_facerecognition_tpu.models.init_utils import cpu_init

    B = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 640, 640, 3)).astype(np.float32))

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])

    def bench_model(name, model, inp):
        if isinstance(inp, (list, tuple)):
            small = [a[:1] for a in inp]
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), small)
            variables = jax.tree.map(np.asarray, variables)
        else:
            variables = cpu_init(model, 0, (1, *inp.shape[1:]))
        fn = jax.jit(lambda v, a: model.apply(v, a))
        return timeit(name, fn, (variables, inp), args.iters, sync)

    cfg = dataclasses.replace(SCRFD_CONFIGS["det_10g"], s2d_stem=True)
    dt = jnp.bfloat16

    # full model
    bench_model("det_10g full (bf16, s2d)", SCRFDNet(cfg, dtype=dt), x)

    # backbone only
    bb = Backbone(cfg, dtype=dt)
    feats, _ = bench_model("  backbone only", bb, x)

    # neck only (on backbone features)
    neck = PAFPN(cfg.neck_filters, dtype=dt)
    nf, _ = bench_model("  neck only", neck,
                        [a.astype(jnp.float32) for a in feats])

    # head only
    head = SCRFDHead(cfg, dtype=dt)
    bench_model("  head only", head,
                [a.astype(jnp.float32) for a in nf])

    # MXU-padded widths variant
    cfg_pad = SCRFDConfig("det_10g_pad", 64, (3, 5, 2, 3), (64, 64, 160, 256),
                          neck_filters=64, head_stacks=3, head_filters=96,
                          s2d_stem=True)
    bench_model("det_10g widths padded to mult-of-32", SCRFDNet(cfg_pad, dtype=dt), x)

    # 128-wide everything (upper bound of the layout hypothesis)
    cfg_128 = SCRFDConfig("det_10g_128", 64, (3, 5, 2, 3), (64, 128, 128, 256),
                          neck_filters=128, head_stacks=3, head_filters=128,
                          s2d_stem=True)
    bench_model("det_10g widths 64/128/256", SCRFDNet(cfg_128, dtype=dt), x)

    # f32 comparison
    bench_model("det_10g full (f32, s2d)", SCRFDNet(cfg, dtype=jnp.float32), x)


if __name__ == "__main__":
    main()
