"""Capture a jax.profiler trace of a model forward and print the top device
ops by total duration. Parses the XPlane-exported trace.json.gz directly.

Usage: python tools/trace_ops.py [--what backbone|full|embed] [--batch 32]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def summarize_trace(trace_dir, top=30):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files under", trace_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid names containing 'TPU' / 'Device'
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    print(f"trace {os.path.basename(path)}: {total / 1e3:.2f} ms total "
          f"device-op time")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur / 1e3:9.3f} ms  {100 * dur / max(total, 1):5.1f}%  "
              f"{name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="backbone")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dir", default="/tmp/jax_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B = args.batch

    if args.what in ("backbone", "full"):
        import dataclasses
        from scrfd_arcface_facerecognition_tpu.models.scrfd import (
            SCRFD_CONFIGS, SCRFDNet, Backbone)
        from scrfd_arcface_facerecognition_tpu.models.init_utils import cpu_init

        cfg = dataclasses.replace(SCRFD_CONFIGS["det_10g"], s2d_stem=True)
        model = (Backbone(cfg, dtype=jnp.bfloat16) if args.what == "backbone"
                 else SCRFDNet(cfg, dtype=jnp.bfloat16))
        x = jnp.asarray(rng.normal(size=(B, 640, 640, 3)).astype(np.float32))
        variables = cpu_init(model, 0, (1, 640, 640, 3))
        fn = jax.jit(lambda v, a: model.apply(v, a))
        args_t = (variables, x)
    elif args.what == "embed":
        from scrfd_arcface_facerecognition_tpu.models.arcface import (
            ARCFACE_CONFIGS)
        from scrfd_arcface_facerecognition_tpu.models import build_arcface
        from scrfd_arcface_facerecognition_tpu.models.init_utils import cpu_init

        model = build_arcface("w600k_r50", dtype=jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(320, 112, 112, 3)).astype(np.float32))
        variables = cpu_init(model, 0, (1, 112, 112, 3))
        fn = jax.jit(lambda v, a: model.apply(v, a))
        args_t = (variables, x)
    else:
        raise SystemExit(f"unknown --what {args.what}")

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])

    out = fn(*args_t)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(*args_t)
    sync(out)
    print(f"wall: {(time.perf_counter() - t0) / args.iters * 1e3:.2f} "
          f"ms/iter")

    os.makedirs(args.dir, exist_ok=True)
    jax.profiler.start_trace(args.dir)
    for _ in range(args.iters):
        out = fn(*args_t)
    sync(out)
    jax.profiler.stop_trace()
    summarize_trace(args.dir, top=args.top)


if __name__ == "__main__":
    main()
