"""Measure the concurrent-request coalescing win on the real chip.

Serving shape: N web-request threads each hold ONE image and call
FaceAnalysis.get() (the reference's handler pattern,
smart_face_recognition.py:912-913). Compared:

- baseline: every request runs its own batch-1 detect+embed program
  (microbatch disabled) — requests serialize on the device.
- coalesced: enable_microbatch() — the collector groups concurrent
  requests into shared shape-bucketed batches.

    python tools/exp_microbatch.py [--requests 64] [--threads 16]

Prints one JSON line per mode; the table lives in docs/PERF.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def run_mode(app, images, n_threads, microbatch, max_wait_ms):
    if microbatch:
        mb = app.enable_microbatch(max_batch=32, max_wait_ms=max_wait_ms)

    def one_round():
        done = [None] * len(images)
        idx_lock = threading.Lock()
        nxt = [0]

        def worker():
            while True:
                with idx_lock:
                    i = nxt[0]
                    if i >= len(images):
                        return
                    nxt[0] += 1
                done[i] = app.get(images[i], max_num=4)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker)
                   for _ in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        assert all(d is not None for d in done)
        return len(images) / dt

    # round 1 warms every batch-width program the mode will use (the
    # remote compiler costs 30-120 s per new width — steady-state serving
    # is the number that matters); round 2 is the measurement
    one_round()
    if microbatch:
        warm_batches, warm_widest = mb.n_batches, mb.max_batch_seen
    fps = one_round()
    stats = {}
    if microbatch:
        # report the MEASURED round only — cumulative counters would
        # describe 2x the requests the JSON line claims
        stats = {"batches": mb.n_batches - warm_batches,
                 "widest": mb.max_batch_seen}
        del warm_widest
        app.disable_microbatch()
    return fps, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--max-wait-ms", type=float, default=4.0)
    ap.add_argument("--det", default="det_10g")
    ap.add_argument("--rec", default="w600k_r50")
    args = ap.parse_args()

    from scrfd_arcface_facerecognition_tpu.apps.face_analysis import (
        FaceAnalysis)
    from scrfd_arcface_facerecognition_tpu.utils.compile_cache import (
        enable_compile_cache)

    enable_compile_cache()
    app = FaceAnalysis(det_variant=args.det, rec_variant=args.rec, seed=0)
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (args.size, args.size, 3), np.uint8)
              for _ in range(args.requests)]

    for label, micro in (("batch-1 per request", False),
                         ("microbatched", True)):
        fps, stats = run_mode(app, images, args.threads, micro,
                              args.max_wait_ms)
        print(json.dumps({"mode": label, "requests_per_sec": round(fps, 1),
                          "threads": args.threads,
                          "requests": args.requests, **stats}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
