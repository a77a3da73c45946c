"""Host video-ingest scaling bench -> the PERF.md ingest table.

Measures the host-side serving budget (VERDICT r3 item 2): per-core decode
throughput, the zero-copy ring's gain over the legacy copy path, threaded
(MultiStreamReader) vs multi-process (DecodePool) N-stream aggregates, and
derives the core budget formula documented in docs/SERVING.md §1.

All numbers are decode+assembly only (no device work) — they bound what one
host core can FEED a chip. Run:

    python tools/bench_ingest.py [--res 1920x1080] [--frames 300]

Writes a markdown table to stdout; paste/refresh into docs/PERF.md.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def make_video(path: str, w: int, h: int, frames: int, fourcc: str = "mp4v"):
    import cv2

    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), 24, (w, h))
    if not wr.isOpened():
        return False
    # REALISTIC content, not noise: random frames are incompressible and
    # decode pathologically slowly (a noise 1080p mp4v decodes ~8x slower
    # than camera-like footage), which would corrupt the core budget.
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([(yy * 255 // max(h, 1)).astype(np.uint8),
                     (xx * 255 // max(w, 1)).astype(np.uint8),
                     np.full((h, w), 96, np.uint8)], axis=-1)
    for i in range(frames):
        f = base.copy()
        # a few moving rectangles (faces-on-a-camera analog)
        for k in range(6):
            x0 = (37 * i + 211 * k) % max(w - 120, 1)
            y0 = (23 * i + 149 * k) % max(h - 120, 1)
            f[y0:y0 + 100, x0:x0 + 100] = (40 * k) % 255
        wr.write(f)
    wr.release()
    return True


def bench_raw_decode(path: str, use_read_into: bool):
    """Pure decode loop, no ring/queues."""
    from scrfd_arcface_facerecognition_tpu.runtime.video import open_capture

    cap = open_capture(path)
    n = 0
    buf = None
    t0 = time.perf_counter()
    while True:
        if use_read_into and hasattr(cap, "read_into"):
            if buf is None:
                buf = np.empty((cap.height, cap.width, 3), np.uint8)
            if not cap.read_into(buf):
                break
        else:
            ok, _ = cap.read()
            if not ok:
                break
        n += 1
    dt = time.perf_counter() - t0
    cap.release()
    return n / dt if dt > 0 else 0.0, n


def bench_batched_reader(path: str, zero_copy: bool, batch: int = 8):
    """Decode thread -> native ring -> batch assembly (the single-stream
    serving feed). zero_copy=False forces the legacy tobytes()/pop path."""
    from scrfd_arcface_facerecognition_tpu.runtime.video import (
        BatchedFrameReader, open_capture)

    cap = open_capture(path)
    # ctor knob, not a post-construction patch: the producer thread
    # samples the mode once at startup, so patching after __init__ raced
    # it and could measure the zero-copy producer under the legacy label
    r = BatchedFrameReader(cap, batch=batch, zero_copy=zero_copy)
    n = 0
    t0 = time.perf_counter()
    for b in r:
        n += len(b)
    dt = time.perf_counter() - t0
    r.close()
    cap.release()
    return n / dt if dt > 0 else 0.0, n


def bench_multistream(path: str, n_streams: int):
    """Thread-per-camera (GIL) baseline: runtime.video.MultiStreamReader."""
    from scrfd_arcface_facerecognition_tpu.runtime.video import (
        MultiStreamReader, open_capture)

    caps = [open_capture(path) for _ in range(n_streams)]
    r = MultiStreamReader(caps, timeout_ms=5000)
    n = 0
    t0 = time.perf_counter()
    for batch, ids in r:
        n += len(batch)
    dt = time.perf_counter() - t0
    r.release()
    return n / dt if dt > 0 else 0.0, n


def bench_pool(path: str, n_streams: int, workers: int, w: int, h: int):
    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    pool = DecodePool([path] * n_streams, workers=workers,
                      slot_bytes=w * h * 3, timeout_ms=5000)
    n = 0
    t0 = time.perf_counter()
    for batch, ids in pool:
        n += len(batch)
    dt = time.perf_counter() - t0
    pool.release()
    return n / dt if dt > 0 else 0.0, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--fourcc", default="mp4v")
    ap.add_argument("--streams", default="1,2,4,8")
    args = ap.parse_args()
    w, h = (int(x) for x in args.res.split("x"))
    # key the cached file on EVERY generation parameter — a resolution-only
    # key silently reused a stale 300-frame mp4v file for --fourcc h264 /
    # --frames runs, measuring content that didn't match the printed label
    path = f"/tmp/ingest_bench_{w}x{h}_{args.fourcc}_{args.frames}.mp4"
    if not os.path.exists(path):
        print(f"writing synthetic {args.fourcc} video {w}x{h} "
              f"x{args.frames} ...", file=sys.stderr)
        if not make_video(path, w, h, args.frames, args.fourcc):
            print("VideoWriter failed", file=sys.stderr)
            return 1

    cores = os.cpu_count() or 1
    rows = []
    fps, n = bench_raw_decode(path, use_read_into=False)
    rows.append(("raw decode (read, alloc per frame)", 1, "-", fps, n))
    base_fps = fps
    fps, n = bench_raw_decode(path, use_read_into=True)
    rows.append(("raw decode (read_into, zero-alloc)", 1, "-", fps, n))
    fps, n = bench_batched_reader(path, zero_copy=False)
    rows.append(("BatchedFrameReader legacy (tobytes+pop: 4 copies)",
                 1, "thread", fps, n))
    fps, n = bench_batched_reader(path, zero_copy=True)
    rows.append(("BatchedFrameReader zero-copy ring (1 copy)",
                 1, "thread", fps, n))
    zc_fps = fps
    for ns in (int(x) for x in args.streams.split(",")):
        fps, n = bench_multistream(path, ns)
        rows.append((f"MultiStreamReader (threads, GIL)", ns, "thread",
                     fps, n))
        for wk in sorted({1, min(2, cores), min(ns, cores)}):
            fps, n = bench_pool(path, ns, wk, w, h)
            rows.append((f"DecodePool", ns, f"{wk} proc", fps, n))

    print(f"\n## Ingest scaling ({w}x{h} {args.fourcc}, "
          f"{args.frames} frames/stream, {cores}-core host)\n")
    print("| path | streams | workers | aggregate fps | frames |")
    print("|---|---|---|---|---|")
    for name, ns, wk, fps, n in rows:
        print(f"| {name} | {ns} | {wk} | {fps:.0f} | {n} |")
    print(f"\nCore budget: zero-copy single-stream feed = {zc_fps:.0f} "
          f"fps/core at {w}x{h} ({args.fourcc}); chips at 758 fps need "
          f"ceil(758/{zc_fps:.0f}) = "
          f"{int(np.ceil(758 / max(zc_fps, 1)))} decode cores "
          f"(+1 consumer core for batch assembly at scale).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
