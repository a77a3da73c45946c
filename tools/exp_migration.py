"""Measure the dense -> PQ tier migration stall (gallery/auto.py).

When a growing gallery crosses `pq_threshold`, the add that tips it over
pays for: codec training (<=100k resident rows), re-encoding EVERY row,
and the exact-row handoff. That is a one-time serving stall — an operator
sizing `pq_threshold`/`hbm_budget_gb` needs to know how long the engine
blocks at the crossing.

    python tools/exp_migration.py [--rows 1000000 2000000]
    python tools/exp_migration.py --repeat 3            # median-of-3 stall
    python tools/exp_migration.py --mode async          # serve-while-migrating

`--mode async` measures the opt-in zero-stall path (AutoGallery
migrate_async=True): the triggering add returns immediately, a probe
thread keeps calling search_batch while the codec trains + re-encodes in
the background, and the run reports the probe latencies (median/max) plus
the time-to-tier-flip — the number an operator trades the sync stall for.

Prints one JSON line per scale; the table lives in docs/PERF.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def make_rows(n_rows: int, d: int = 512, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # identity-structured rows (pure noise under-represents codec work:
    # k-means on structure converges differently than on isotropy)
    n_ident = max(64, n_rows // 64)
    centers = rng.normal(size=(n_ident, d)).astype(np.float32)
    mat = centers[rng.integers(0, n_ident, size=n_rows)]
    mat += 0.3 * rng.normal(size=mat.shape).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return mat


def run_scale(n_rows: int, d: int = 512, seed: int = 0) -> dict:
    from scrfd_arcface_facerecognition_tpu.gallery import AutoGallery

    mat = make_rows(n_rows, d, seed)

    g = AutoGallery(capacity=n_rows + 8, pq_threshold=1 << 62)
    t0 = time.perf_counter()
    g.add_batch(np.arange(n_rows, dtype=np.int64), mat)
    t_fill = time.perf_counter() - t0

    t0 = time.perf_counter()
    g._migrate()                       # the threshold-crossing stall
    t_migrate = time.perf_counter() - t0
    assert g.tier == "pq"

    # post-migration search sanity + first-search latency (fresh jit)
    q = mat[: 16]
    t0 = time.perf_counter()
    hits = g.search_batch(q, k=1)
    t_search = time.perf_counter() - t0
    top1 = sum(1 for i, h in enumerate(hits) if h and h[0].id == i)
    return {"rows": n_rows, "fill_s": round(t_fill, 1),
            "migrate_s": round(t_migrate, 1),
            "first_search_s": round(t_search, 2),
            "top1_self": f"{top1}/16"}


def run_scale_async(n_rows: int, d: int = 512, seed: int = 0,
                    probe_period_s: float = 0.25) -> dict:
    """Serve-while-migrating: trigger the crossing with migrate_async=True
    and probe search latency from the caller's side until the tier flips."""
    from scrfd_arcface_facerecognition_tpu.gallery import AutoGallery

    mat = make_rows(n_rows, d, seed)
    g = AutoGallery(capacity=n_rows + 64, pq_threshold=n_rows,
                    migrate_async=True)
    ids = np.arange(n_rows, dtype=np.int64)
    t0 = time.perf_counter()
    g.add_batch(ids[:-1], mat[:-1])          # below threshold: no trigger
    t_fill = time.perf_counter() - t0

    q = mat[:16]
    g.search_batch(q, k=1)                   # absorb the dense-search jit

    t0 = time.perf_counter()
    g.add_batch(ids[-1:], mat[-1:])          # crosses: kicks the bg build
    t_trigger_add = time.perf_counter() - t0

    lat, flip_lat = [], None
    t_start = time.perf_counter()
    while True:
        t1 = time.perf_counter()
        hits = g.search_batch(q, k=1)
        dt = time.perf_counter() - t1
        if g.tier == "pq":
            # this call absorbed the swap delta + the first PQ-search jit
            flip_lat = dt
            break
        lat.append(dt)
        time.sleep(probe_period_s)
    t_flip = time.perf_counter() - t_start

    top1 = sum(1 for i, h in enumerate(hits) if h and h[0].id == i)
    lat_ms = sorted(x * 1e3 for x in lat)
    return {"mode": "async", "rows": n_rows,
            "fill_s": round(t_fill, 1),
            "trigger_add_s": round(t_trigger_add, 3),
            "time_to_pq_tier_s": round(t_flip, 1),
            "probes_during_migration": len(lat),
            "probe_ms_median": round(lat_ms[len(lat_ms) // 2], 1)
            if lat_ms else None,
            "probe_ms_max": round(lat_ms[-1], 1) if lat_ms else None,
            "swap_call_s": round(flip_lat, 2),
            "top1_self": f"{top1}/16"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+",
                    default=[1_000_000, 2_000_000])
    ap.add_argument("--mode", choices=["sync", "async"], default="sync")
    ap.add_argument("--repeat", type=int, default=1,
                    help="repeat each scale; prints every run plus a "
                         "median summary line (wall numbers on the "
                         "tunneled chip vary with contention)")
    args = ap.parse_args()
    run = run_scale if args.mode == "sync" else run_scale_async
    for n in args.rows:
        stalls = []
        for r in range(args.repeat):
            res = run(n, seed=r)
            print(json.dumps(res), flush=True)
            stalls.append(res.get("migrate_s", res.get("time_to_pq_tier_s")))
        if args.repeat > 1:
            s = sorted(stalls)
            print(json.dumps({
                "summary": args.mode, "rows": n, "runs": len(s),
                "stall_median_s": s[len(s) // 2],
                "stall_min_s": s[0], "stall_max_s": s[-1]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
