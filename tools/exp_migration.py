"""Measure the dense -> PQ tier migration stall (gallery/auto.py).

When a growing gallery crosses `pq_threshold`, the add that tips it over
pays for: codec training (<=100k resident rows), re-encoding EVERY row,
and the exact-row handoff. That is a one-time serving stall — an operator
sizing `pq_threshold`/`hbm_budget_gb` needs to know how long the engine
blocks at the crossing.

    python tools/exp_migration.py [--rows 1000000 2000000]

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


def run_scale(n_rows: int, d: int = 512, seed: int = 0) -> dict:
    from scrfd_arcface_facerecognition_tpu.gallery import AutoGallery

    rng = np.random.default_rng(seed)
    # identity-structured rows (pure noise under-represents codec work:
    # k-means on structure converges differently than on isotropy)
    n_ident = max(64, n_rows // 64)
    centers = rng.normal(size=(n_ident, d)).astype(np.float32)
    mat = centers[rng.integers(0, n_ident, size=n_rows)]
    mat += 0.3 * rng.normal(size=mat.shape).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+",
                    default=[1_000_000, 2_000_000])
    args = ap.parse_args()
    for n in args.rows:
        print(json.dumps(run_scale(n)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
