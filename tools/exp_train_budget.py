"""Codec train-budget sweep: migration stall vs shortlist quality.

exp_migration.py measured the dense->PQ crossing stall at 320 s (1M) /
428 s (2M), with a FIXED ~210 s of PQCodec.train(100k rows, 20 k-means
iters) in both. Since AutoGallery always reranks exactly (scores are true
cosines; the codec only shapes the ADC shortlist), a cheaper codec is
acceptable exactly when shortlist recall holds. This sweep measures both
sides on 1M identity-structured rows.

    python tools/exp_train_budget.py
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=256)
    args = ap.parse_args()

    from scrfd_arcface_facerecognition_tpu.gallery.pq import (
        PQCodec, PQGallery)

    rng = np.random.default_rng(0)
    d = 512
    n_ident = args.rows // 64
    centers = rng.normal(size=(n_ident, d)).astype(np.float32)
    owner = rng.integers(0, n_ident, size=args.rows)
    mat = centers[owner] + 0.3 * rng.normal(
        size=(args.rows, d)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)

    # held-out queries: fresh jitters of known identities; the true
    # nearest gallery rows share the query's identity
    q_ident = rng.integers(0, n_ident, size=args.queries)
    q = centers[q_ident] + 0.3 * rng.normal(
        size=(args.queries, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    for train_rows, iters in ((100_000, 20), (50_000, 10), (25_000, 8),
                              (12_500, 5)):
        t0 = time.perf_counter()
        codec = PQCodec.train(mat[:train_rows], m=64, k=256, iters=iters)
        t_train = time.perf_counter() - t0
        g = PQGallery(codec, capacity=args.rows + 8, keep_exact=True)
        t0 = time.perf_counter()
        g.add(np.arange(args.rows, dtype=np.int64), mat)
        t_encode = time.perf_counter() - t0
        scores, ids = g.search(q, k=1, rerank=32)
        hit = sum(1 for qi in range(args.queries)
                  if ids[qi][0] >= 0 and owner[int(ids[qi][0])] == q_ident[qi])
        print(json.dumps({"train_rows": train_rows, "iters": iters,
                          "train_s": round(t_train, 1),
                          "encode_s": round(t_encode, 1),
                          "top1_identity": f"{hit}/{args.queries}"}),
              flush=True)
        del g
    return 0


if __name__ == "__main__":
    sys.exit(main())
