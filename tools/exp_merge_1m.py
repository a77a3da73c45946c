"""1M-identity merge/dedup on the real chip (VERDICT r3 item 4 done-when).

Builds a million-row gallery with planted near-duplicate pairs, runs the
blocked duplicate scan (gallery/dedup.py find_duplicate_pairs_blocked —
the formulation AutoGallery.duplicate_groups uses past 8k rows), and
verifies exactly the planted pairs come back. The one-shot G x G path
would need a 4 TB host matrix at this scale.

    python tools/exp_merge_1m.py [--g 1000000] [--dups 2000]

Prints JSON lines; results land in docs/PERF.md.
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
    ap.add_argument("--g", type=int, default=1_000_000)
    ap.add_argument("--dups", type=int, default=2000)
    ap.add_argument("--threshold", type=float, default=0.95)
    args = ap.parse_args()

    from scrfd_arcface_facerecognition_tpu.gallery.dedup import (
        find_duplicate_pairs_blocked)
    from scrfd_arcface_facerecognition_tpu.runtime.native import (
        uf_group_roots)

    rng = np.random.default_rng(0)
    n_unique = args.g - args.dups
    print(json.dumps({"note": f"building {args.g} rows "
                              f"({args.dups} planted duplicates)"}),
          flush=True)
    rows = rng.normal(size=(args.g, 512)).astype(np.float32)
    # plant: row n_unique+i duplicates row i (tiny jitter, cosine ~0.999)
    rows[n_unique:] = rows[:args.dups] + 0.01 * rng.normal(
        size=(args.dups, 512)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)

    t0 = time.perf_counter()
    pairs = find_duplicate_pairs_blocked(rows, args.threshold)
    dt = time.perf_counter() - t0
    want = {(i, n_unique + i) for i in range(args.dups)}
    got = {(a, b) for a, b, _ in pairs}
    ok = got == want
    print(json.dumps({
        "metric": f"blocked_dedup_scan_s (G={args.g}, "
                  f"{args.dups} planted pairs, thr={args.threshold})",
        "value": round(dt, 2), "unit": "s",
        "pairs_found": len(got), "exact_match": ok}), flush=True)

    # the merge worklist itself (union-find over the pairs)
    t0 = time.perf_counter()
    idx_pairs = np.asarray([(a, b) for a, b, _ in pairs], np.int64)
    roots = uf_group_roots(args.g, idx_pairs)
    n_groups = int(args.g - (roots != np.arange(args.g)).sum())
    dt2 = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"merge_unionfind_s (G={args.g})",
        "value": round(dt2, 3), "unit": "s",
        "groups_after_merge": n_groups}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
