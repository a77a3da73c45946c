"""PQ gallery at 10M identities: the regime the capacity tier exists for.

docs/PERF.md's 1M-identity measurements show the dense f32 matmul winning
(6.7 ms vs PQ-MXU 41 ms) while the matrix fits HBM. At 10M identities the
dense matrix is 10M x 512 x 4B = 20 GB — it CANNOT fit a v5e chip's 16 GB
HBM — while PQ codes are 10M x 64 = 640 MB (32x less). This experiment
measures the tier at that scale on the real chip:

    python tools/exp_pq_scale.py [--g 10000000] [--q 16] [--k 5]

Prints one JSON line per measurement; results land in docs/PERF.md.
"""
import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def median_time(fn, rounds=5):
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=10_000_000)
    ap.add_argument("--q", type=int, default=16,
                    help="query batch for the recall study")
    ap.add_argument("--q-sweep", type=str, default="",
                    help="comma list of query-batch sizes to time at --g "
                         "(e.g. 16,64,128,256): the ADC kernel's matmuls "
                         "fill Q of the MXU's 128 rows, so per-query cost "
                         "should drop ~Q/16-fold until Q=128")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=500_000,
                    help="host-side fill chunk (bounds host RAM: "
                         "chunk x 512 x 4B)")
    ap.add_argument("--dense-g", type=int, default=2_000_000,
                    help="dense-matmul comparison size (must fit HBM "
                         "alongside workspace; 0 skips)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.gallery.pq import (
        PQCodec, PQGallery)

    rng = np.random.default_rng(0)

    def unit_rows(n):
        x = rng.normal(size=(n, 512)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return x

    print(json.dumps({"note": "training codec", "m": args.m}), flush=True)
    codec = PQCodec.train(unit_rows(100_000), m=args.m)

    g = PQGallery(codec, capacity=args.g)
    t0 = time.perf_counter()
    filled = 0
    while filled < args.g:
        n = min(args.chunk, args.g - filled)
        g.add(np.arange(filled, filled + n), unit_rows(n))
        filled += n
    jax.block_until_ready(g._codes)
    print(json.dumps({
        "metric": f"pq_fill_rate (encode+scatter, G={args.g})",
        "value": round(args.g / (time.perf_counter() - t0), 0),
        "unit": "rows/sec"}), flush=True)

    codes_mb = args.g * args.m / 1e6
    sweep = ([int(x) for x in args.q_sweep.split(",")]
             if args.q_sweep else [args.q])
    for qn in sweep:
        q = unit_rows(qn)
        for prec in ("hilo", "hi"):
            s, ids = g.search(q, k=args.k, precision=prec)  # compile+warm
            assert (ids >= 0).all()
            dt = median_time(lambda: g.search(q, k=args.k, precision=prec))
            print(json.dumps({
                "metric": f"pq_adc_search_ms (G={args.g}, Q={qn}, "
                          f"top-{args.k}, {g.adc_impl}/{prec}, codes "
                          f"{codes_mb:.0f} MB; dense f32 would need "
                          f"{args.g * 512 * 4 / 1e9:.0f} GB HBM)",
                "value": round(dt * 1000, 2), "unit": "ms",
                "per_query_ms": round(dt * 1000 / qn, 3)}), flush=True)
    q = unit_rows(args.q)

    if args.dense_g:
        # largest dense matmul for context (the tier-crossover reference)
        del g  # release the 10M-row code matrix before the f32 allocation
        rows = unit_rows(args.dense_g)
        emb = jnp.asarray(rows)
        qd = jnp.asarray(q)

        @jax.jit
        def dense_search(qq, ee):
            return jax.lax.top_k(qq @ ee.T, args.k)

        s2, exact_ids = dense_search(qd, emb)
        np.asarray(s2)
        dt2 = median_time(lambda: np.asarray(dense_search(qd, emb)[0]))
        print(json.dumps({
            "metric": f"dense_matmul_search_ms (G={args.dense_g}, "
                      f"{args.dense_g * 512 * 4 / 1e9:.1f} GB HBM)",
            "value": round(dt2 * 1000, 2), "unit": "ms"}), flush=True)

        del emb, exact_ids, rows

        # Recall on identity-structured data (what the gallery actually
        # holds: many observations per person, intra-person cosine ~0.7 —
        # i.i.d. unit vectors are PQ's worst case and not the workload).
        n_ident = max(args.dense_g // 4, 1)
        centers = unit_rows(n_ident)
        ident = rng.integers(0, n_ident, size=args.dense_g)
        # per-coordinate sigma for intra-identity cosine ~0.7
        # (cos ~ 1 / (1 + 512 s^2)): the regime real face embeddings
        # of one person occupy
        sig = float(np.sqrt((1 / 0.7 - 1) / 512))
        rows = centers[ident] + sig * rng.normal(
            size=(args.dense_g, 512)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        q_ident = rng.integers(0, n_ident, size=args.q)
        qc = centers[q_ident] + sig * rng.normal(
            size=(args.q, 512)).astype(np.float32)
        qc /= np.linalg.norm(qc, axis=1, keepdims=True)

        emb = jnp.asarray(rows)
        exact_ids = np.asarray(dense_search(jnp.asarray(qc), emb)[1])
        del emb
        codec_c = PQCodec.train(rows[:100_000], m=args.m)
        gr = PQGallery(codec_c, capacity=args.dense_g, keep_exact=True)
        filled = 0
        while filled < args.dense_g:
            n = min(args.chunk, args.dense_g - filled)
            gr.add(np.arange(filled, filled + n), rows[filled:filled + n])
            filled += n
        for label, kw in (("adc", {}), ("rerank=100", {"rerank": 100})):
            _, pq_ids = gr.search(qc, k=args.k, **kw)
            hits = sum(len(set(pq_ids[i]) & set(exact_ids[i]))
                       for i in range(args.q))
            ident_hits = sum(ident[pq_ids[i][0]] == q_ident[i]
                             for i in range(args.q))
            print(json.dumps({
                "metric": f"pq_recall_at_{args.k} ({label}, "
                          f"G={args.dense_g}, {n_ident} identities, "
                          f"m={args.m})",
                "value": round(hits / (args.q * args.k), 4),
                "unit": "recall",
                "top1_same_identity": round(ident_hits / args.q, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
