"""Secondary benchmarks: the non-headline BASELINE.json configs.

(The driver's headline metric comes from bench.py; this script documents
the remaining configs with one JSON line each.)

- config 1/2-style: single-image full pipeline latency (detect+align+embed+
  match), det_10g + r50.
- config 4: duplicate detection over the reference's image_cache as one
  G x G cosine matmul + grouping (vs the reference's O(G) Qdrant loop).
- config 5: batch embed of real image_cache JPEGs through the batched
  FaceAnalysis path (the clustering engine's hot loop).
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF_CACHE = "/root/reference/image_cache"


def main():
    import cv2
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline
    from scrfd_arcface_facerecognition_tpu.gallery import (
        all_pairs_similarity, duplicate_groups)
    from scrfd_arcface_facerecognition_tpu.apps.face_analysis import FaceAnalysis
    from scrfd_arcface_facerecognition_tpu.utils.compile_cache import (
        enable_compile_cache)

    enable_compile_cache(os.path.dirname(os.path.abspath(__file__)))

    class _Results(list):
        def append(self, r):   # stream each row as soon as it's measured
            print(json.dumps(r), flush=True)
            super().append(r)

    results = _Results()
    rng = np.random.default_rng(0)

    # ---- single-frame latency (configs 1-2) ------------------------------
    pipe = FacePipeline(det_variant="det_10g", rec_variant="w600k_r50",
                        max_det=16, gallery_capacity=128,
                        dtype=jnp.bfloat16, use_pallas_warp="force")
    pipe.set_gallery(rng.normal(size=(16, 512)).astype(np.float32),
                     [f"p{i}" for i in range(16)])
    frame = jnp.asarray(rng.integers(0, 255, (1, 1080, 1920, 3),
                                     dtype=np.uint8))
    out = pipe(frame, max_num=10)
    _ = np.asarray(out.match_sim)
    lats = []
    for _i in range(10):
        t0 = time.perf_counter()
        out = pipe(frame, max_num=10)
        _ = np.asarray(out.match_sim)
        lats.append(time.perf_counter() - t0)
    results.append({"metric": "single_1080p_frame_latency_ms "
                              "(det_10g+r50, incl host readback)",
                    "value": round(min(lats) * 1000, 2), "unit": "ms"})

    # ---- config 4: image_cache duplicate detection -----------------------
    paths = sorted(glob.glob(os.path.join(REF_CACHE, "*.jpg")))
    g = max(len(paths), 360)
    embs = rng.normal(size=(g, 512)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    _ = all_pairs_similarity(embs)  # compile
    t0 = time.perf_counter()
    for _i in range(5):
        sims = all_pairs_similarity(embs)
    dt = (time.perf_counter() - t0) / 5
    groups = duplicate_groups(embs, 0.95)
    results.append({"metric": f"gallery_dedup_GxG_cosine_matmul (G={g})",
                    "value": round(dt * 1000, 2), "unit": "ms",
                    "groups_found": len(groups)})

    # ---- config 5: real-JPEG batch embed through FaceAnalysis ------------
    # image_cache JPEGs come in many shapes; a compiled program per shape is
    # pathological, so normalize to one shape host-side (what a production
    # ingest would do) and run ONE device batch.
    if paths:
        imgs = [cv2.imread(p) for p in paths[:64]]
        imgs = [cv2.resize(im, (480, 640)) for im in imgs if im is not None]
        app = FaceAnalysis(det_variant="det_10g", rec_variant="w600k_r50")
        app.prepare(ctx_id=0, det_size=(640, 640), det_thresh=0.3)
        app.get_batch(imgs[:len(imgs)])  # compile at full batch shape
        t0 = time.perf_counter()
        app.get_batch(imgs)
        dt = time.perf_counter() - t0
        results.append({"metric": "clustering_batch_embed_images_per_sec "
                                  "(real image_cache JPEGs @640x480, "
                                  "det_10g+r50)",
                        "value": round(len(imgs) / dt, 2), "unit": "img/s"})

    # ---- realistic-density + warp-fallback variants ----------------------
    # The headline bench saturates every face slot (960 faces/batch);
    # production video carries 1-3 faces/frame. Score-threshold calibration
    # is impossible with random weights (the bf16 sigmoid saturates every
    # score to exactly 1.0), so density is set the honest way: max_num=2
    # caps the per-frame selection, giving the real 2-face stage-2 load.
    # policy=force runs the pallas warp; policy=auto with degenerate random
    # landmarks exceeds the repair budget and measures the full XLA-warp
    # fallback branch under load (the path production takes when the
    # envelope trips).
    for policy in ("force", "auto"):
        dense = FacePipeline(det_variant="det_10g", rec_variant="w600k_r50",
                             max_det=16, gallery_capacity=128,
                             dtype=jnp.bfloat16, use_pallas_warp=policy)
        dense.set_gallery(rng.normal(size=(128, 512)).astype(np.float32),
                          [f"p{i}" for i in range(128)])
        batch = 96
        frames = jnp.asarray(rng.integers(0, 255, (batch, 1080, 1920, 3),
                                          dtype=np.uint8))
        out = dense(frames, max_num=2)
        _ = np.asarray(out.match_sim[0, 0])
        faces = int(np.asarray(out.valid).sum())
        t0 = time.perf_counter()
        n = 0
        o = None
        for o in dense.process_stream([frames] * 8, max_num=2):
            n += o.boxes.shape[0]
        if o is not None:
            _ = np.asarray(o.match_sim[0, 0])
        dt = time.perf_counter() - t0
        results.append({
            "metric": "e2e_1080p_fps_realistic_density "
                      f"(max_num=2, faces={faces}/{batch} frames, "
                      f"warp_policy={policy}, det_10g+r50)",
            "value": round(n / dt, 2), "unit": "frames/sec/chip"})

    # ---- model tiers below the headline pairing (det_10g+r50 = bench.py):
    # small = det_500m + w600k_mbf (the reference's fast pairing,
    # README.md:57,60), mid = det_2.5g + w600k_mbf — both at headline
    # conditions (max_num=10, worst-case face density) ---------------------
    for tier, det_v, rec_v in (("small", "det_500m", "w600k_mbf"),
                               ("mid", "det_2.5g", "w600k_mbf")):
        tp = FacePipeline(det_variant=det_v, rec_variant=rec_v,
                          max_det=10, gallery_capacity=128,
                          dtype=jnp.bfloat16, use_pallas_warp="force")
        tp.set_gallery(rng.normal(size=(128, 512)).astype(np.float32),
                       [f"p{i}" for i in range(128)])
        batch = 96
        frames = jnp.asarray(rng.integers(0, 255, (batch, 1080, 1920, 3),
                                          dtype=np.uint8))
        out = tp(frames, max_num=10)
        _ = np.asarray(out.match_sim[0, 0])
        t0 = time.perf_counter()
        n = 0
        o = None
        for o in tp.process_stream([frames] * 8, max_num=10,
                                   depth=int(os.environ.get("BENCH_DEPTH",
                                                            "12"))):
            n += o.boxes.shape[0]
        if o is not None:
            _ = np.asarray(o.match_sim[0, 0])
        dt = time.perf_counter() - t0
        results.append({
            "metric": f"e2e_1080p_fps_{tier}_tier ({det_v}+{rec_v}, "
                      "max_num=10 all slots occupied)",
            "value": round(n / dt, 2), "unit": "frames/sec/chip"})

    # ---- N-stream aggregate serving (MultiStreamReader e2e) --------------
    # The serving model docs/PERF.md describes: N cameras decode on host
    # threads feeding ONE shared device batch per cycle. Measured end to
    # end (decode + batch assembly + full pipeline) over synthetic 1080p
    # H.264-in-mp4 files.
    import tempfile

    from scrfd_arcface_facerecognition_tpu.runtime.video import (
        MultiStreamReader, open_capture)

    n_streams = int(os.environ.get("BENCH_STREAMS", "8"))
    n_frames = int(os.environ.get("BENCH_STREAM_FRAMES", "96"))
    tmpdir = tempfile.mkdtemp(prefix="bench_streams_")
    paths_v = []
    # codec-realistic content: smooth gradients + a moving block. Noise
    # frames are a codec worst case (mp4v decode collapsed to ~5 fps/stream
    # on them, measuring the codec, not the serving path).
    yy, xx = np.mgrid[0:1080, 0:1920]
    base = np.stack([(xx // 8) % 256, (yy // 8) % 256,
                     ((xx + yy) // 16) % 256], -1).astype(np.uint8)
    for si in range(n_streams):
        p = os.path.join(tmpdir, f"s{si}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 24.0,
                             (1920, 1080))
        for fi in range(n_frames):
            frame = base.copy()
            x0 = (40 * fi + 100 * si) % 1600
            frame[300:600, x0:x0 + 300] = (si * 30 % 255, 200, 80)
            wr.write(frame)
        wr.release()
        paths_v.append(p)

    pipe2 = FacePipeline(det_variant="det_10g", rec_variant="w600k_r50",
                         max_det=16, gallery_capacity=128,
                         dtype=jnp.bfloat16, use_pallas_warp="force")
    pipe2.set_gallery(rng.normal(size=(128, 512)).astype(np.float32),
                      [f"p{i}" for i in range(128)])
    warm = jnp.asarray(rng.integers(0, 255, (n_streams, 1080, 1920, 3),
                                    dtype=np.uint8))
    _ = np.asarray(pipe2(warm, max_num=10).match_sim[0, 0])

    # (a) host side alone: N-stream decode + batch assembly aggregate
    reader = MultiStreamReader([open_capture(p) for p in paths_v])
    t0 = time.perf_counter()
    n = 0
    try:
        for batch_np, ids in reader:
            n += len(ids)
    finally:
        reader.release()
    dt = time.perf_counter() - t0
    results.append({
        "metric": f"multistream_decode_aggregate_fps ({n_streams} x 1080p "
                  "mp4 decode -> shared batch assembly, host only)",
        "value": round(n / dt, 2), "unit": "frames/sec",
        "per_stream_fps": round(n / dt / n_streams, 2)})

    # (b) end to end including the host->device frame transfer. NOTE: on
    # this development transport (remote-PJRT tunnel) the 48 MB/cycle
    # frame upload dominates — the number measures the tunnel, not the
    # design; a co-located host moves 1080p batches at PCIe rates.
    reader = MultiStreamReader([open_capture(p) for p in paths_v])
    t0 = time.perf_counter()
    n = 0
    try:
        def batches():
            for batch_np, ids in reader:
                if len(ids) == n_streams:   # full cycles only (one compile)
                    yield jnp.asarray(batch_np)
        o = None
        for o in pipe2.process_stream(batches(), max_num=10):
            n += o.boxes.shape[0]
        if o is None:
            raise RuntimeError(
                f"no full {n_streams}-stream cycle was ever assembled "
                "(a stream failed to open or stalled on its first frame)")
        _ = np.asarray(o.match_sim[0, 0])
    finally:
        reader.release()
    dt = time.perf_counter() - t0
    results.append({
        "metric": f"multistream_aggregate_fps ({n_streams} x 1080p mp4 "
                  "decode->upload->detect+embed+match e2e, "
                  "MultiStreamReader; transport-bound on the dev tunnel)",
        "value": round(n / dt, 2), "unit": "frames/sec/chip",
        "per_stream_fps": round(n / dt / n_streams, 2)})

    # (c) same e2e path through the multi-process DecodePool (worker
    # processes -> shared-memory slots -> device batches), closing the
    # loop bench_ingest.py measures host-only. On this 1-core VM the pool
    # can't beat threads (workers time-slice one core and spawn costs
    # ~0.5 s/worker); the row exists to prove the full chain feeds the
    # chip and to be re-run on a multi-core deployment host where the
    # measured 1.7x/core decode advantage (docs/PERF.md) compounds.
    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    pool = DecodePool(paths_v, workers=max(2, os.cpu_count() or 1))
    t0 = time.perf_counter()
    n = 0
    try:
        def pool_batches():
            for batch_np, ids in pool:
                if len(ids) == n_streams:   # full cycles only (one compile)
                    yield jnp.asarray(batch_np)
        o = None
        for o in pipe2.process_stream(pool_batches(), max_num=10):
            n += o.boxes.shape[0]
        if o is None:
            raise RuntimeError(
                f"no full {n_streams}-stream cycle was ever assembled "
                "through the decode pool (a worker failed to open a "
                "source or stalled on its first frame)")
        _ = np.asarray(o.match_sim[0, 0])
    finally:
        pool.release()
    dt = time.perf_counter() - t0
    results.append({
        "metric": f"decodepool_aggregate_fps ({n_streams} x 1080p mp4 "
                  "worker-process decode->shared-memory slots->upload->"
                  "detect+embed+match e2e; 1-core host, see docs/PERF.md)",
        "value": round(n / dt, 2), "unit": "frames/sec/chip",
        "per_stream_fps": round(n / dt / n_streams, 2)})

    import shutil

    shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main()
