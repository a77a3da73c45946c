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

    results = []
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

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
