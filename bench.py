"""End-to-end benchmark: 1080p frames/sec/chip through the fused pipeline.

Measures BASELINE.json's headline metric — detect (SCRFD-10G) + align +
embed (ArcFace-R50) + gallery match per 1080p frame, on whatever chip
jax.devices()[0] is. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
vs_baseline is value / 500 (the north-star ≥500 fps/chip target; the
reference publishes no numbers of its own — BASELINE.md).
"""
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np

TARGET_FPS = 500.0


def main():
    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    gallery_size = int(os.environ.get("BENCH_GALLERY", "128"))
    max_det = int(os.environ.get("BENCH_MAX_DET", "16"))

    pipe = FacePipeline(det_variant="det_10g", rec_variant="w600k_r50",
                        conf_thres=0.5, max_det=max_det, pre_nms=256,
                        gallery_capacity=max(gallery_size, 128),
                        dtype=jnp.bfloat16, seed=0)
    rng = np.random.default_rng(0)
    pipe.set_gallery(rng.normal(size=(gallery_size, 512)).astype(np.float32),
                     [f"p{i}" for i in range(gallery_size)])

    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch, 1080, 1920, 3), dtype=np.uint8))

    # compile + warmup
    out = pipe(frames)
    jax.block_until_ready(out)
    out = pipe(frames)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "e2e_1080p_frames_per_sec_per_chip "
                  "(SCRFD-10G det + ArcFace-R50 embed + gallery match)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 4),
    }))


if __name__ == "__main__":
    main()
