"""End-to-end benchmark: 1080p frames/sec/chip through the fused pipeline.

Measures BASELINE.json's headline metric — letterbox + detect (SCRFD-10G) +
NMS + align + embed (ArcFace-R50) + gallery match per 1080p frame on one
chip, at the spec'd video workload (config 3: max-num=10 faces/frame).

Weights default to the TORCH STAND-INS loaded through config-from-graph
(BENCH_WEIGHTS=standin): structured score/landmark distributions let NMS
suppression, face-count bucketing and the production AUTO warp policy run
on representative inputs — random Flax init saturates every detector score
to 1.0 and its degenerate landmarks trip the warp envelope on every face
(BENCH_WEIGHTS=random keeps that mode measurable; it forces the pallas
warp so the kernel's true cost is still visible).
Sustained-throughput methodology: BENCH_PIPELINE batches are kept in flight
and synced at the end (matching a video pipeline that only reads results
back as annotations); sync uses a host readback because
jax.block_until_ready is unreliable through remote PJRT transports.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
vs_baseline = value / 500 (the north-star >=500 fps/chip target;
the reference publishes no numbers of its own — BASELINE.md).
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


def _standin_pipeline_parts(dtype, conf_thres, pre_nms, max_det):
    """Detector/Embedder carrying the torch stand-in weights.

    The stand-ins (tests/torch_export.py STAND_INS — deterministic seeded
    torch graphs with calibrated detector geometry) are exported to ONNX
    once (cached) and loaded through the PRODUCTION path: config-from-graph
    inference + the ordered importer — the same route real released files
    take. Unlike raw random Flax init, their detector scores do not
    saturate at 1.0 and their landmarks vary per face, so NMS suppression,
    face-count bucketing and the auto warp policy all run on representative
    inputs (VERDICT r3 item 6)."""
    import zlib

    import jax.numpy as jnp  # noqa: F401  (parity with main's imports)
    from scrfd_arcface_facerecognition_tpu.models.config_from_graph import (
        flax_from_onnx)
    from scrfd_arcface_facerecognition_tpu.pipeline.detector import Detector
    from scrfd_arcface_facerecognition_tpu.pipeline.embedder import Embedder

    cache = os.path.join(_REPO_ROOT, ".bench_standins")
    # key the cache on the stand-in DEFINITION (tests/torch_export.py
    # bytes): an unkeyed cache kept serving ONNX from a previous definition
    # after edits (as happened with gn_groups), silently benching bytes
    # that no longer match what verify_release signs off
    with open(os.path.join(_REPO_ROOT, "tests", "torch_export.py"),
              "rb") as f:
        def_key = f"{zlib.crc32(f.read()):08x}"
    det_path = os.path.join(cache, f"det_10g_standin_{def_key}.onnx")
    rec_path = os.path.join(cache, f"w600k_r50_standin_{def_key}.onnx")
    if not (os.path.exists(det_path) and os.path.exists(rec_path)):
        os.makedirs(cache, exist_ok=True)
        sys.path.insert(0, os.path.join(_REPO_ROOT, "tests"))
        import torch
        from torch_export import (STAND_INS, calibrate_detector,
                                  export_onnx, seeded)

        # per-name crc seed matches tools/verify_release.py resolve_graph,
        # so the bench exercises the exact bytes the sign-off harness does
        tm = calibrate_detector(seeded(
            STAND_INS["det_10g"](), seed=zlib.crc32(b"det_10g") % 1000))
        export_onnx(tm, torch.randn(1, 3, 640, 640), det_path + ".tmp")
        os.replace(det_path + ".tmp", det_path)
        rm = seeded(STAND_INS["w600k_r50"](),
                    seed=zlib.crc32(b"w600k_r50") % 1000)
        export_onnx(rm, torch.randn(1, 3, 112, 112), rec_path + ".tmp")
        os.replace(rec_path + ".tmp", rec_path)
        # evict stale definitions (incl. pre-keying legacy names): each
        # pair is ~190 MB and a long-lived machine would otherwise
        # accumulate one per historical torch_export.py edit
        for f in os.listdir(cache):
            full = os.path.join(cache, f)
            if full not in (det_path, rec_path) and f.endswith(".onnx"):
                os.remove(full)

    det_m, det_v = flax_from_onnx(det_path, name="det_10g")
    det = Detector(config=det_m.config, variables=det_v, dtype=dtype,
                   conf_thres=conf_thres, pre_nms=pre_nms, max_det=max_det)
    rec_m, rec_v = flax_from_onnx(rec_path, name="w600k_r50")
    emb = Embedder(config=rec_m.config, variables=rec_v, dtype=dtype)
    return det, emb


def main():
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline
    from scrfd_arcface_facerecognition_tpu.utils.compile_cache import (
        enable_compile_cache)

    enable_compile_cache(_REPO_ROOT)

    batch = int(os.environ.get("BENCH_BATCH", "96"))  # measured: 32 -> 517,
    # 64 -> 588, 96 -> 631 fps; 128 overruns HBM with the stream's
    # batches in flight (12 by default)
    # (docs/PERF.md optimization log)
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    pipeline_depth = int(os.environ.get("BENCH_PIPELINE", "12"))
    gallery_size = int(os.environ.get("BENCH_GALLERY", "128"))
    max_det = int(os.environ.get("BENCH_MAX_DET", "16"))
    max_num = int(os.environ.get("BENCH_MAX_NUM", "10"))  # BASELINE config 3

    weights = os.environ.get("BENCH_WEIGHTS", "standin")
    # standin (default): torch stand-in weights via config-from-graph —
    # structured score/landmark distributions, so "auto" (the production
    # warp policy) is the honest default. random: raw Flax init — its
    # degenerate landmarks would trip the envelope fallback on every
    # face, so "force" measures the pallas path's true cost there.
    warp_mode = os.environ.get(
        "BENCH_WARP", "auto" if weights == "standin" else "force")
    conf_thres = float(os.environ.get("BENCH_CONF", "0.5"))
    if weights == "standin":
        det, emb = _standin_pipeline_parts(jnp.bfloat16, conf_thres,
                                           pre_nms=256, max_det=max_det)
        pipe = FacePipeline(detector=det, embedder=emb,
                            gallery_capacity=max(gallery_size, 128),
                            use_pallas_warp=warp_mode)
    else:
        pipe = FacePipeline(det_variant="det_10g", rec_variant="w600k_r50",
                            conf_thres=conf_thres, max_det=max_det,
                            pre_nms=256,
                            gallery_capacity=max(gallery_size, 128),
                            dtype=jnp.bfloat16, seed=0,
                            use_pallas_warp=warp_mode)
    rng = np.random.default_rng(0)
    pipe.set_gallery(rng.normal(size=(gallery_size, 512)).astype(np.float32),
                     [f"p{i}" for i in range(gallery_size)])

    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch, 1080, 1920, 3), dtype=np.uint8))

    def sync(out):
        _ = np.asarray(out.match_sim[0, 0])  # forces full-program completion

    # compile + warmup (also compiles the face-count bucket used here)
    out = pipe(frames, max_num=max_num)
    sync(out)
    faces = int(np.asarray(out.valid).sum())
    out = pipe(frames, max_num=max_num)
    sync(out)

    trace_dir = os.environ.get("BENCH_TRACE")  # jax.profiler trace output
    # warm the streaming path too
    for o in pipe.process_stream([frames] * 2, max_num=max_num):
        sync(o)

    if trace_dir:
        import jax

        jax.profiler.start_trace(trace_dir)
    fps_rounds = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        n = 0
        for o in pipe.process_stream([frames] * pipeline_depth,
                                     max_num=max_num):
            n += o.boxes.shape[0]
        sync(o)
        dt = time.perf_counter() - t0
        fps_rounds.append(n / dt)
    if trace_dir:
        jax.profiler.stop_trace()

    # median is the defensible sustained number (max rewards one lucky
    # scheduling round; the spread is published alongside)
    fps_rounds.sort()
    median_fps = fps_rounds[len(fps_rounds) // 2]
    print(json.dumps({
        "metric": "e2e_1080p_frames_per_sec_per_chip "
                  "(SCRFD-10G det + NMS + align + ArcFace-R50 embed + "
                  f"gallery-{gallery_size} match, max_num={max_num}, "
                  f"faces_in_batch={faces}, median of {rounds} rounds, "
                  f"spread {min(fps_rounds):.0f}-{max(fps_rounds):.0f}, "
                  + ("torch stand-in weights via config-from-graph, "
                     f"{warp_mode} warp policy"
                     if weights == "standin" else
                     "random weights, forced pallas warp")
                  + "; synthetic 1080p frames — workload shape is the "
                  "spec'd video config)",
        "value": round(median_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(median_fps / TARGET_FPS, 4),
    }))


if __name__ == "__main__":
    main()
