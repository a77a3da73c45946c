"""N-camera re-identification: every live stream in one device batch.

Generalizes the reference's two-camera surface (main2.py) to any number of
sources: each camera decodes on its own thread (H.264 is CPU-bound at
~340 fps/stream — docs/PERF.md), MultiStreamReader rounds them up into one
(n_live, H, W, 3) batch per cycle, and a single detect->embed->match
program serves all cameras. Annotated outputs write per-stream mp4s.

    python -m scrfd_arcface_facerecognition_tpu.apps.multistream \
        --sources rtsp://cam1 rtsp://cam2 video3.mp4 --faces-dir ./faces
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from .realtime import build_targets, annotate_batch, variant_from_path

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="N-camera Face Re-ID")
    parser.add_argument("--sources", type=str, nargs="+", required=True,
                        help="Any mix of rtsp:// URLs, files, webcam indices")
    parser.add_argument("--det-weight", type=str,
                        default="./weights/det_10g.onnx")
    parser.add_argument("--rec-weight", type=str,
                        default="./weights/w600k_r50.onnx")
    parser.add_argument("--similarity-thresh", type=float, default=0.4)
    parser.add_argument("--confidence-thresh", type=float, default=0.5)
    parser.add_argument("--faces-dir", type=str, default="./faces")
    parser.add_argument("--max-num", type=int, default=0)
    parser.add_argument("--output-dir", type=str, default="",
                        help="Write annotated <dir>/stream_<i>.mp4 files")
    parser.add_argument("--max-frames", type=int, default=0,
                        help="Stop after this many frames total (0 = all)")
    parser.add_argument("--decode-pool", action="store_true",
                        help="Decode in worker PROCESSES via shared memory "
                             "(runtime/decode_pool.DecodePool) instead of "
                             "threads — use on multi-core hosts where "
                             "thread decode can't feed the chip "
                             "(docs/SERVING.md core budget)")
    parser.add_argument("--decode-workers", type=int, default=0,
                        help="Decode processes for --decode-pool "
                             "(0 = one per core)")
    parser.add_argument("--slot-bytes", type=int, default=0,
                        help="Shared-memory frame slot size for "
                             "--decode-pool (0 = 1080p BGR). Must cover "
                             "the largest source's h*w*3 — oversized "
                             "frames drop the stream with an error log")
    return parser.parse_args(argv)


def run(params) -> dict:
    import cv2
    import jax.numpy as jnp

    from ..pipeline import FacePipeline
    from ..runtime.video import MultiStreamReader, open_capture

    pipeline = FacePipeline(
        det_variant=variant_from_path(params.det_weight, "det_10g"),
        rec_variant=variant_from_path(params.rec_weight, "w600k_r50"),
        conf_thres=params.confidence_thresh,
        similarity_thresh=params.similarity_thresh,
        det_onnx=(params.det_weight
                  if os.path.exists(params.det_weight) else None),
        rec_onnx=(params.rec_weight
                  if os.path.exists(params.rec_weight) else None),
        dtype=jnp.bfloat16)
    targets = build_targets(pipeline, params.faces_dir)
    if targets:
        pipeline.set_gallery(np.stack([t[0] for t in targets]),
                             [t[1] for t in targets])
    import random

    colors = {name: (random.randint(0, 256), random.randint(0, 256),
                     random.randint(0, 256)) for _, name in targets}

    if getattr(params, "decode_pool", False):
        from ..runtime.decode_pool import DecodePool

        reader = DecodePool(params.sources,
                            workers=params.decode_workers or None,
                            slot_bytes=getattr(params, "slot_bytes", 0)
                            or None)
    else:
        reader = MultiStreamReader([open_capture(s)
                                    for s in params.sources])
    writers = {}
    n = 0
    try:
        for batch, ids in reader:
            out = pipeline(jnp.asarray(batch), max_num=params.max_num)
            annotate_batch(batch, out, pipeline.names, colors)
            if params.output_dir:
                os.makedirs(params.output_dir, exist_ok=True)
                for bi, sid in enumerate(ids):
                    if sid not in writers:
                        # size the writer from the stream's OWN capture dims,
                        # not the batch's padded max: a shrinking batch (after
                        # the largest stream ends) would make cv2.VideoWriter
                        # silently drop every mismatched frame, and smaller
                        # streams would bake the zero padding into their mp4s
                        cap = getattr(reader, "captures", None)
                        cap = cap[sid] if cap is not None else None
                        if cap is not None:
                            sw = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) \
                                or batch.shape[2]
                            sh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) \
                                or batch.shape[1]
                            fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
                        else:
                            # DecodePool captures live in worker processes,
                            # but it records each stream's OWN dims off its
                            # first frame — padded batch dims would bake the
                            # zero padding into smaller streams' mp4s and
                            # make cv2 silently drop frames once the largest
                            # stream ends and batches shrink
                            dims = getattr(reader, "stream_dims",
                                           {}).get(sid)
                            sh, sw = dims if dims else (batch.shape[1],
                                                        batch.shape[2])
                            # the pool records each stream's real rate off
                            # its capture (a hardcoded 24.0 played 30 fps
                            # cameras 20% slow)
                            fps = getattr(reader, "stream_fps",
                                          {}).get(sid) or 24.0
                        writers[sid] = (cv2.VideoWriter(
                            os.path.join(params.output_dir,
                                         f"stream_{sid}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), fps,
                            (sw, sh)), sh, sw)
                    w, sh, sw = writers[sid]
                    w.write(batch[bi, :sh, :sw])
            n += len(ids)
            if params.max_frames and n >= params.max_frames:
                break
    finally:
        reader.release()
        for w, _, _ in writers.values():
            w.release()
    return {"frames": n, "streams": len(params.sources),
            "targets": len(targets)}


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
