"""Dual-camera re-identification (main2.py equivalent).

Mirrors /root/reference/main2.py: two video sources (RTSP IP cameras in the
reference, main2.py:33-36) processed against one shared gallery, displayed
side by side. TPU-first: the two streams' frames are stacked into a single
device batch so both cameras ride one detect->embed->match program.
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import cv2
import numpy as np

from .realtime import build_targets, annotate_batch, variant_from_path

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Dual-camera Face Re-ID")
    parser.add_argument("--source1", type=str, required=True,
                        help="First camera (rtsp:// URL, file, or index)")
    parser.add_argument("--source2", type=str, required=True,
                        help="Second camera")
    parser.add_argument("--det-weight", type=str, default="./weights/det_10g.onnx")
    parser.add_argument("--rec-weight", type=str, default="./weights/w600k_r50.onnx")
    parser.add_argument("--similarity-thresh", type=float, default=0.4)
    parser.add_argument("--confidence-thresh", type=float, default=0.5)
    parser.add_argument("--faces-dir", type=str, default="./faces")
    parser.add_argument("--max-num", type=int, default=0)
    parser.add_argument("--show", action="store_true")
    parser.add_argument("--output", type=str, default="")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--reconnect-delay", type=float, default=2.0,
                        help="Seconds between reconnect attempts (main2.py:33)")
    return parser.parse_args(argv)


def connect_to_camera(source, reconnect_delay: float = 2.0, attempts: int = 3):
    """Open a capture with retry (main2.py:33-76 semantics); rtsp://
    sources go through the native ffmpeg decoder when available."""
    from ..runtime.video import open_capture

    for i in range(attempts):
        cap = open_capture(str(source))
        if cap.isOpened():
            return cap
        logger.warning("Could not open %s (attempt %d/%d)", source, i + 1,
                       attempts)
        time.sleep(reconnect_delay)
    raise RuntimeError(f"Could not connect to camera {source!r}")


def run(params) -> dict:
    import jax.numpy as jnp
    from ..pipeline import FacePipeline

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
    import random

    targets = build_targets(pipeline, params.faces_dir)
    if targets:
        pipeline.set_gallery(np.stack([t[0] for t in targets]),
                             [t[1] for t in targets])
    colors = {name: (random.randint(0, 256), random.randint(0, 256),
                     random.randint(0, 256)) for _, name in targets}

    cap1 = connect_to_camera(params.source1, params.reconnect_delay)
    cap2 = connect_to_camera(params.source2, params.reconnect_delay)

    writer = None
    n = 0
    try:
        while True:
            ok1, f1 = cap1.read()
            ok2, f2 = cap2.read()
            if not (ok1 and ok2):
                break
            if f1.shape != f2.shape:
                f2 = cv2.resize(f2, (f1.shape[1], f1.shape[0]))
            batch = np.stack([f1, f2])
            out = pipeline(jnp.asarray(batch), max_num=params.max_num)
            annotate_batch(batch, out, pipeline.names, colors)
            combined = np.hstack([batch[0], batch[1]])  # main2.py hstack view
            if params.output:
                if writer is None:
                    writer = cv2.VideoWriter(
                        params.output, cv2.VideoWriter_fourcc(*"mp4v"), 24.0,
                        (combined.shape[1], combined.shape[0]))
                writer.write(combined)
            if params.show:
                cv2.imshow("Dual Camera", combined)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
            n += 2
            if params.max_frames and n >= params.max_frames:
                break
    finally:
        cap1.release()
        cap2.release()
        if writer is not None:
            writer.release()
        if params.show:
            cv2.destroyAllWindows()
    return {"frames": n, "targets": len(targets)}


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
