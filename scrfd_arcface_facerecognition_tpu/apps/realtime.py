"""Real-time face re-identification CLI (main.py-compatible).

Preserves the reference CLI surface (/root/reference/main.py:17-68): same
flags, same faces-dir gallery bootstrap (:78-105), same annotation style.
TPU-first redesign of the frame loop (:108-150): frames are processed in
device batches through the fused FacePipeline instead of per-face ONNX
round-trips, with the C++ frame-prefetch ring (runtime/framepipe) decoding
ahead of the device.

Notes vs the reference:
- `--source` is honored (the reference hardcodes webcam at main.py:163 and
  leaves the intended line commented out — that's a bug, not behavior worth
  preserving).
- display (cv2.imshow) is optional via --show; headless writes only.
"""
from __future__ import annotations

import argparse
import logging
import os
import random
from typing import List, Tuple

import cv2
import numpy as np

from ..pipeline import FacePipeline
from ..utils.drawing import draw_bbox, draw_bbox_info

logger = logging.getLogger(__name__)

_VARIANT_BY_WEIGHT = {
    "det_500m": "det_500m", "det_2.5g": "det_2.5g", "det_10g": "det_10g",
    "w600k_mbf": "w600k_mbf", "w600k_r50": "w600k_r50",
}


def variant_from_path(path: str, default: str) -> str:
    stem = os.path.splitext(os.path.basename(str(path)))[0]
    return _VARIANT_BY_WEIGHT.get(stem, default)


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Face Detection-and-Recognition")
    parser.add_argument("--det-weight", type=str,
                        default="./weights/det_10g.onnx",
                        help="Path to detection model")
    parser.add_argument("--rec-weight", type=str,
                        default="./weights/w600k_r50.onnx",
                        help="Path to recognition model")
    parser.add_argument("--similarity-thresh", type=float, default=0.4,
                        help="Similarity threshold between faces")
    parser.add_argument("--confidence-thresh", type=float, default=0.5,
                        help="Confidence threshold for face detection")
    parser.add_argument("--faces-dir", type=str, default="./faces",
                        help="Path to faces stored dir")
    parser.add_argument("--source", type=str,
                        default="./assets/in_video.mp4",
                        help="Video file or video camera source. i.e 0 - webcam")
    parser.add_argument("--max-num", type=int, default=0,
                        help="Maximum number of face detections from a frame")
    parser.add_argument("--log-level", type=str, default="INFO",
                        help="Logging level")
    parser.add_argument("--batch", type=int, default=8,
                        help="Device batch size (frames per TPU step)")
    parser.add_argument("--output", type=str, default="output_video.mp4",
                        help="Annotated output video path")
    parser.add_argument("--show", action="store_true",
                        help="Display frames (requires a display)")
    parser.add_argument("--max-frames", type=int, default=0,
                        help="Stop after N frames (0 = all)")
    parser.add_argument("--disagg", type=int, default=0,
                        help="Stage-disaggregated deployment: N devices run "
                             "detection, the rest run embedding+match "
                             "(0 = co-located; needs >=2 JAX devices)")
    return parser.parse_args(argv)


def build_targets(pipeline: FacePipeline, faces_dir: str) -> List[Tuple[np.ndarray, str]]:
    """Gallery bootstrap from a directory of face photos (main.py:78-105)."""
    targets = []
    for filename in sorted(os.listdir(faces_dir)):
        name = os.path.splitext(filename)[0]
        image = cv2.imread(os.path.join(faces_dir, filename))
        if image is None:
            continue
        det, kps = pipeline.detector.detect(image, max_num=1)
        if len(det) == 0:
            logger.warning("No face detected in %s. Skipping...", filename)
            continue
        emb = pipeline.embedder(image, kps[0])
        targets.append((emb / max(np.linalg.norm(emb), 1e-12), name))
    return targets


def annotate_batch(frames: np.ndarray, out, names: List[str], colors) -> None:
    """Draw detections/matches onto frames in place (main.py:132-148)."""
    boxes = np.asarray(out.boxes)
    valid = np.asarray(out.valid)
    sims = np.asarray(out.match_sim)
    match_idx = np.asarray(out.match_idx)
    for bi in range(frames.shape[0]):
        for k in range(boxes.shape[1]):
            if not valid[bi, k]:
                continue
            bbox = boxes[bi, k]
            gi = int(match_idx[bi, k])
            if gi >= 0:
                name = names[gi]
                draw_bbox_info(frames[bi], bbox, similarity=float(sims[bi, k]),
                               name=name, color=colors[name])
            else:
                draw_bbox(frames[bi], bbox, (255, 0, 0))


def run(params: argparse.Namespace) -> dict:
    logging.basicConfig(level=getattr(logging, params.log_level.upper(), None),
                        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    import jax.numpy as jnp

    # When the --det-weight/--rec-weight files exist, run the released
    # graphs directly (graph-driven import); else fall back to the
    # from-scratch Flax variants named by the filename.
    pipeline = FacePipeline(
        det_variant=variant_from_path(params.det_weight, "det_10g"),
        rec_variant=variant_from_path(params.rec_weight, "w600k_r50"),
        det_onnx=params.det_weight if os.path.exists(params.det_weight) else None,
        rec_onnx=params.rec_weight if os.path.exists(params.rec_weight) else None,
        conf_thres=params.confidence_thresh,
        similarity_thresh=params.similarity_thresh,
        dtype=jnp.bfloat16)

    targets = build_targets(pipeline, params.faces_dir)
    if targets:
        pipeline.set_gallery(np.stack([t[0] for t in targets]),
                             [t[1] for t in targets])
    colors = {name: (random.randint(0, 256), random.randint(0, 256),
                     random.randint(0, 256)) for _, name in targets}

    from ..runtime.video import open_capture

    # native ffmpeg decoder for files/streams, cv2 for webcams/fallback
    cap = open_capture(str(params.source))
    if not cap.isOpened():
        raise RuntimeError(f"Could not open video source {params.source!r}")
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    writer = cv2.VideoWriter(params.output, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (width, height))

    from ..runtime.video import BatchedFrameReader

    reader = BatchedFrameReader(cap, batch=params.batch)
    n_frames = 0
    try:
        # tee the reader: process_stream runs one batch ahead (overlapping
        # device compute with the bucketing readback); drawing consumes the
        # same batches in order.
        import itertools

        feed, draw_feed = itertools.tee(iter(reader))
        if getattr(params, "disagg", 0):
            import math

            from ..parallel import DisaggPipeline, split_devices

            det_g, emb_g = split_devices(n_det=params.disagg)
            server = DisaggPipeline(pipeline, det_g, emb_g)
            # both groups need a divisible batch: pad the (final, partial)
            # batch by repeating its last frame, slice outputs back after
            mult = (len(det_g) * len(emb_g)
                    // math.gcd(len(det_g), len(emb_g)))

            def device_feed():
                for b in feed:
                    arr = jnp.asarray(b)
                    pad = (-arr.shape[0]) % mult
                    if pad:
                        arr = jnp.concatenate(
                            [arr, jnp.repeat(arr[-1:], pad, axis=0)])
                    yield arr

            stream = server.process_stream(device_feed(),
                                           max_num=params.max_num)
        else:
            stream = pipeline.process_stream(
                (jnp.asarray(b) for b in feed), max_num=params.max_num)
        for batch, out in zip(draw_feed, stream):
            if out.boxes.shape[0] != len(batch):   # padded disagg batch
                import jax

                out = jax.tree.map(lambda x: x[:len(batch)], out)
            annotate_batch(batch, out, pipeline.names, colors)
            for frame in batch:
                writer.write(frame)
                if params.show:
                    cv2.imshow("Frame", frame)
                    if cv2.waitKey(1) & 0xFF == ord("q"):
                        raise KeyboardInterrupt
            n_frames += len(batch)
            if params.max_frames and n_frames >= params.max_frames:
                break
    except KeyboardInterrupt:
        pass
    finally:
        # close() joins the decode thread; only then is cap.release() safe
        # (the producer may otherwise still be inside cap.read() — a
        # use-after-free for the native ffmpeg reader). On a failed join
        # (producer wedged in a blocking read) leak the capture instead.
        if reader.close():
            cap.release()
        writer.release()
        if params.show:
            cv2.destroyAllWindows()
    return {"frames": n_frames, "targets": len(targets)}


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
