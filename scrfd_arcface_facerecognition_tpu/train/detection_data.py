"""Detection training data + evaluation: WIDER/retinaface annotations,
static-shape batching, and VOC-style AP.

The reference ships no training anything; this completes the SCRFD trainer
(train/scrfd_train.py) into a usable loop: read the standard retinaface
`label.txt` format (the annotation file distributed with WIDER FACE:
`# <image path>` lines followed by one face per line —
`x1 y1 w h [lm0x lm0y v0 ... lm4x lm4y v4 blur]`), letterbox each image to
the training resolution with gt coordinates transformed alongside, pad to
(max_gt) with validity masks, and score detections with AP@0.5.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .. import ops


@dataclasses.dataclass
class Annotation:
    path: str
    boxes: np.ndarray      # (N, 4) x1y1x2y2 pixels
    kps: np.ndarray        # (N, 5, 2) pixels; NaN where unlabeled
    kps_valid: np.ndarray  # (N,) bool — all 5 landmarks labeled


def parse_wider_annotations(label_path: str,
                            images_root: Optional[str] = None
                            ) -> List[Annotation]:
    """Parse the retinaface label.txt format into Annotation records."""
    images_root = images_root or os.path.dirname(os.path.abspath(label_path))
    anns: List[Annotation] = []
    path = None
    boxes: List[List[float]] = []
    kps: List[np.ndarray] = []

    def flush():
        if path is None:
            return
        n = len(boxes)
        b = (np.asarray(boxes, np.float32).reshape(n, 4)
             if n else np.zeros((0, 4), np.float32))
        k = (np.stack(kps) if n else np.zeros((0, 5, 2), np.float32))
        valid = ~np.isnan(k).any(axis=(1, 2)) if n else np.zeros((0,), bool)
        anns.append(Annotation(path=os.path.join(images_root, path),
                               boxes=b, kps=k, kps_valid=valid))

    with open(label_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                flush()
                path = line[1:].strip()
                boxes, kps = [], []
                continue
            vals = [float(v) for v in line.split()]
            x1, y1, w, h = vals[:4]
            boxes.append([x1, y1, x1 + w, y1 + h])
            pts = np.full((5, 2), np.nan, np.float32)
            if len(vals) >= 19:
                lm = np.asarray(vals[4:19], np.float32).reshape(5, 3)
                labeled = lm[:, 2] >= 0          # flag -1 == unlabeled
                pts[labeled] = lm[labeled, :2]
            kps.append(pts)
    flush()
    return anns


def letterbox_example(image: np.ndarray, ann: Annotation,
                      input_size: Tuple[int, int] = (640, 640),
                      max_gt: int = 32):
    """One training example: letterboxed image + transformed, padded gt.

    Returns (canvas, gt_boxes, gt_kps, gt_valid, gt_kps_valid): faces with
    unlabeled landmarks (Annotation.kps_valid False) keep box supervision
    but are masked out of the landmark loss (scrfd_loss gt_kps_valid).

    The letterbox runs HOST-side (numpy matmuls with the same cv2-parity
    interpolation matrices): datasets have thousands of distinct image
    shapes, and a device letterbox would compile a program per shape
    inside the input pipeline.
    """
    from ..ops.resize import _interp_matrix

    h, w = image.shape[:2]
    plan = ops.letterbox_plan((h, w), input_size)
    nh, nw = plan.new_hw
    x = image.astype(np.float32)
    x = np.einsum("oh,hwc->owc", _interp_matrix(nh, h), x)
    x = np.einsum("pw,owc->opc", _interp_matrix(nw, w), x)
    canvas = np.zeros((*input_size, image.shape[2]), np.float32)
    canvas[:nh, :nw] = x
    s = plan.det_scale
    n = min(len(ann.boxes), max_gt)
    gt_boxes = np.zeros((max_gt, 4), np.float32)
    gt_kps = np.zeros((max_gt, 5, 2), np.float32)
    gt_valid = np.zeros((max_gt,), bool)
    gt_kps_valid = np.zeros((max_gt,), bool)
    gt_boxes[:n] = ann.boxes[:n] * s
    gt_kps[:n] = np.nan_to_num(ann.kps[:n], nan=0.0) * s
    gt_valid[:n] = True
    gt_kps_valid[:n] = ann.kps_valid[:n]
    return canvas, gt_boxes, gt_kps, gt_valid, gt_kps_valid


def batches_from_annotations(anns: Sequence[Annotation], batch: int,
                             input_size: Tuple[int, int] = (640, 640),
                             max_gt: int = 32, seed: int = 0,
                             image_loader=None,
                             normalize: bool = True) -> Iterator[Tuple]:
    """ONE shuffled pass of (images, gt_boxes, gt_kps, gt_valid,
    gt_kps_valid) batches (callers loop for epochs, reseeding the shuffle).

    images are SCRFD-normalized f32 by default ((x-127.5)/128, BGR->RGB —
    ops.normalize_image semantics) so batches feed SCRFDTrainer directly.
    The final partial batch pads with empty images (gt_valid all-False) to
    keep the jitted step's batch shape static without dropping tail data.
    """
    if image_loader is None:
        import cv2

        image_loader = cv2.imread
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(anns))
    bufs = ([], [], [], [], [])

    def emit(bufs):
        n = len(bufs[0])
        while len(bufs[0]) < batch:   # pad tail: empty image, no gt
            bufs[0].append(np.zeros_like(bufs[0][0]))
            for b, proto in zip(bufs[1:], (np.zeros((max_gt, 4), np.float32),
                                           np.zeros((max_gt, 5, 2),
                                                    np.float32),
                                           np.zeros((max_gt,), bool),
                                           np.zeros((max_gt,), bool))):
                b.append(proto)
        images = np.stack(bufs[0])
        if normalize:
            # host-side normalize: same (x-127.5)/128 + BGR->RGB semantics
            images = (images[..., ::-1] - 127.5) / 128.0
        return (images.astype(np.float32),) + tuple(
            np.stack(b) for b in bufs[1:])

    for idx in order:
        ann = anns[idx]
        img = image_loader(ann.path)
        if img is None:
            continue
        for buf, val in zip(bufs, letterbox_example(img, ann, input_size,
                                                    max_gt)):
            buf.append(val)
        if len(bufs[0]) == batch:
            yield emit(bufs)
            bufs = ([], [], [], [], [])
    if bufs[0]:
        yield emit(bufs)


# --------------------------------------------------------------------------
# evaluation: VOC-style AP@IoU
# --------------------------------------------------------------------------

def average_precision(pred_boxes: Sequence[np.ndarray],
                      pred_scores: Sequence[np.ndarray],
                      gt_boxes: Sequence[np.ndarray],
                      iou_thresh: float = 0.5) -> float:
    """AP over a dataset: per-image predictions ((Ni,4), (Ni,)) vs gts.

    Standard greedy matching (each gt claims at most one detection,
    score-descending), continuous-interpolation AP (area under the
    precision envelope).
    """
    records = []   # (score, is_tp)
    n_gt = 0
    for pb, ps, gb in zip(pred_boxes, pred_scores, gt_boxes):
        n_gt += len(gb)
        if len(pb) == 0:
            continue
        order = np.argsort(-np.asarray(ps))
        taken = np.zeros(len(gb), bool)
        for i in order:
            if len(gb) == 0:
                records.append((ps[i], False))
                continue
            x1 = np.maximum(pb[i, 0], gb[:, 0])
            y1 = np.maximum(pb[i, 1], gb[:, 1])
            x2 = np.minimum(pb[i, 2], gb[:, 2])
            y2 = np.minimum(pb[i, 3], gb[:, 3])
            inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
            a1 = (pb[i, 2] - pb[i, 0]) * (pb[i, 3] - pb[i, 1])
            a2 = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
            iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
            iou = np.where(taken, -1.0, iou)
            j = int(np.argmax(iou))
            if iou[j] >= iou_thresh:
                taken[j] = True
                records.append((ps[i], True))
            else:
                records.append((ps[i], False))
    if n_gt == 0 or not records:
        return 0.0
    records.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in records])
    fp = np.cumsum([not r[1] for r in records])
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1)
    # precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.where(np.diff(np.concatenate([[0.0], recall])) > 0)[0]
    return float(np.sum(precision[idx]
                        * np.diff(np.concatenate([[0.0], recall]))[idx]))


def evaluate_detector(detector, anns: Sequence[Annotation],
                      image_loader=None, iou_thresh: float = 0.5,
                      conf_thres: float = 0.02) -> Dict[str, float]:
    """Run a Detector over annotated images and report AP@iou."""
    if image_loader is None:
        import cv2

        image_loader = cv2.imread
    pbs, pss, gbs = [], [], []
    old = detector.conf_thres
    detector.conf_thres = conf_thres
    detector._jitted.clear()   # conf_thres is baked into compiled programs
    try:
        for ann in anns:
            img = image_loader(ann.path)
            if img is None:
                continue
            det, _ = detector.detect(img)
            pbs.append(det[:, :4])
            pss.append(det[:, 4])
            gbs.append(ann.boxes)
    finally:
        detector.conf_thres = old
        detector._jitted.clear()
    return {"ap": average_precision(pbs, pss, gbs, iou_thresh),
            "images": len(pbs)}
