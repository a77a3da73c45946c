"""Reference-faithful numpy/cv2 pipeline oracle for end-to-end parity.

Replicates the reference's COMPLETE inference path step for step —
letterbox (/root/reference/models/scrfd.py:125-138), blobFromImage
normalize (:76-82), per-stride anchor decode + threshold (:85-120),
score-sorted greedy NMS (:142-156, :180-207), max_num selection
(:159-177), 5-point umeyama alignment + cv2.warpAffine
(/root/reference/utils/helpers.py:18-59), ArcFace blob + forward
(/root/reference/models/arcface.py:39-57) — over an arbitrary `forward`
callback (a torch stand-in, an ordered-importer Flax model, or any other
independent compute path). tools/verify_release.py compares FacePipeline
against this replica on real JPEGs for the release sign-off.
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2

# insightface arcface 5-point template (utils/helpers.py:6-15)
REFERENCE_ALIGNMENT = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], dtype=np.float32)


def letterbox(image: np.ndarray, size_hw=(640, 640)):
    """Aspect-preserving resize + zero-pad (scrfd.py:125-138). Returns
    (canvas u8, det_scale)."""
    import cv2

    height, width = size_hw
    im_ratio = float(image.shape[0]) / image.shape[1]
    model_ratio = height / width
    if im_ratio > model_ratio:
        new_height = height
        new_width = int(new_height / im_ratio)
    else:
        new_width = width
        new_height = int(new_width * im_ratio)
    det_scale = float(new_height) / image.shape[0]
    resized = cv2.resize(image, (new_width, new_height))
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    canvas[:new_height, :new_width, :] = resized
    return canvas, det_scale


def det_blob(canvas_bgr_u8: np.ndarray) -> np.ndarray:
    """cv2.dnn.blobFromImage semantics for SCRFD (scrfd.py:76-82):
    (x - 127.5)/128, BGR->RGB, HWC->CHW, add batch."""
    x = canvas_bgr_u8[..., ::-1].astype(np.float32)
    return ((x - 127.5) / 128.0).transpose(2, 0, 1)[None]


def rec_blob(crops_bgr_u8: List[np.ndarray]) -> np.ndarray:
    """cv2.dnn.blobFromImages for ArcFace (arcface.py:44-50):
    (x - 127.5)/127.5, BGR->RGB, NCHW."""
    x = np.stack(crops_bgr_u8)[..., ::-1].astype(np.float32)
    return ((x - 127.5) / 127.5).transpose(0, 3, 1, 2)


def np_distance2bbox(points, distance):
    x1 = points[:, 0] - distance[:, 0]
    y1 = points[:, 1] - distance[:, 1]
    x2 = points[:, 0] + distance[:, 2]
    y2 = points[:, 1] + distance[:, 3]
    return np.stack([x1, y1, x2, y2], axis=-1)


def np_distance2kps(points, distance):
    preds = []
    for i in range(0, distance.shape[1], 2):
        px = points[:, i % 2] + distance[:, i]
        py = points[:, i % 2 + 1] + distance[:, i + 1]
        preds.append(px)
        preds.append(py)
    return np.stack(preds, axis=-1)


def pairwise_iou_legacy(dets: np.ndarray) -> np.ndarray:
    """(N, >=4) boxes -> (N, N) pairwise IoU with the reference's +1 pixel
    offset (scrfd.py:185-198). The ONE definition of this convention:
    greedy_nms below inlines the same formula row-by-row to mirror the
    reference loop line-for-line, and tools/verify_release.py's IoU-gap
    probe uses this matrix — both must track the same offset convention."""
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = np.maximum(x1[:, None], x1[None, :])
    yy1 = np.maximum(y1[:, None], y1[None, :])
    xx2 = np.minimum(x2[:, None], x2[None, :])
    yy2 = np.minimum(y2[:, None], y2[None, :])
    inter = (np.maximum(0.0, xx2 - xx1 + 1)
             * np.maximum(0.0, yy2 - yy1 + 1))
    return inter / (areas[:, None] + areas[None, :] - inter)


def greedy_nms(dets: np.ndarray, iou_thres: float) -> List[int]:
    """The reference's O(N^2) +1-offset IoU NMS (scrfd.py:180-207)."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[np.where(ovr <= iou_thres)[0] + 1]
    return keep


def estimate_norm(landmark: np.ndarray, image_size: int = 112) -> np.ndarray:
    """Umeyama similarity fit to the arcface template (helpers.py:18-53).

    skimage's SimilarityTransform.estimate IS the Umeyama SVD solution;
    this environment has no skimage, so the equivalent SVD form from
    tests/oracles.py (independently verified against the TPU closed form)
    stands in."""
    from oracles import np_umeyama

    assert landmark.shape == (5, 2)
    alignment = (REFERENCE_ALIGNMENT if image_size == 112
                 else REFERENCE_ALIGNMENT * (image_size / 112.0))
    return np_umeyama(landmark.astype(np.float64), alignment)


def norm_crop(image: np.ndarray, landmark: np.ndarray,
              image_size: int = 112) -> np.ndarray:
    import cv2

    m = estimate_norm(landmark, image_size)
    return cv2.warpAffine(image, m, (image_size, image_size), borderValue=0.0)


class OracleStack:
    """The reference pipeline over abstract forward callbacks.

    det_forward(blob (1,3,H,W) f32) -> list of 9 arrays
        [score x3, bbox x3, kps x3], each (1, H/s*W/s*2, C).
    rec_forward(blob (N,3,112,112) f32) -> (N, 512).
    """

    def __init__(self, det_forward: Callable, rec_forward: Callable,
                 input_size: Tuple[int, int] = (640, 640),
                 conf_thres: float = 0.5, iou_thres: float = 0.4):
        self.det_forward = det_forward
        self.rec_forward = rec_forward
        self.input_size = input_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        # raw detector outputs are threshold-independent; the sign-off
        # probes each image three times (threshold pick, IoU pick, the
        # comparison itself), so memoize per image object. Keyed by id():
        # callers hold the image list alive for the whole run.
        self._raw_cache: dict = {}

    def _raw(self, image_bgr: np.ndarray):
        key = id(image_bgr)
        hit = self._raw_cache.get(key)
        if hit is None:
            canvas, det_scale = letterbox(image_bgr, self.input_size)
            outs = [np.asarray(o) for o in self.det_forward(det_blob(canvas))]
            if len(self._raw_cache) >= 64:      # bound: sign-off-scale sets
                self._raw_cache.clear()
            hit = self._raw_cache[key] = (outs, det_scale)
        return hit

    def raw_outputs(self, image_bgr: np.ndarray) -> List[np.ndarray]:
        return self._raw(image_bgr)[0]

    def candidates(self, image_bgr: np.ndarray) -> np.ndarray:
        """Score-sorted pre-NMS candidates (N, 5) in original coords —
        exposes the NMS input so callers can probe the IoU distribution."""
        det, _, _ = self._decode(image_bgr)
        return det

    def _decode(self, image_bgr: np.ndarray):
        """Score-sorted pre-NMS (det (N,5), kps (N,5,2)) in original
        coordinates (scrfd.py:122-156 before the NMS call)."""
        height, width = self.input_size
        outputs, det_scale = self._raw(image_bgr)

        scores_list, bboxes_list, kpss_list = [], [], []
        for idx, stride in enumerate(STRIDES):
            scores = outputs[idx][0].ravel()
            bbox_preds = outputs[idx + 3][0] * stride
            kps_preds = outputs[idx + 6][0] * stride
            h, w = height // stride, width // stride
            centers = np.stack(
                np.mgrid[:h, :w][::-1], axis=-1).astype(np.float32)
            centers = (centers * stride).reshape(-1, 2)
            centers = np.stack([centers] * NUM_ANCHORS, axis=1).reshape(-1, 2)
            pos = np.where(scores >= self.conf_thres)[0]
            bboxes = np_distance2bbox(centers, bbox_preds)
            kpss = np_distance2kps(centers, kps_preds).reshape(
                len(centers), -1, 2)
            scores_list.append(scores[pos])
            bboxes_list.append(bboxes[pos])
            kpss_list.append(kpss[pos])

        scores = np.concatenate(scores_list)
        order = scores.argsort()[::-1]
        bboxes = np.vstack(bboxes_list) / det_scale
        kpss = np.vstack(kpss_list) / det_scale
        pre_det = np.hstack(
            [bboxes, scores[:, None]]).astype(np.float32)[order]
        return pre_det, kpss[order], det_scale

    def detect(self, image_bgr: np.ndarray, max_num: int = 0,
               metric: str = "max"):
        """(det (N,5), kps (N,5,2)) in original-image coordinates,
        replicating scrfd.py:122-178 exactly."""
        pre_det, kpss, _ = self._decode(image_bgr)
        keep = greedy_nms(pre_det, self.iou_thres)
        det = pre_det[keep]
        kpss = kpss[keep]

        if 0 < max_num < det.shape[0]:
            area = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
            cy, cx = image_bgr.shape[0] // 2, image_bgr.shape[1] // 2
            off = np.vstack([(det[:, 0] + det[:, 2]) / 2 - cx,
                             (det[:, 1] + det[:, 3]) / 2 - cy])
            dist2 = np.sum(off ** 2, axis=0)
            values = area if metric == "max" else area - dist2 * 2.0
            bindex = np.argsort(values)[::-1][:max_num]
            det, kpss = det[bindex], kpss[bindex]
        return det, kpss

    def embed(self, image_bgr: np.ndarray, kps: np.ndarray) -> np.ndarray:
        """Aligned-crop 512-d embedding (arcface.py:54-57), unnormalized."""
        crop = norm_crop(image_bgr, kps.astype(np.float32))
        return np.asarray(self.rec_forward(rec_blob([crop])))[0]

    def process(self, image_bgr: np.ndarray, max_num: int = 0,
                metric: str = "max"):
        """Full detect -> align -> embed; embeddings L2-normalized.
        Returns (det (N,5), kps (N,5,2), emb (N,512))."""
        det, kpss = self.detect(image_bgr, max_num=max_num, metric=metric)
        embs = []
        for i in range(len(det)):
            e = self.embed(image_bgr, kpss[i])
            embs.append(e / max(float(np.linalg.norm(e)), 1e-12))
        emb = (np.stack(embs) if embs
               else np.zeros((0, 512), np.float32))
        return det, kpss, emb


def torch_det_forward(model):
    """Wrap a torch SCRFD stand-in as a det_forward callback."""
    import torch

    def fwd(blob):
        with torch.no_grad():
            return [t.numpy() for t in model(torch.tensor(blob))]
    return fwd


def torch_rec_forward(model):
    import torch

    def fwd(blob):
        with torch.no_grad():
            return model(torch.tensor(blob)).numpy()
    return fwd


def flax_det_forward(model, variables):
    """Wrap an ordered-importer Flax SCRFD as a det_forward callback
    (independent compute path for real-file cross-checks).

    Runs under default_matmul_precision('float32'): TPU executes f32
    convs at bf16 precision by default, which would put ~1e-2 of
    backend noise into a comparison whose whole point is exactness."""
    import jax
    import jax.numpy as jnp

    def fwd(blob):
        x = jnp.asarray(blob.transpose(0, 2, 3, 1))
        with jax.default_matmul_precision("float32"):
            out = model.apply(variables, x)
        return [np.asarray(t)
                for t in out["scores"] + out["bboxes"] + out["kps"]]
    return fwd


def flax_rec_forward(model, variables):
    import jax
    import jax.numpy as jnp

    def fwd(blob):
        with jax.default_matmul_precision("float32"):
            out = model.apply(
                variables, jnp.asarray(blob.transpose(0, 2, 3, 1)))
        return np.asarray(out)
    return fwd
