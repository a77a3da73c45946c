"""NumPy/cv2 oracle implementations used to parity-test the JAX ops.

These re-derive the reference semantics (documented in SURVEY.md §2/§3 with
file:line citations) independently, in plain NumPy, so each TPU op has a
host-side ground truth: anchor decode, greedy legacy NMS, the Umeyama
similarity fit (SVD form, as in skimage), and the letterbox geometry.
"""
from __future__ import annotations

import numpy as np


def np_distance2bbox(points: np.ndarray, distance: np.ndarray) -> np.ndarray:
    x1 = points[:, 0] - distance[:, 0]
    y1 = points[:, 1] - distance[:, 1]
    x2 = points[:, 0] + distance[:, 2]
    y2 = points[:, 1] + distance[:, 3]
    return np.stack([x1, y1, x2, y2], axis=-1)


def np_distance2kps(points: np.ndarray, distance: np.ndarray) -> np.ndarray:
    cols = []
    for i in range(0, distance.shape[1], 2):
        cols.append(points[:, 0] + distance[:, i])
        cols.append(points[:, 1] + distance[:, i + 1])
    return np.stack(cols, axis=-1)


def np_anchor_centers(height: int, width: int, stride: int, num_anchors: int) -> np.ndarray:
    grid = np.stack(np.mgrid[:height, :width][::-1], axis=-1).astype(np.float32)
    centers = (grid * stride).reshape((-1, 2))
    if num_anchors > 1:
        centers = np.stack([centers] * num_anchors, axis=1).reshape((-1, 2))
    return centers


def np_nms_keep(dets: np.ndarray, iou_thres: float) -> list:
    """Greedy NMS with legacy +1 offsets over score-sorted dets (K, 5)."""
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
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[np.where(iou <= iou_thres)[0] + 1]
    return keep


def np_umeyama(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Umeyama least-squares similarity (SVD form, skimage semantics).

    Returns the (2, 3) matrix mapping src -> dst with rotation constrained
    to det=+1 (scale estimated). Independent of the closed-form used on TPU.
    """
    src = src.astype(np.float64)
    dst = dst.astype(np.float64)
    n, dim = src.shape
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    a_cov = dc.T @ sc / n
    d = np.ones(dim)
    if np.linalg.det(a_cov) < 0:
        d[dim - 1] = -1
    u, s, vt = np.linalg.svd(a_cov)
    rot = u @ np.diag(d) @ vt
    var_s = sc.var(axis=0).sum()
    scale = (s @ d) / var_s
    t = mu_d - scale * rot @ mu_s
    m = np.zeros((2, 3))
    m[:, :2] = scale * rot
    m[:, 2] = t
    return m


def np_letterbox_geometry(frame_hw, model_hw=(640, 640)):
    fh, fw = frame_hw
    mh, mw = model_hw
    im_ratio = fh / fw
    model_ratio = mh / mw
    if im_ratio > model_ratio:
        new_h = mh
        new_w = int(new_h / im_ratio)
    else:
        new_w = mw
        new_h = int(new_w * im_ratio)
    return new_h, new_w, float(new_h) / fh
