"""Deterministic fake FaceAnalysis + image loader for app-logic tests.

Identity is encoded in the image's [0,0] pixel blue channel; the fake
embedder returns a fixed unit vector per identity (with tiny per-image
jitter), so clustering decisions are fully controllable without models.
"""
from __future__ import annotations

import numpy as np

from scrfd_arcface_facerecognition_tpu.apps.face_analysis import (
    Face, FaceAnalysis)

EMB_DIM = 512


def make_image(identity: int, h: int = 240, w: int = 320, jitter: int = 0):
    img = np.full((h, w, 3), 128, np.uint8)
    # markers live in all 3 channels so BGR<->RGB conversion preserves them
    img[0, 0, :] = identity
    img[0, 1, :] = jitter
    return img


def identity_embedding(identity: int, jitter: int = 0) -> np.ndarray:
    rng = np.random.default_rng(1000 + identity)
    v = rng.normal(size=EMB_DIM).astype(np.float32)
    if jitter:
        # scale 0.03 -> cos ~0.83 vs the base identity: above the grouping
        # thresholds (0.45/0.55), below the 0.95 duplicate threshold.
        jr = np.random.default_rng(5000 + jitter)
        v = v / np.linalg.norm(v)
        v = v + jr.normal(scale=0.03, size=EMB_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


class FakeFaceAnalysis:
    """FaceAnalysis-shaped: .get / .get_batch / .prepare."""

    def __init__(self, det_score: float = 0.9, bbox=(100, 100, 200, 230),
                 no_face_identities=()):
        self.det_score = det_score
        self.bbox = np.asarray(bbox, np.float32)
        self.no_face_identities = set(no_face_identities)
        self.batch_calls = 0
        self._microbatcher = None

    def prepare(self, ctx_id=0, det_size=(640, 640), det_thresh=0.5):
        pass

    def _faces_for(self, image):
        identity = int(image[0, 0, 0])
        jitter = int(image[0, 1, 0])
        if identity in self.no_face_identities:
            return []
        emb = identity_embedding(identity, jitter)
        x1, y1, x2, y2 = self.bbox
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        kps = np.asarray([[cx - 30, cy - 30], [cx + 30, cy - 30], [cx, cy],
                          [cx - 30, cy + 30], [cx + 30, cy + 30]], np.float32)
        return [Face(bbox=self.bbox.copy(), kps=kps,
                     det_score=self.det_score, embedding=emb * 10.0,
                     normed_embedding=emb)]

    def get(self, image, max_num: int = 0):
        return self.get_batch([np.asarray(image)], max_num=max_num)[0]

    # the REAL routing layer (request-sized lists coalesce through the
    # MicroBatcher once enable_microbatch is called, e.g. via the
    # serving.microbatch config key) over the fake compute — so the
    # serving-path wiring is testable offline
    get_batch = FaceAnalysis.get_batch
    enable_microbatch = FaceAnalysis.enable_microbatch
    disable_microbatch = FaceAnalysis.disable_microbatch
    MIN_STATIC_GROUP = FaceAnalysis.MIN_STATIC_GROUP

    def _get_batch_direct(self, images, max_num: int = 0):
        self.batch_calls += 1
        return [self._faces_for(np.asarray(im)) for im in images]


class FakeImageStore:
    """URL -> image mapping; loader signature matches default_image_loader."""

    def __init__(self):
        self.images = {}

    def add(self, url: str, identity: int, jitter: int = 0):
        self.images[url] = make_image(identity, jitter=jitter)
        return url

    def loader(self, source, save_path=None, timeout=30):
        img = self.images.get(source)
        if img is not None and save_path:
            import cv2

            cv2.imwrite(save_path, img)
        return None if img is None else img.copy()


def visit(i: int, url: str, customer: str = None, entry_time: str = None,
          box=None, **extra):
    v = {"id": i, "image": url,
         "customerId": customer or f"cust_{i}",
         "entryTime": entry_time or f"2025-01-0{1 + i % 9}T10:00:00",
         "branchId": "branch-1", "entryEventIds": []}
    if box is not None:
        v["entryEventIds"] = [{"box": box, "event": "entry",
                               "fileName": f"f{i}.jpg", "camera": "cam1"}]
    v.update(extra)
    return v
