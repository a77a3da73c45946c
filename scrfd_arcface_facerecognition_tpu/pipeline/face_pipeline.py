"""The fused end-to-end program: frames -> detections + embeddings + matches.

This is the north-star path (BASELINE.json): a single jax.jit program per
(batch, frame-shape) covering letterbox -> SCRFD -> decode -> NMS -> umeyama
-> warp -> ArcFace -> L2 -> cosine-vs-gallery, with no host round-trips
between stages. Replaces the reference's per-frame ONNX sessions + numpy NMS
+ Python target scan (main.py:108-150).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from .detector import Detector, Detections, detect_batch
from .embedder import Embedder, embed_faces


class PipelineOutput(NamedTuple):
    """Per-frame padded results; all arrays live on device.

    boxes: (B, K, 4); scores: (B, K); kps: (B, K, 5, 2); valid: (B, K);
    count: (B,); embeddings: (B, K, 512) L2-normalized;
    match_idx: (B, K) best gallery row (-1 if below threshold or invalid);
    match_sim: (B, K) best cosine similarity (0 where invalid).
    """
    boxes: jnp.ndarray
    scores: jnp.ndarray
    kps: jnp.ndarray
    valid: jnp.ndarray
    count: jnp.ndarray
    embeddings: jnp.ndarray
    match_idx: jnp.ndarray
    match_sim: jnp.ndarray


def e2e_forward(det_apply, det_vars, emb_apply, emb_vars, frames, gallery,
                gallery_valid, *, plan, conf_thres, iou_thres, pre_nms,
                max_det, max_num, metric, similarity_thresh):
    """Jit-traceable fused forward. gallery: (G, 512) L2-normalized rows."""
    det = detect_batch(det_apply, det_vars, frames, plan=plan,
                       conf_thres=conf_thres, iou_thres=iou_thres,
                       pre_nms=pre_nms, max_det=max_det, max_num=max_num,
                       metric=metric)
    emb = embed_faces(emb_apply, emb_vars, frames, det.kps, det.valid)

    b, k, d = emb.shape
    sims = jnp.einsum("bkd,gd->bkg", emb, gallery,
                      precision=jax.lax.Precision.HIGHEST)      # (B, K, G)
    sims = jnp.where(gallery_valid[None, None, :], sims, -jnp.inf)
    best_sim = jnp.max(sims, axis=-1)
    best_idx = jnp.argmax(sims, axis=-1)
    matched = det.valid & (best_sim > similarity_thresh)
    best_idx = jnp.where(matched, best_idx, -1)
    best_sim = jnp.where(det.valid, jnp.maximum(best_sim, 0.0), 0.0)
    best_sim = jnp.where(jnp.isfinite(best_sim), best_sim, 0.0)
    return PipelineOutput(boxes=det.boxes, scores=det.scores, kps=det.kps,
                          valid=det.valid, count=det.count, embeddings=emb,
                          match_idx=best_idx, match_sim=best_sim)


class FacePipeline:
    """Detector + Embedder + gallery, fused.

    >>> pipe = FacePipeline(det_variant="det_10g", rec_variant="w600k_r50")
    >>> pipe.set_gallery(embs, names)
    >>> out = pipe(frames_u8)           # (B, H, W, 3) BGR batch
    """

    def __init__(self, detector: Optional[Detector] = None,
                 embedder: Optional[Embedder] = None,
                 det_variant: str = "det_10g", rec_variant: str = "w600k_r50",
                 conf_thres: float = 0.5, iou_thres: float = 0.4,
                 similarity_thresh: float = 0.4,
                 pre_nms: int = 256, max_det: int = 16,
                 gallery_capacity: int = 512,
                 dtype: Any = jnp.float32, seed: int = 0):
        self.detector = detector or Detector(
            det_variant, conf_thres=conf_thres, iou_thres=iou_thres,
            pre_nms=pre_nms, max_det=max_det, dtype=dtype, seed=seed)
        self.embedder = embedder or Embedder(rec_variant, dtype=dtype, seed=seed)
        self.similarity_thresh = similarity_thresh
        self.pre_nms = pre_nms
        self.max_det = max_det
        self.gallery_capacity = gallery_capacity
        self.names: list = []
        self._gallery = jnp.zeros((gallery_capacity, 512), jnp.float32)
        self._gallery_valid = jnp.zeros((gallery_capacity,), bool)
        self._jitted = {}

    # ------------------------------------------------------------- gallery

    def set_gallery(self, embeddings, names) -> None:
        """Install target embeddings (rows are L2-normalized on device).

        Zero-pads to the static gallery capacity so gallery growth up to
        capacity never triggers recompilation.
        """
        embs = np.asarray(embeddings, dtype=np.float32).reshape(-1, 512)
        g = len(embs)
        if g > self.gallery_capacity:
            raise ValueError(f"gallery ({g}) exceeds capacity "
                             f"({self.gallery_capacity})")
        if len(names) != g:
            raise ValueError("names/embeddings length mismatch")
        buf = np.zeros((self.gallery_capacity, 512), np.float32)
        buf[:g] = embs
        valid = np.zeros((self.gallery_capacity,), bool)
        valid[:g] = True
        self._gallery = ops.l2_normalize(jnp.asarray(buf))
        self._gallery_valid = jnp.asarray(valid)
        self.names = list(names)

    # ------------------------------------------------------------- forward

    def _fn(self, frame_hw: Tuple[int, int], max_num: int, metric: str):
        key = (frame_hw, max_num, metric)
        if key not in self._jitted:
            plan = ops.letterbox_plan(frame_hw, self.detector.input_size)
            det_apply = self.detector.model.apply
            emb_apply = self.embedder.model.apply

            def wrapped(det_vars, emb_vars, frames, gallery, gallery_valid):
                return e2e_forward(
                    det_apply, det_vars, emb_apply, emb_vars, frames,
                    gallery, gallery_valid,
                    plan=plan, conf_thres=self.detector.conf_thres,
                    iou_thres=self.detector.iou_thres, pre_nms=self.pre_nms,
                    max_det=self.max_det, max_num=max_num, metric=metric,
                    similarity_thresh=self.similarity_thresh)

            self._jitted[key] = jax.jit(wrapped)
        return self._jitted[key]

    def __call__(self, frames, max_num: int = 0,
                 metric: str = "max") -> PipelineOutput:
        frames = jnp.asarray(np.asarray(frames))
        if frames.ndim == 3:
            frames = frames[None]
        fn = self._fn(tuple(frames.shape[1:3]), max_num, metric)
        return fn(self.detector.variables, self.embedder.variables, frames,
                  self._gallery, self._gallery_valid)

    def match_names(self, out: PipelineOutput):
        """Host-side: map match_idx -> names ('Unknown' below threshold)."""
        idx = np.asarray(out.match_idx)
        return [
            [self.names[j] if j >= 0 else "Unknown" for j in row]
            for row in idx
        ]

    def build_targets_from_images(self, images, names) -> None:
        """Gallery construction from face photos (main.py:78-105 semantics):
        detect the single most prominent face per image, embed, install."""
        embs, kept = [], []
        for img, name in zip(images, names):
            det, kps = self.detector.detect(img, max_num=1)
            if len(det) == 0:
                continue
            emb = self.embedder(img, kps[0])
            embs.append(emb / max(np.linalg.norm(emb), 1e-12))
            kept.append(name)
        if embs:
            self.set_gallery(np.stack(embs), kept)
