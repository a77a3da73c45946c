"""FaceAnalysis-shaped facade over the TPU stack.

The reference's clustering/verification engines consume insightface's
FaceAnalysis('buffalo_l') (smart_face_recognition.py:353-359, 912-913,
1473-1496): app.get(image) -> [Face{bbox, kps, det_score, embedding,
normed_embedding}]. This module provides the same surface backed by the
fused TPU pipeline, so every higher layer is stack-agnostic (SURVEY.md
§2.2). Images of repeated shapes reuse one compiled program; .get_batch
embeds a whole image batch in one device call.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .. import ops
from ..pipeline import Detector, Embedder


def _next_pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class Face:
    bbox: np.ndarray            # (4,) x1y1x2y2
    kps: np.ndarray             # (5, 2)
    det_score: float
    embedding: np.ndarray       # (512,) raw
    normed_embedding: np.ndarray  # (512,) L2-normalized

    @property
    def sex(self):  # genderage models intentionally unsupported (unused
        return None  # by the reference pipelines, SURVEY.md §0)


class FaceAnalysis:
    """Drop-in facade: FaceAnalysis(name=...) / prepare / get."""

    def __init__(self, name: str = "buffalo_l",
                 det_variant: str = "det_10g", rec_variant: str = "w600k_r50",
                 det_variables: Any = None, rec_variables: Any = None,
                 dtype: Any = None, seed: int = 0, max_det: int = 16,
                 chunk: int = 16, det_onnx: Optional[str] = None,
                 rec_onnx: Optional[str] = None,
                 pipeline_kwargs: Optional[dict] = None):
        if dtype is None:
            # bf16 compute on TPU (params stay f32), f32 elsewhere
            import jax

            dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                     else jnp.float32)
        self.name = name
        self.chunk = chunk  # images per device batch (bounds HBM: the dense
        # embed path materializes batch*max_det 112x112 crops at once)
        # det_onnx/rec_onnx: run released .onnx bytes through the graph
        # executor — the analog of insightface loading the buffalo_l files
        # (smart_face_recognition.py:353-359)
        self.detector = Detector(det_variant, variables=det_variables,
                                 dtype=dtype, seed=seed, max_det=max_det,
                                 onnx_path=det_onnx)
        self.embedder = Embedder(rec_variant, variables=rec_variables,
                                 dtype=dtype, seed=seed, onnx_path=rec_onnx)
        self.det_thresh = 0.5
        # Internal pipeline reuse: the bucketed embed path (pallas warp on
        # TPU, real-face-count bucketing) — gallery stays empty, match
        # outputs are ignored.
        from .. import pipeline as _pl

        self._pipe = _pl.FacePipeline(detector=self.detector,
                                      embedder=self.embedder,
                                      gallery_capacity=8, max_det=max_det,
                                      **(pipeline_kwargs or {}))
        self._microbatcher = None

    def enable_microbatch(self, max_batch: int = 32,
                          max_wait_ms: float = 4.0):
        """Coalesce concurrent get() calls (e.g. web request threads) into
        shared device batches (runtime/microbatch.MicroBatcher): one
        16-wide detect+embed program costs barely more than a 1-wide one,
        so N concurrent single-image requests should share a batch instead
        of issuing N batch-1 programs. get_batch() already shape-buckets,
        so mixed request shapes are fine. Returns the batcher (stats:
        n_items/n_batches/max_batch_seen)."""
        from ..runtime.microbatch import MicroBatcher

        if self._microbatcher is not None:
            mb = self._microbatcher
            # compare the constructor-original max_wait_ms (stored on the
            # batcher), not max_wait_s*1000 — float round-trips and the
            # ctor's negative-ms clamp made same-args re-enables raise
            if (mb.max_batch, mb.max_wait_ms) != (max_batch,
                                                  float(max_wait_ms)):
                # silently returning the old batcher would make the new
                # settings never take effect
                raise ValueError(
                    "microbatch already enabled with different parameters "
                    "— disable_microbatch() first to retune")
            return mb
        self._microbatcher = MicroBatcher(
            lambda imgs, max_num=0: self._get_batch_direct(
                imgs, max_num=max_num),
            max_batch=max_batch, max_wait_ms=max_wait_ms)
        return self._microbatcher

    def disable_microbatch(self) -> None:
        if self._microbatcher is not None:
            self._microbatcher.close()
            self._microbatcher = None

    def prepare(self, ctx_id: int = 0, det_size: Tuple[int, int] = (640, 640),
                det_thresh: float = 0.5) -> None:
        """API mirror of insightface prepare(); ctx_id is accepted for
        compatibility (device placement is JAX's job)."""
        self.detector.input_size = (det_size[1], det_size[0])
        self.detector.conf_thres = det_thresh
        self.det_thresh = det_thresh
        # all traffic here goes through the internal pipeline, whose jit
        # cache baked the OLD threshold/canvas into its closures
        self.detector._jitted.clear()
        self._pipe._jitted.clear()

    def get(self, image, max_num: int = 0) -> List[Face]:
        """Detect + align + embed every face in one BGR image. With
        enable_microbatch(), concurrent calls from different threads
        coalesce into shared device batches (the routing lives in
        get_batch)."""
        return self.get_batch([np.asarray(image)], max_num=max_num)[0]

    # shape-groups at least this large run the static per-shape program
    # (video / repeated-shape workloads); smaller groups merge into padded
    # buckets served by ONE dynamic program per bucket shape, with the
    # letterbox geometry passed as data — exact-shape numerics either way.
    MIN_STATIC_GROUP = 8
    BUCKET = 256

    def get_batch(self, images, max_num: int = 0) -> List[List[Face]]:
        """Batch version: images of identical shape run as ONE device batch
        (detect + embed fused); mixed shapes merge into shape buckets served
        by the dynamic-letterbox program (numerically identical to
        exact-shape processing — ops.letterbox_matrices).

        With enable_microbatch(), REQUEST-sized lists (smaller than
        MIN_STATIC_GROUP) route item-wise through the shared collector so
        concurrent web requests — each a 1-2 image get/get_batch call on
        its own server thread — coalesce into one device batch
        (runtime/microbatch.py; the serving shape that motivates it is
        the reference's per-request app.get,
        smart_face_recognition.py:912-913). submit_async lands ALL of one
        caller's images in the same batch window, so a compare request
        pays one max_wait, not two. Large lists are already efficient
        batches and go direct."""
        mb = self._microbatcher
        if mb is not None and 0 < len(images) < self.MIN_STATIC_GROUP:
            import threading as _th

            from ..runtime.microbatch import MicroBatcherClosed

            # the collector thread itself must never re-enter the batcher
            if _th.current_thread() is not mb._thread:
                try:
                    futs = [mb.submit_async(np.asarray(im),
                                            key=("max_num", max_num),
                                            key_kwargs={"max_num": max_num})
                            for im in images]
                    return [f.result() for f in futs]
                except MicroBatcherClosed:
                    pass   # disable_microbatch() raced us: direct path
        return self._get_batch_direct(images, max_num=max_num)

    def _get_batch_direct(self, images, max_num: int = 0
                          ) -> List[List[Face]]:
        images = [np.asarray(im) for im in images]
        out: List[Optional[List[Face]]] = [None] * len(images)
        by_shape = {}
        for i, im in enumerate(images):
            by_shape.setdefault(im.shape, []).append(i)

        static_chunks, dyn_by_bucket = [], {}
        for shape, idxs in by_shape.items():
            # large same-shape groups (video) take the per-shape static
            # program; everything else merges into padded buckets so a
            # stream of one-off shapes compiles a handful of bucket
            # programs, not one 30-60 s remote compile per shape
            if len(idxs) >= self.MIN_STATIC_GROUP:
                for c in range(0, len(idxs), self.chunk):
                    static_chunks.append(idxs[c:c + self.chunk])
            else:
                b = self.BUCKET
                bh = -(-shape[0] // b) * b
                bw = -(-shape[1] // b) * b
                dyn_by_bucket.setdefault((bh, bw), []).extend(idxs)

        def pow2_batch(idxs):
            """Stack a chunk, zero-padding the batch dim to the next power
            of two: arbitrary trailing-chunk sizes would each compile a
            fresh program (30-60 s on a remote-compiler TPU); power-of-2
            sizes bound the compile count at <=2x padded compute."""
            first = images[idxs[0]]
            batch = np.zeros((_next_pow2(len(idxs)), *first.shape),
                             first.dtype)
            for bi, i in enumerate(idxs):
                batch[bi] = images[i]
            return jnp.asarray(batch)

        if len(static_chunks) > 1:
            # stream the chunks: detect for chunk i+1 dispatches before
            # chunk i's bucketing readback, hiding the device->host RTT
            # (FacePipeline.process_stream; chunks may differ in shape)
            batches = (pow2_batch(idxs) for idxs in static_chunks)
            for idxs, res in zip(static_chunks,
                                 self._pipe.process_stream(
                                     batches, max_num=max_num)):
                self._scatter_faces(res, idxs, out)
        else:
            for idxs in static_chunks:
                res = self._pipe(pow2_batch(idxs), max_num=max_num)
                self._scatter_faces(res, idxs, out)

        model_hw = self.detector.input_size
        for (bh, bw), idxs in dyn_by_bucket.items():
            # matrices are (B, 640, bh)+(B, 640, bw) f32 — chunk smaller
            # than the static path to bound their HBM footprint
            step = max(1, min(self.chunk, 8))
            for c in range(0, len(idxs), step):
                part = idxs[c:c + step]
                b = _next_pow2(len(part))  # bounded compile count
                frames = np.zeros((b, bh, bw, 3), np.uint8)
                wys = np.zeros((b, model_hw[0], bh), np.float32)
                wxs = np.zeros((b, model_hw[1], bw), np.float32)
                scales = np.ones((b,), np.float32)
                hws = np.full((b, 2), (bh, bw), np.int32)
                for bi, i in enumerate(part):
                    im = images[i]
                    h, w = im.shape[:2]
                    frames[bi, :h, :w] = im
                    wy, wx, s = ops.letterbox_matrices((h, w), (bh, bw),
                                                       model_hw)
                    wys[bi] = wy
                    wxs[bi] = wx
                    scales[bi] = s
                    hws[bi] = (h, w)
                res = self._pipe.call_dynamic(
                    frames, wys, wxs, scales, hws, max_num=max_num)
                self._scatter_faces(res, part, out)
        return out  # type: ignore[return-value]

    def _scatter_faces(self, res, idxs, out) -> None:
        boxes = np.asarray(res.boxes)
        scores = np.asarray(res.scores)
        kps = np.asarray(res.kps)
        valid = np.asarray(res.valid)
        embs = np.asarray(res.embeddings)  # L2-normalized
        for bi, i in enumerate(idxs):
            faces = []
            for k in range(boxes.shape[1]):
                if not valid[bi, k]:
                    continue
                norm = embs[bi, k]
                # raw embedding == normed up to scale; every consumer of
                # `.embedding` uses scale-invariant cosine
                # (compare_face_from_api.py:157-171)
                faces.append(Face(bbox=boxes[bi, k], kps=kps[bi, k],
                                  det_score=float(scores[bi, k]),
                                  embedding=norm, normed_embedding=norm))
            out[i] = faces
