"""The fused end-to-end program: frames -> detections + embeddings + matches.

This is the north-star path (BASELINE.json): a single jax.jit program per
(batch, frame-shape) covering letterbox -> SCRFD -> decode -> NMS -> umeyama
-> warp -> ArcFace -> L2 -> cosine-vs-gallery, with no host round-trips
between stages. Replaces the reference's per-frame ONNX sessions + numpy NMS
+ Python target scan (main.py:108-150).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from .detector import Detector, Detections, detect_batch
from .embedder import Embedder, embed_faces, embed_crops


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


def _match_gallery(emb_flat, gallery, gallery_valid, valid_flat,
                   similarity_thresh):
    """Gallery cosine match (the ONE definition — three call sites):
    (F, D) L2 embeddings -> (best_idx (F,) int32 with -1 for invalid or
    below-threshold slots, best_sim (F,) clamped to [0, inf) and zeroed on
    invalid slots / empty galleries)."""
    sims = jnp.dot(emb_flat, gallery.T,
                   precision=jax.lax.Precision.HIGHEST)          # (F, G)
    sims = jnp.where(gallery_valid[None, :], sims, -jnp.inf)
    best_sim = jnp.max(sims, axis=-1)
    best_idx = jnp.argmax(sims, axis=-1)
    matched = valid_flat & (best_sim > similarity_thresh)
    best_idx = jnp.where(matched, best_idx, -1).astype(jnp.int32)
    best_sim = jnp.where(valid_flat, jnp.maximum(best_sim, 0.0), 0.0)
    best_sim = jnp.where(jnp.isfinite(best_sim), best_sim, 0.0)
    return best_idx, best_sim


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
    best_idx, best_sim = _match_gallery(
        emb.reshape(b * k, d), gallery, gallery_valid,
        det.valid.reshape(b * k), similarity_thresh)
    return PipelineOutput(boxes=det.boxes, scores=det.scores, kps=det.kps,
                          valid=det.valid, count=det.count, embeddings=emb,
                          match_idx=best_idx.reshape(b, k),
                          match_sim=best_sim.reshape(b, k))


def embed_and_match_bucketed(emb_apply, emb_vars, frames, det: Detections,
                             gallery, gallery_valid, *, similarity_thresh,
                             bucket: int, use_pallas: bool = False,
                             interpret: bool = False, fb_slots: int = 0):
    """Jit-traceable stage 2 with face-count bucketing.

    Valid faces are compacted to the front of the flattened (B*K) slate
    (stable order) and only the first `bucket` slots run the warp+ArcFace
    path — the expensive per-crop work scales with the REAL face count, not
    the padded max_det capacity. `bucket` is static; the host picks the
    smallest compiled bucket >= the actual count (one scalar sync/batch).
    """
    b, k = det.valid.shape
    flat_valid = det.valid.reshape(-1)
    order = jnp.argsort(jnp.logical_not(flat_valid), stable=True)  # valid first
    sel = order[:bucket]
    kps_sel = det.kps.reshape(b * k, 5, 2)[sel]
    valid_sel = flat_valid[sel]
    frame_idx = (sel // k).astype(jnp.int32)

    if use_pallas and fb_slots > 0:
        from .embedder import embed_crops_mixed

        emb_sel = embed_crops_mixed(
            emb_apply, emb_vars, frames, det.canvas, kps_sel, frame_idx,
            valid_sel, fb_slots=min(fb_slots, bucket), interpret=interpret,
            det_scale=det.det_scale)                                # (F, 512)
    elif use_pallas:
        from .embedder import embed_crops_pallas

        emb_sel = embed_crops_pallas(
            emb_apply, emb_vars, frames, det.canvas, kps_sel, frame_idx,
            valid_sel, interpret=interpret,
            det_scale=det.det_scale)                                # (F, 512)
    else:
        emb_sel = embed_crops(emb_apply, emb_vars, frames, kps_sel, frame_idx,
                              valid_sel)                            # (F, 512)
    best_idx, best_sim = _match_gallery(emb_sel, gallery, gallery_valid,
                                        valid_sel, similarity_thresh)

    # scatter back into the padded (B, K) layout
    emb = jnp.zeros((b * k, emb_sel.shape[-1]), emb_sel.dtype).at[sel].set(emb_sel)
    idx_full = jnp.full((b * k,), -1, jnp.int32).at[sel].set(best_idx)
    sim_full = jnp.zeros((b * k,), jnp.float32).at[sel].set(best_sim)
    return PipelineOutput(boxes=det.boxes, scores=det.scores, kps=det.kps,
                          valid=det.valid, count=det.count,
                          embeddings=emb.reshape(b, k, -1),
                          match_idx=idx_full.reshape(b, k),
                          match_sim=sim_full.reshape(b, k))


def embed_and_match(emb_apply, emb_vars, frames, det: Detections, gallery,
                    gallery_valid, *, similarity_thresh):
    """Jit-traceable stage 2: align+embed+gallery-match for a Detections."""
    emb = embed_faces(emb_apply, emb_vars, frames, det.kps, det.valid)
    b, k, d = emb.shape
    best_idx, best_sim = _match_gallery(
        emb.reshape(b * k, d), gallery, gallery_valid,
        det.valid.reshape(b * k), similarity_thresh)
    return PipelineOutput(boxes=det.boxes, scores=det.scores, kps=det.kps,
                          valid=det.valid, count=det.count, embeddings=emb,
                          match_idx=best_idx.reshape(b, k),
                          match_sim=best_sim.reshape(b, k))


class FacePipeline:
    """Detector + Embedder + gallery as a two-stage device-resident chain.

    Stage 1 (detect: letterbox->SCRFD->decode->NMS) and stage 2
    (umeyama->warp->ArcFace->L2->cosine match) are separate jit programs;
    every intermediate stays on device, so there is still no host
    round-trip per frame batch. Two programs instead of one mega-jit keeps
    XLA's scheduler effective (the single fused graph compiled ~100x slower
    AND ran ~25x slower end-to-end on v5e) while costing only one extra
    dispatch (~30us).

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
                 dtype: Any = jnp.float32, seed: int = 0,
                 use_pallas_warp: Optional[bool] = None,
                 det_onnx: Optional[str] = None,
                 rec_onnx: Optional[str] = None,
                 tight_canvas: bool = True):
        self.detector = detector or Detector(
            det_variant, conf_thres=conf_thres, iou_thres=iou_thres,
            pre_nms=pre_nms, max_det=max_det, dtype=dtype, seed=seed,
            onnx_path=det_onnx)
        self.embedder = embedder or Embedder(rec_variant, dtype=dtype,
                                             seed=seed, onnx_path=rec_onnx)
        self.similarity_thresh = similarity_thresh
        # Pallas warp policy: None/"auto" -> on for TPU, with per-batch
        # fallback to the XLA warp when any face exceeds the kernel envelope
        # (>15deg roll / >2x-per-level scale); True/"force" -> always pallas
        # (out-of-envelope faces degrade instead of falling back);
        # False/"off" -> XLA warp only.
        if use_pallas_warp is None or use_pallas_warp == "auto":
            self.pallas_policy = ("auto" if jax.default_backend() == "tpu"
                                  else "off")
        elif use_pallas_warp in (True, "force"):
            self.pallas_policy = "force"
        else:
            self.pallas_policy = "off"
        self.use_pallas_warp = self.pallas_policy != "off"
        # a user-supplied detector is the single source of ITS config: the
        # pipeline reads conf/iou from it, so pre_nms/max_det must come
        # from it too — mixing them with the pipeline ctor defaults
        # silently truncated detections (detector built with max_det=64,
        # pipeline default 16 -> crowd frames capped at 16, no error)
        if detector is not None:
            self.pre_nms = detector.pre_nms
            self.max_det = detector.max_det
        else:
            self.pre_nms = pre_nms
            self.max_det = max_det
        # Trim the all-zero letterbox pad band (44% of the canvas for 16:9
        # video) before the conv stack; see ops.tight_letterbox_plan for
        # the parity discussion. Reference-parity runs pass False.
        self.tight_canvas = tight_canvas
        self.gallery_capacity = gallery_capacity
        # gallery rows match the embedder's output dim (512 for every
        # released graph; custom configs may differ)
        self.emb_dim = getattr(self.embedder, "emb_dim", 512)
        self.names: list = []
        self._gallery = jnp.zeros((gallery_capacity, self.emb_dim),
                                  jnp.float32)
        self._gallery_valid = jnp.zeros((gallery_capacity,), bool)
        self._jitted = {}

    # ------------------------------------------------------------- gallery

    def set_gallery(self, embeddings, names) -> None:
        """Install target embeddings (rows are L2-normalized on device).

        Zero-pads to the static gallery capacity so gallery growth up to
        capacity never triggers recompilation.
        """
        embs = np.asarray(embeddings,
                          dtype=np.float32).reshape(-1, self.emb_dim)
        g = len(embs)
        if g > self.gallery_capacity:
            raise ValueError(f"gallery ({g}) exceeds capacity "
                             f"({self.gallery_capacity})")
        if len(names) != g:
            raise ValueError("names/embeddings length mismatch")
        buf = np.zeros((self.gallery_capacity, self.emb_dim), np.float32)
        buf[:g] = embs
        valid = np.zeros((self.gallery_capacity,), bool)
        valid[:g] = True
        self._gallery = ops.l2_normalize(jnp.asarray(buf))
        self._gallery_valid = jnp.asarray(valid)
        self.names = list(names)
        # multi-device placements cache the gallery arrays — drop them so
        # DP runs match against the NEW gallery, not a stale copy
        for key in [k for k in self._jitted
                    if isinstance(k, tuple) and k and k[0] == "placement"]:
            del self._jitted[key]

    # ------------------------------------------------------------- forward

    def _fn(self, frame_hw: Tuple[int, int], max_num: int, metric: str):
        """Stage-1 jit (detect) keyed by frame shape; stage-2 jit shared."""
        key = (frame_hw, max_num, metric)
        if key not in self._jitted:
            plan = (ops.tight_letterbox_plan(frame_hw,
                                             self.detector.input_size)
                    if self.tight_canvas else
                    ops.letterbox_plan(frame_hw, self.detector.input_size))
            det_apply = self.detector.model.apply

            cdt = (jnp.bfloat16
                   if getattr(self.detector, "dtype", None) == jnp.bfloat16
                   else None)

            def detect_fn(det_vars, frames):
                return detect_batch(
                    det_apply, det_vars, frames, plan=plan,
                    conf_thres=self.detector.conf_thres,
                    iou_thres=self.detector.iou_thres, pre_nms=self.pre_nms,
                    max_det=self.max_det, max_num=max_num, metric=metric,
                    compute_dtype=cdt,
                    # policy 'off' can never take the Pallas path: skip the
                    # canvas/envelope byproducts' HBM traffic
                    want_canvas=(self.pallas_policy != "off"))

            self._jitted[key] = jax.jit(detect_fn)
        # threshold is part of the key: it is baked into the traced program,
        # so mutating pipe.similarity_thresh must produce a fresh closure,
        # not silently serve the old one
        em_key = ("embed_match", self.similarity_thresh)
        if em_key not in self._jitted:
            emb_apply = self.embedder.model.apply
            thresh = self.similarity_thresh

            def em_fn(emb_vars, frames, det, gallery, gallery_valid):
                return embed_and_match(
                    emb_apply, emb_vars, frames, det, gallery, gallery_valid,
                    similarity_thresh=thresh)

            self._jitted[em_key] = jax.jit(em_fn)
        return self._jitted[key], self._jitted[em_key]

    # repair-slot budget for mixed pallas+XLA warp batches: out-of-envelope
    # crops up to this count are recomputed exactly while the pallas kernel
    # still serves the rest of the batch (embed_crops_mixed).
    FB_SLOTS = 16

    def _bucket_fn(self, bucket: int, use_pallas: bool = False,
                   fb_slots: int = 0):
        key = ("bucket", bucket, use_pallas, fb_slots,
               self.similarity_thresh)
        if key not in self._jitted:
            emb_apply = self.embedder.model.apply
            interpret = jax.default_backend() != "tpu"
            thresh = self.similarity_thresh

            def em_fn(emb_vars, frames, det, gallery, gallery_valid):
                return embed_and_match_bucketed(
                    emb_apply, emb_vars, frames, det, gallery, gallery_valid,
                    similarity_thresh=thresh, bucket=bucket,
                    use_pallas=use_pallas, interpret=interpret,
                    fb_slots=fb_slots)

            self._jitted[key] = jax.jit(em_fn)
        return self._jitted[key]

    @staticmethod
    def _round_bucket(count: int, cap: int) -> int:
        """Smallest compiled face-count bucket >= count.

        Powers of two up to 64, then multiples of 64: per-crop work (warp +
        ArcFace) dominates stage 2, so coarse power-of-2 buckets waste up to
        2x compute at high face density (e.g. 320 real faces -> bucket 512).
        64-steps bound the waste at <=20% while keeping the compile count
        small (<=12 buckets at cap 512)."""
        if count <= 0:
            return 0
        if count <= 64:
            b = 8
            while b < count:
                b *= 2
        else:
            b = -(-count // 64) * 64
        return min(b, cap)

    def _placed(self, frames):
        """Variables/gallery placement compatible with the input sharding:
        replicate over the input's mesh when frames are multi-device (DP)."""
        devices = getattr(frames, "sharding", None)
        dev_set = getattr(devices, "device_set", None)
        if not dev_set or len(dev_set) <= 1:
            return (self.detector.variables, self.embedder.variables,
                    self._gallery, self._gallery_valid)
        key = tuple(sorted(d.id for d in dev_set))
        entry = self._jitted.get(("placement", key))
        # invalidate on weight swap (pipe.detector.variables = <trained
        # checkpoint> after a DP run): the cache stores the SOURCE trees it
        # replicated from and re-places when they are no longer the live
        # attributes — otherwise multi-device calls keep stale weights
        # while single-device calls use the new ones
        if (entry is None
                or entry[0] is not self.detector.variables
                or entry[1] is not self.embedder.variables):
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(frames.sharding.mesh, PartitionSpec())
            put = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
            placed = (put(self.detector.variables),
                      put(self.embedder.variables),
                      put(self._gallery), put(self._gallery_valid))
            entry = (self.detector.variables, self.embedder.variables, placed)
            self._jitted[("placement", key)] = entry
        return entry[2]

    def __call__(self, frames, max_num: int = 0, metric: str = "max",
                 bucketed: bool = True) -> PipelineOutput:
        if not isinstance(frames, jax.Array):
            frames = jnp.asarray(np.asarray(frames))
        if frames.ndim == 3:
            frames = frames[None]
        placed = self._placed(frames)
        det_vars, emb_vars, gallery, gallery_valid = placed
        detect_fn, em_fn = self._fn(tuple(frames.shape[1:3]), max_num, metric)
        det = detect_fn(det_vars, frames)
        if bucketed:
            # one readback: real face count + warp-envelope violations ->
            # smallest compiled bucket and pallas-vs-XLA warp path
            return self._finish(frames, det, placed)
        return em_fn(emb_vars, frames, det, gallery, gallery_valid)

    def call_dynamic(self, frames, wy, wx, det_scales, frame_hws,
                     max_num: int = 0, metric: str = "max") -> PipelineOutput:
        """Heterogeneous-shape batch: ONE compiled program per PADDED shape.

        frames: (B, Hp, Wp, 3) uint8, each image zero-padded bottom/right
        past its content; wy (B, mh, Hp) / wx (B, mw, Wp): stacked per-image
        full letterbox matrices (ops.letterbox_matrices); det_scales: (B,)
        per-image scales; frame_hws: (B, 2) original sizes. Letterbox
        geometry rides in as DATA, so web images of arbitrary shapes share
        a handful of compiled bucket programs while producing exactly the
        canvas exact-shape processing would (no accuracy drift — the
        clustering ingest's shape-bucketing guarantee).
        """
        if not isinstance(frames, jax.Array):
            frames = jnp.asarray(np.asarray(frames))
        placed = self._placed(frames)
        key = ("dyn", tuple(frames.shape), max_num, metric)
        if key not in self._jitted:
            from .detector import detect_batch_dynamic

            det_apply = self.detector.model.apply
            model_hw = self.detector.input_size

            def detect_fn(det_vars, frames, wy, wx, inv_scale, fhw):
                return detect_batch_dynamic(
                    det_apply, det_vars, frames, wy, wx, inv_scale, fhw,
                    model_hw=model_hw, conf_thres=self.detector.conf_thres,
                    iou_thres=self.detector.iou_thres, pre_nms=self.pre_nms,
                    max_det=self.max_det, max_num=max_num, metric=metric)

            self._jitted[key] = jax.jit(detect_fn)
        inv_scale = 1.0 / jnp.asarray(np.asarray(det_scales, np.float32))
        det = self._jitted[key](
            placed[0], frames, jnp.asarray(np.asarray(wy, np.float32)),
            jnp.asarray(np.asarray(wx, np.float32)), inv_scale,
            jnp.asarray(np.asarray(frame_hws, np.int32)))
        return self._finish(frames, det, placed)

    def process_stream(self, frames_iter, max_num: int = 0,
                       metric: str = "max", depth: int = 2):
        """Pipelined streaming: yields PipelineOutput per input batch.

        Keeps `depth` batches in flight: batches i+1..i+depth's detect
        programs are dispatched BEFORE batch i's face-count readback, so
        the host->device round-trip (the one sync per batch the bucketing
        needs) overlaps device compute instead of serializing with it.
        depth=1 hides readbacks shorter than one detect; depth=2 covers
        remote-PJRT transports where the RTT exceeds the detect time.
        """
        from collections import deque

        pending = deque()  # of (frames, det, placed)
        for frames in frames_iter:
            if not isinstance(frames, jax.Array):
                frames = jnp.asarray(np.asarray(frames))
            if frames.ndim == 3:
                frames = frames[None]
            placed = self._placed(frames)
            detect_fn, _ = self._fn(tuple(frames.shape[1:3]), max_num, metric)
            det = detect_fn(placed[0], frames)
            pending.append((frames, det, placed))
            if len(pending) > max(1, depth):
                yield self._finish(*pending.popleft())
        while pending:
            yield self._finish(*pending.popleft())

    @staticmethod
    def _read_counts(det) -> Tuple[int, int]:
        """(total_valid, n_warp_fallback) with ONE host transfer.

        Reads the jit-produced host_counts buffer directly: dispatching a
        fresh jnp.stack/jnp.sum here would enqueue a new device program
        BEHIND every already-in-flight batch and serialize the stream; a
        plain transfer of a ready buffer does not.
        """
        if det.host_counts is not None:
            counts = np.asarray(det.host_counts)
        else:
            counts = np.asarray(jnp.stack([
                jnp.sum(det.valid).astype(jnp.int32),
                (det.n_warp_fallback if det.n_warp_fallback is not None
                 else jnp.int32(1))]))
        return int(counts[0]), int(counts[1])

    def _finish(self, frames, det, placed) -> PipelineOutput:
        """Stage 2 for an already-dispatched detect (bucketed)."""
        _, emb_vars, gallery, gallery_valid = placed
        count, n_fallback = self._read_counts(det)
        cap = det.valid.shape[0] * det.valid.shape[1]
        bucket = self._round_bucket(count, cap)
        if bucket == 0:
            b, k = det.valid.shape
            return PipelineOutput(
                boxes=det.boxes, scores=det.scores, kps=det.kps,
                valid=det.valid, count=det.count,
                embeddings=jnp.zeros((b, k, self.emb_dim), jnp.float32),
                match_idx=jnp.full((b, k), -1, jnp.int32),
                match_sim=jnp.zeros((b, k), jnp.float32))
        # policy: clean batch -> pure pallas; a few envelope violations ->
        # pallas + exact repair of just those crops; many -> plain XLA.
        fb_slots = 0
        if self.pallas_policy == "force":
            use_pallas = det.canvas is not None
        elif self.pallas_policy == "auto" and det.canvas is not None:
            use_pallas = n_fallback <= self.FB_SLOTS
            fb_slots = self.FB_SLOTS if (use_pallas and n_fallback > 0) else 0
        else:
            use_pallas = False
        em_fn = self._bucket_fn(bucket, use_pallas, fb_slots)
        return em_fn(emb_vars, frames, det, gallery, gallery_valid)

    def match_names(self, out: PipelineOutput):
        """Host-side: map match_idx -> names ('Unknown' below threshold)."""
        idx = np.asarray(out.match_idx)
        return [
            [self.names[j] if j >= 0 else "Unknown" for j in row]
            for row in idx
        ]

    def build_targets_from_images(self, images, names) -> int:
        """Gallery construction from face photos (main.py:78-105 semantics):
        detect the single most prominent face per image, embed, install.

        Returns the number of targets installed; raises when NO image
        yielded a face — silently keeping the previous gallery would
        attribute frames to stale identities with no warning.
        """
        embs, kept, skipped = [], [], []
        for img, name in zip(images, names):
            det, kps = self.detector.detect(img, max_num=1)
            if len(det) == 0:
                skipped.append(name)
                continue
            emb = self.embedder(img, kps[0])
            embs.append(emb / max(np.linalg.norm(emb), 1e-12))
            kept.append(name)
        if not embs:
            raise ValueError(
                f"no faces detected in any of the {len(skipped)} target "
                f"images — gallery left unchanged ({skipped[:5]}...)")
        if skipped:
            import logging

            logging.getLogger(__name__).warning(
                "no face detected in %d/%d target images (skipped: %s)",
                len(skipped), len(skipped) + len(kept), skipped[:10])
        self.set_gallery(np.stack(embs), kept)
        return len(kept)
