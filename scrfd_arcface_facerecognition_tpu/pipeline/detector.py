"""SCRFD detection pipeline: letterbox -> forward -> decode -> NMS, one jit.

Replicates SCRFD.detect (/root/reference/models/scrfd.py:122-178) with
static shapes: candidates are a top-K_pre score slate instead of a dynamic
np.where, NMS is the fixed-size masked kernel from ops/nms.py, and results
are (max_det,) padded with a validity mask. Output coordinates are in
original-frame pixels (divided by det_scale) exactly like the reference.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import build_scrfd
from ..models.scrfd import SCRFD_CONFIGS
from .. import ops


class Detections(NamedTuple):
    """Padded detection results for a batch of frames.

    boxes: (B, max_det, 4) x1y1x2y2 in original-frame pixels
    scores: (B, max_det)
    kps: (B, max_det, 5, 2)
    valid: (B, max_det) bool
    count: (B,) int32
    canvas: (B, 640, 640, 3) uint8 letterbox canvas (reused by the Pallas
        warp as its large-face pyramid level) — None when not materialized
    n_warp_fallback: () int32 — how many valid faces exceed the Pallas warp
        envelope (rotation/scale); None when not computed
    host_counts: (2,) int32 [total_valid, n_warp_fallback], computed INSIDE
        the detect jit so the host's bucketing readback is a pure buffer
        transfer (a post-hoc jnp.stack would enqueue a new program behind
        every already-dispatched batch and serialize the stream)
    """
    boxes: jnp.ndarray
    scores: jnp.ndarray
    kps: jnp.ndarray
    valid: jnp.ndarray
    count: jnp.ndarray
    canvas: Optional[jnp.ndarray] = None
    n_warp_fallback: Optional[jnp.ndarray] = None
    host_counts: Optional[jnp.ndarray] = None
    det_scale: Optional[jnp.ndarray] = None  # (B,) per-image letterbox scale
    # (set by detect_batch_dynamic; None -> static plan scale applies)


def decode_outputs(outputs: Dict[str, list], input_size: Tuple[int, int],
                   strides=ops.anchors.SCRFD_STRIDES) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate per-stride head outputs and decode against anchor grids.

    Mirrors scrfd.py:89-119: bbox/kps predictions are multiplied by stride,
    decoded via distance2bbox/kps around the anchor centers, and stacked in
    stride order. Returns (B, N) scores, (B, N, 4) boxes, (B, N, 5, 2) kps
    in letterboxed-input pixels.
    """
    h, w = input_size
    all_scores, all_boxes, all_kps = [], [], []
    for li, stride in enumerate(strides):
        centers = ops.anchor_centers(h // stride, w // stride, stride)  # (n, 2)
        scores = outputs["scores"][li][..., 0]            # (B, n)
        boxes = ops.distance2bbox(centers, outputs["bboxes"][li] * stride)
        kps = ops.distance2kps(centers, outputs["kps"][li] * stride)
        all_scores.append(scores)
        all_boxes.append(boxes)
        all_kps.append(kps)
    return (jnp.concatenate(all_scores, axis=1),
            jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_kps, axis=1))


def detect_batch(apply_fn, variables, frames: jnp.ndarray, *,
                 plan: ops.LetterboxPlan, conf_thres: float, iou_thres: float,
                 pre_nms: int, max_det: int, max_num: int = 0,
                 metric: str = "max", compute_dtype=None,
                 want_canvas: bool = True) -> Detections:
    """Full detect over (B, H, W, 3) uint8 BGR frames. Jit-traceable.

    compute_dtype: letterbox einsum precision — bf16 halves the resize
    matmul time when the detector itself runs bf16 (<=1 intensity LSB on
    the canvas, inside the 1e-3 budget); None = f32 (parity default).
    want_canvas: False skips the u8 canvas + warp-envelope byproducts —
    consumers that can never take the Pallas path (the plain Detector API,
    pallas_policy 'off') shouldn't pay their HBM traffic, and jit outputs
    cannot be dead-code-eliminated.
    """
    input_size = plan.model_hw
    canvas = ops.letterbox(frames, plan, dtype=compute_dtype)  # (B, 640, 640, 3) f32
    net_in = ops.normalize_image(canvas, ops.SCRFD_MEAN, ops.SCRFD_STD)
    outputs = apply_fn(variables, net_in)
    scores, boxes, kps = decode_outputs(outputs, input_size)

    # Top-K_pre slate (replaces np.where threshold + global argsort,
    # scrfd.py:109/:144 — ordering by score is identical).
    top_scores, top_idx = jax.lax.top_k(scores, pre_nms)       # (B, K)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_kps = jnp.take_along_axis(kps, top_idx[..., None, None], axis=1)

    inv_scale = 1.0 / plan.det_scale                           # scrfd.py:145-148
    top_boxes = top_boxes * inv_scale
    top_kps = top_kps * inv_scale
    valid = top_scores >= conf_thres

    def per_frame(boxes_f, scores_f, kps_f, valid_f):
        keep = ops.nms_mask_blocked(boxes_f, iou_thres, valid_f)
        det = jnp.concatenate([boxes_f, scores_f[:, None]], axis=1)
        count, mask, det_c, kps_c = ops.nms.compact_by_mask(
            keep, det, kps_f, max_out=max_det)
        if 0 < max_num < max_det:
            det_s, kps_s, mask_s = ops.select_top_faces(
                det_c, kps_c, mask, max_num, metric, plan.frame_hw)
            # reference semantics (scrfd.py:159): selection — and its
            # area/center reordering — applies only when MORE than max_num
            # faces survive NMS; otherwise score order is preserved (the
            # compacted slate is already score-descending)
            sel = count > max_num
            det_c = jnp.where(sel, det_s, det_c[:max_num])
            kps_c = jnp.where(sel, kps_s, kps_c[:max_num])
            mask = jnp.where(sel, mask_s, mask[:max_num])
            count = jnp.minimum(count, max_num)
        return det_c, kps_c, mask, count

    det_c, kps_c, mask, count = jax.vmap(per_frame)(
        top_boxes, top_scores, top_kps, valid)

    b, k = mask.shape
    total = jnp.sum(mask).astype(jnp.int32)
    scale_b = jnp.full((b,), plan.det_scale, jnp.float32)
    if not want_canvas:
        return Detections(boxes=det_c[..., :4], scores=det_c[..., 4],
                          kps=kps_c, valid=mask, count=count,
                          host_counts=jnp.stack(
                              [total, jnp.int32(0)]),
                          det_scale=scale_b)

    # u8 canvas + Pallas-warp envelope check (one fused byproduct so the
    # host learns bucket size AND warp path from a single readback)
    canvas_u8 = jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)
    from .. import ops as _ops
    from ..ops import pallas_warp as _pw

    matrices = _ops.estimate_norm(kps_c.reshape(b * k, 5, 2))
    wp = _pw.prepare_warp_params(
        matrices, jnp.repeat(jnp.arange(b, dtype=jnp.int32), k),
        plan.frame_hw, plan.det_scale, canvas_hw=plan.model_hw)
    n_fb = jnp.sum(wp.fallback & mask.reshape(-1)).astype(jnp.int32)
    return Detections(boxes=det_c[..., :4], scores=det_c[..., 4],
                      kps=kps_c, valid=mask, count=count,
                      canvas=canvas_u8, n_warp_fallback=n_fb,
                      host_counts=jnp.stack([total, n_fb]),
                      det_scale=scale_b)


def detect_batch_dynamic(apply_fn, variables, frames: jnp.ndarray,
                         wy: jnp.ndarray, wx: jnp.ndarray,
                         inv_scale: jnp.ndarray, frame_hw_arr: jnp.ndarray, *,
                         model_hw: Tuple[int, int], conf_thres: float,
                         iou_thres: float, pre_nms: int, max_det: int,
                         max_num: int = 0, metric: str = "max") -> Detections:
    """Heterogeneous-shape detect: per-image letterbox geometry as DATA.

    frames: (B, Hp, Wp, 3) uint8, each image zero-padded past its content;
    wy (B, mh, Hp) / wx (B, mw, Wp): per-image full letterbox matrices from
    ops.letterbox_matrices (zero rows produce the pad band, taps are built
    from each ORIGINAL shape); inv_scale: (B,) 1/det_scale per image;
    frame_hw_arr: (B, 2) original (h, w) per image (metric='default'
    centers). The canvas content is numerically identical to exact-shape
    letterboxing, so one compiled program per PADDED bucket shape serves
    arbitrarily shaped web images with no accuracy drift
    (tests/test_apps_clustering.py bucket-parity test).
    """
    canvas = ops.letterbox_dynamic(frames, wy, wx)           # (B, mh, mw, 3)
    net_in = ops.normalize_image(canvas, ops.SCRFD_MEAN, ops.SCRFD_STD)
    outputs = apply_fn(variables, net_in)
    scores, boxes, kps = decode_outputs(outputs, model_hw)

    top_scores, top_idx = jax.lax.top_k(scores, pre_nms)       # (B, K)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_kps = jnp.take_along_axis(kps, top_idx[..., None, None], axis=1)

    top_boxes = top_boxes * inv_scale[:, None, None]
    top_kps = top_kps * inv_scale[:, None, None, None]
    valid = top_scores >= conf_thres

    def per_frame(boxes_f, scores_f, kps_f, valid_f, fhw):
        keep = ops.nms_mask_blocked(boxes_f, iou_thres, valid_f)
        det = jnp.concatenate([boxes_f, scores_f[:, None]], axis=1)
        count, mask, det_c, kps_c = ops.nms.compact_by_mask(
            keep, det, kps_f, max_out=max_det)
        if 0 < max_num < max_det:
            det_s, kps_s, mask_s = ops.select_top_faces(
                det_c, kps_c, mask, max_num, metric, fhw)
            # selection only when count > max_num (scrfd.py:159) — see
            # detect_batch
            sel = count > max_num
            det_c = jnp.where(sel, det_s, det_c[:max_num])
            kps_c = jnp.where(sel, kps_s, kps_c[:max_num])
            mask = jnp.where(sel, mask_s, mask[:max_num])
            count = jnp.minimum(count, max_num)
        return det_c, kps_c, mask, count

    det_c, kps_c, mask, count = jax.vmap(per_frame)(
        top_boxes, top_scores, top_kps, valid, frame_hw_arr)

    canvas_u8 = jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)
    from ..ops import pallas_warp as _pw

    b, k = mask.shape
    matrices = ops.estimate_norm(kps_c.reshape(b * k, 5, 2))
    frame_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    det_scale_face = (1.0 / inv_scale)[frame_idx]   # per-face, broadcasts
    wp = _pw.prepare_warp_params(
        matrices, frame_idx, (frames.shape[1], frames.shape[2]),
        det_scale_face, canvas_hw=model_hw)
    n_fb = jnp.sum(wp.fallback & mask.reshape(-1)).astype(jnp.int32)
    total = jnp.sum(mask).astype(jnp.int32)
    return Detections(boxes=det_c[..., :4], scores=det_c[..., 4],
                      kps=kps_c, valid=mask, count=count,
                      canvas=canvas_u8, n_warp_fallback=n_fb,
                      host_counts=jnp.stack([total, n_fb]),
                      det_scale=1.0 / inv_scale)


class Detector:
    """User-facing SCRFD detector (API mirror of scrfd.py:18-24, 122).

    >>> det = Detector("det_10g", conf_thres=0.5, iou_thres=0.4)
    >>> boxes, kps = det.detect(frame_bgr_u8, max_num=0)
    """

    def __init__(self, variant: str = "det_10g", variables: Optional[Any] = None,
                 input_size: Tuple[int, int] = (640, 640),
                 conf_thres: float = 0.5, iou_thres: float = 0.4,
                 pre_nms: int = 256, max_det: int = 64,
                 dtype: Any = jnp.float32, seed: int = 0,
                 s2d_stem: bool = True, onnx_path: Optional[str] = None,
                 tight_canvas: bool = False, config: Optional[Any] = None):
        # config: an explicit SCRFDConfig — serve a custom architecture
        # (e.g. one you trained) instead of a registry variant
        self.variant = config.name if config is not None else variant
        self.input_size = (input_size[1], input_size[0])  # store as (h, w)
        self.dtype = dtype
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.pre_nms = pre_nms
        self.max_det = max_det
        # False: exact square-canvas semantics (reference parity for the
        # single-image API); FacePipeline turns the trim on for throughput.
        self.tight_canvas = tight_canvas
        if onnx_path is not None:
            if variables is not None:
                raise ValueError(
                    "pass either variables or onnx_path, not both — the "
                    "graph path would silently discard the given weights")
            # Graph-driven path: the released .onnx IS the model
            # (numerical agreement with the file is structural).
            from ..models.graph_models import scrfd_from_onnx

            self.model = scrfd_from_onnx(onnx_path, dtype=dtype)
            variables = self.model.variables
        else:
            if config is not None:
                import dataclasses

                from ..models.scrfd import SCRFDNet

                if s2d_stem and not config.s2d_stem:
                    config = dataclasses.replace(config, s2d_stem=True)
                self.model = SCRFDNet(config, dtype=dtype)
            elif variant not in SCRFD_CONFIGS:
                raise ValueError(f"unknown SCRFD variant {variant!r}")
            else:
                self.model = build_scrfd(variant, dtype=dtype,
                                         s2d_stem=s2d_stem)
            if variables is None:
                from ..models.init_utils import cpu_init

                variables = cpu_init(self.model, seed,
                                     (1, *self.input_size, 3))
            else:
                # Trained checkpoints carry the plain (3,3,3,C) stem
                # (training builds s2d_stem=False); convert to the serving
                # model's s2d layout when they differ (exact equivalence).
                from ..models.scrfd import adapt_stem_variables

                variables = adapt_stem_variables(variables, s2d_stem)
        from ..models.init_utils import place_variables

        # importer/executor weights arrive as host numpy: commit them to
        # the device once, or every jitted call re-uploads ~all of them
        self.variables = place_variables(variables)
        self._jitted = {}

    def _fn(self, frame_hw: Tuple[int, int], max_num: int, metric: str):
        key = (frame_hw, max_num, metric)
        if key not in self._jitted:
            plan = (ops.tight_letterbox_plan(frame_hw, self.input_size)
                    if self.tight_canvas else
                    ops.letterbox_plan(frame_hw, self.input_size))
            fn = functools.partial(
                detect_batch, self.model.apply,
                plan=plan, conf_thres=self.conf_thres,
                iou_thres=self.iou_thres, pre_nms=self.pre_nms,
                max_det=self.max_det, max_num=max_num, metric=metric,
                # the plain detect API never takes the Pallas warp path —
                # don't pay the canvas/envelope byproducts' HBM traffic
                want_canvas=False)
            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def detect_batched(self, frames: jnp.ndarray, max_num: int = 0,
                       metric: str = "max") -> Detections:
        """(B, H, W, 3) uint8 BGR -> Detections (device arrays, padded)."""
        fn = self._fn(tuple(frames.shape[1:3]), max_num, metric)
        return fn(self.variables, frames)

    def detect(self, image, max_num: int = 0, metric: str = "max"):
        """Single-image API with the reference's return convention:

        (det[N, 5], kps[N, 5, 2]) numpy arrays, N = surviving faces.
        """
        import numpy as np

        frames = jnp.asarray(np.asarray(image)[None])
        d = self.detect_batched(frames, max_num=max_num, metric=metric)
        n = int(d.count[0])
        det = np.concatenate(
            [np.asarray(d.boxes[0][:n]), np.asarray(d.scores[0][:n])[:, None]],
            axis=1)
        return det, np.asarray(d.kps[0][:n])
