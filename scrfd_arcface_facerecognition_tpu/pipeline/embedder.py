"""ArcFace embedding pipeline: umeyama-align -> warp -> embed -> L2, one jit.

Replicates ArcFace.__call__/get_feat (/root/reference/models/arcface.py:39-57)
and norm_crop_image (helpers.py:56-59): faces are aligned out of the
*original* frame by their 5 landmarks, warped to 112x112, normalized
(x-127.5)/127.5 with BGR->RGB swap, and embedded to 512-d.
Batched over frames x face slots; invalid slots produce zero embeddings.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import build_arcface
from ..models.arcface import ARCFACE_CONFIGS
from .. import ops


def embed_crops(apply_fn, variables, frames: jnp.ndarray, kps_flat: jnp.ndarray,
                frame_idx: jnp.ndarray, valid_flat: jnp.ndarray, *,
                image_size: int = 112, l2: bool = True) -> jnp.ndarray:
    """Embed F face crops drawn from a frame batch (flat form).

    frames (B, H, W, 3) u8 BGR; kps_flat (F, 5, 2); frame_idx (F,);
    valid_flat (F,) -> (F, 512) embeddings (invalid slots -> 0).
    """
    matrices = ops.estimate_norm(kps_flat, image_size)         # (F, 2, 3)
    crops = ops.warp.warp_affine_flat(frames, matrices, frame_idx,
                                      (image_size, image_size))
    net_in = ops.normalize_image(crops, ops.ARCFACE_MEAN, ops.ARCFACE_STD)
    emb = apply_fn(variables, net_in)                          # (F, 512)
    if l2:
        emb = ops.l2_normalize(emb)
    return emb * valid_flat[:, None].astype(emb.dtype)


def _pallas_warp_crops(frames, canvas_u8, kps_flat, frame_idx, det_scale,
                       interpret: bool):
    """Shared preamble of the two Pallas embed paths: umeyama matrices ->
    kernel params -> warped crops. Returns (matrices, params, crops).

    det_scale: per-image (B,) canvas scales. The detect stage always
    supplies these (Detections.det_scale carries its plan's exact value) —
    re-deriving from letterbox_plan(frame_hw, canvas_hw) is only a
    fallback for direct callers, and is WRONG for tight-trimmed canvases
    whose trim flips the plan's binding dimension (the int() truncation
    shifts the scale; detect and embed must agree to the bit).
    """
    from ..ops import pallas_warp as pw

    matrices = ops.estimate_norm(kps_flat, 112)
    canvas_hw = tuple(canvas_u8.shape[1:3])
    if det_scale is None:
        scale = ops.letterbox_plan(tuple(frames.shape[1:3]),
                                   canvas_hw).det_scale
    else:
        scale = det_scale[frame_idx]   # per-face, broadcasts in the params
    params = pw.prepare_warp_params(
        matrices, frame_idx, tuple(frames.shape[1:3]), scale,
        canvas_hw=canvas_hw)
    crops = pw.warp_crops_pallas(pw.planarize(frames), pw.planarize(canvas_u8),
                                 params, interpret=interpret)
    return matrices, params, crops


def embed_crops_pallas(apply_fn, variables, frames: jnp.ndarray,
                       canvas_u8: jnp.ndarray, kps_flat: jnp.ndarray,
                       frame_idx: jnp.ndarray, valid_flat: jnp.ndarray, *,
                       l2: bool = True, interpret: bool = False,
                       det_scale=None) -> jnp.ndarray:
    """embed_crops with the Pallas multi-pass warp instead of XLA gather.

    Requires every crop within the kernel envelope (the caller routes
    batches with envelope violations to embed_crops); canvas_u8 is the
    detect stage's letterbox canvas (large-face pyramid level).
    det_scale: per-image (B,) canvas scales (Detections.det_scale).
    """
    _, _, crops = _pallas_warp_crops(frames, canvas_u8, kps_flat, frame_idx,
                                     det_scale, interpret)
    net_in = ops.normalize_image(crops, ops.ARCFACE_MEAN, ops.ARCFACE_STD)
    emb = apply_fn(variables, net_in)
    if l2:
        emb = ops.l2_normalize(emb)
    return emb * valid_flat[:, None].astype(emb.dtype)


def embed_crops_mixed(apply_fn, variables, frames: jnp.ndarray,
                      canvas_u8: jnp.ndarray, kps_flat: jnp.ndarray,
                      frame_idx: jnp.ndarray, valid_flat: jnp.ndarray, *,
                      fb_slots: int = 16, l2: bool = True,
                      interpret: bool = False, det_scale=None) -> jnp.ndarray:
    """Pallas warp for in-envelope crops + XLA-warp repair for up to
    fb_slots out-of-envelope ones (rotation/scale past the kernel limits).

    Previously ONE tilted head sent the whole batch down the XLA gather
    path (~0.7 ms/crop at 512 crops); here the pallas kernel still serves
    the batch and only the flagged crops are recomputed exactly — the
    repair cost is fb_slots crops, not the batch. Callers route batches
    with more than fb_slots violations to embed_crops (plain XLA).
    """
    matrices, params, crops = _pallas_warp_crops(
        frames, canvas_u8, kps_flat, frame_idx, det_scale, interpret)

    # compact the flagged crops into the static repair slots
    fb = params.fallback & valid_flat
    order = jnp.argsort(jnp.logical_not(fb), stable=True)[:fb_slots]
    fb_crops = ops.warp.warp_affine_flat(
        frames, matrices[order], frame_idx[order], (112, 112))
    sel_valid = fb[order]
    repaired = jnp.where(sel_valid[:, None, None, None], fb_crops,
                         crops[order])
    crops = crops.at[order].set(repaired)

    net_in = ops.normalize_image(crops, ops.ARCFACE_MEAN, ops.ARCFACE_STD)
    emb = apply_fn(variables, net_in)
    if l2:
        emb = ops.l2_normalize(emb)
    return emb * valid_flat[:, None].astype(emb.dtype)


def embed_faces(apply_fn, variables, frames: jnp.ndarray, kps: jnp.ndarray,
                valid: jnp.ndarray, *, image_size: int = 112,
                l2: bool = True) -> jnp.ndarray:
    """frames (B, H, W, 3) u8 BGR; kps (B, K, 5, 2); valid (B, K) ->
    (B, K, 512) embeddings (L2-normalized unless l2=False; invalid -> 0)."""
    b, k = kps.shape[0], kps.shape[1]
    frame_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    emb = embed_crops(apply_fn, variables, frames,
                      kps.reshape(b * k, 5, 2), frame_idx,
                      valid.reshape(b * k), image_size=image_size, l2=l2)
    return emb.reshape(b, k, -1)


class Embedder:
    """User-facing ArcFace embedder (API mirror of arcface.py:11, 39, 54)."""

    def __init__(self, variant: str = "w600k_r50",
                 variables: Optional[Any] = None,
                 dtype: Any = jnp.float32, seed: int = 0,
                 onnx_path: Optional[str] = None,
                 config: Optional[Any] = None):
        # config: an explicit ArcFaceConfig — serve a custom architecture
        # (e.g. one you trained) instead of a registry variant
        self.variant = config.name if config is not None else variant
        self.input_size = (112, 112)
        # all released graphs embed to 512; custom configs may differ
        self.emb_dim = getattr(config, "emb_dim", 512) if config else 512
        if onnx_path is not None:
            if variables is not None:
                raise ValueError(
                    "pass either variables or onnx_path, not both — the "
                    "graph path would silently discard the given weights")
            # Graph-driven path: the released .onnx IS the model.
            from ..models.graph_models import arcface_from_onnx

            self.model = arcface_from_onnx(onnx_path, dtype=dtype)
            variables = self.model.variables
        else:
            if config is not None:
                from ..models.arcface import IResNet, MobileFaceNet

                self.model = (IResNet(config, dtype=dtype)
                              if config.arch == "iresnet"
                              else MobileFaceNet(config, dtype=dtype))
            elif variant not in ARCFACE_CONFIGS:
                raise ValueError(f"unknown ArcFace variant {variant!r}")
            else:
                self.model = build_arcface(variant, dtype=dtype)
            if variables is None:
                from ..models.init_utils import cpu_init

                variables = cpu_init(self.model, seed, (1, 112, 112, 3))
        from ..models.init_utils import place_variables

        # importer/executor weights arrive as host numpy: commit them to
        # the device once, or every jitted call re-uploads ~all of them
        self.variables = place_variables(variables)
        self._jitted = {}

    def _fn(self, frame_hw: Tuple[int, int], l2: bool):
        key = (frame_hw, l2)
        if key not in self._jitted:
            fn = functools.partial(embed_faces, self.model.apply, l2=l2)
            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def embed_batched(self, frames: jnp.ndarray, kps: jnp.ndarray,
                      valid: jnp.ndarray, l2: bool = True) -> jnp.ndarray:
        return self._fn(tuple(frames.shape[1:3]), l2)(
            self.variables, frames, kps, valid)

    def get_feat(self, aligned_images) -> "np.ndarray":
        """Embed pre-aligned 112x112 BGR crops (arcface.py:39-52). No L2
        normalization — the reference returns raw ONNX outputs here."""
        import numpy as np

        imgs = np.asarray(aligned_images)
        if imgs.ndim == 3:
            imgs = imgs[None]
        net_in = ops.normalize_image(jnp.asarray(imgs), ops.ARCFACE_MEAN,
                                     ops.ARCFACE_STD)
        return np.asarray(self.model.apply(self.variables, net_in))

    def __call__(self, image, kps) -> "np.ndarray":
        """Align one face out of `image` by 5 landmarks and embed
        (arcface.py:54-57). Returns the flat raw 512-d embedding."""
        import numpy as np

        frames = jnp.asarray(np.asarray(image)[None])
        kps_b = jnp.asarray(np.asarray(kps, dtype=np.float32))[None, None]
        valid = jnp.ones((1, 1), dtype=bool)
        emb = self.embed_batched(frames, kps_b, valid, l2=False)
        return np.asarray(emb[0, 0])
