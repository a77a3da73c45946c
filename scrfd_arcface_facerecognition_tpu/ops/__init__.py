"""Pure-JAX numerics layer: cv2/skimage-parity ops, all batched + jittable.

Each op documents the reference semantics it replicates (file:line in
/root/reference) and is unit-tested against a cv2/numpy oracle.
"""

from .anchors import anchor_centers, scrfd_anchor_table
from .decode import distance2bbox, distance2kps
from .normalize import normalize_image, SCRFD_MEAN, SCRFD_STD, ARCFACE_MEAN, ARCFACE_STD
from .resize import (resize_bilinear, resize_bilinear_u8_exact,
                     letterbox, letterbox_plan, letterbox_matrices,
                     letterbox_dynamic,
                     tight_letterbox_plan, LetterboxPlan)
from .similarity import l2_normalize, compute_similarity, cosine_matrix, top_k_matches
from .umeyama import umeyama_similarity, estimate_norm, ARCFACE_DST
from .warp import warp_affine, invert_affine, norm_crop
from .nms import nms_mask, nms_mask_blocked, select_top_faces

__all__ = [
    "anchor_centers", "scrfd_anchor_table",
    "distance2bbox", "distance2kps",
    "normalize_image", "SCRFD_MEAN", "SCRFD_STD", "ARCFACE_MEAN", "ARCFACE_STD",
    "resize_bilinear", "resize_bilinear_u8_exact", "letterbox",
    "letterbox_plan", "letterbox_matrices", "letterbox_dynamic",
    "tight_letterbox_plan", "LetterboxPlan",
    "l2_normalize", "compute_similarity", "cosine_matrix", "top_k_matches",
    "umeyama_similarity", "estimate_norm", "ARCFACE_DST",
    "warp_affine", "invert_affine", "norm_crop",
    "nms_mask", "nms_mask_blocked", "select_top_faces",
]
