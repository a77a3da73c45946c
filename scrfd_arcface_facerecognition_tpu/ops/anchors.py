"""SCRFD anchor-center grids.

Replicates the anchor layout of the reference detector
(/root/reference/models/scrfd.py:96-107): for each FPN stride s the anchor
centers form an (H/s, W/s) grid of pixel coordinates (x, y) = (col*s, row*s),
repeated ``num_anchors`` times per location, flattened row-major so that the
layout matches the detector head's flattened output exactly:

    index = (row * width + col) * num_anchors + anchor

All grids are static (input size is static under jit), so they are computed
at trace time as constants folded into the compiled program.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

SCRFD_STRIDES: Tuple[int, ...] = (8, 16, 32)  # scrfd.py:40
SCRFD_NUM_ANCHORS: int = 2                    # scrfd.py:41


@functools.lru_cache(maxsize=128)
def _anchor_centers_np(height: int, width: int, stride: int, num_anchors: int) -> np.ndarray:
    cols = np.arange(width, dtype=np.float32) * stride
    rows = np.arange(height, dtype=np.float32) * stride
    xs, ys = np.meshgrid(cols, rows)                      # (H, W) each
    centers = np.stack([xs, ys], axis=-1).reshape(-1, 2)  # (H*W, 2), row-major
    centers = np.repeat(centers, num_anchors, axis=0)     # (H*W*A, 2)
    return centers


def anchor_centers(height: int, width: int, stride: int,
                   num_anchors: int = SCRFD_NUM_ANCHORS) -> jnp.ndarray:
    """(H*W*A, 2) float32 anchor centers in input-image pixels."""
    return jnp.asarray(_anchor_centers_np(height, width, stride, num_anchors))


def scrfd_anchor_table(input_size: Tuple[int, int],
                       strides: Sequence[int] = SCRFD_STRIDES,
                       num_anchors: int = SCRFD_NUM_ANCHORS) -> jnp.ndarray:
    """Concatenated anchor centers for all strides at ``input_size``.

    ``input_size`` is (height, width). For 640x640 this yields
    (80*80 + 40*40 + 20*20) * 2 = 16800 rows, ordered stride-8 first —
    the same concatenation order as the reference's np.vstack over
    scores_list/bboxes_list (scrfd.py:142-148).
    """
    h, w = input_size
    tables = [
        _anchor_centers_np(h // s, w // s, s, num_anchors) for s in strides
    ]
    return jnp.asarray(np.concatenate(tables, axis=0))


def num_anchors_total(input_size: Tuple[int, int],
                      strides: Sequence[int] = SCRFD_STRIDES,
                      num_anchors: int = SCRFD_NUM_ANCHORS) -> int:
    h, w = input_size
    return sum((h // s) * (w // s) * num_anchors for s in strides)
