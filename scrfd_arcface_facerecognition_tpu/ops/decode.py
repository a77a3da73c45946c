"""Distance-to-box / distance-to-keypoint decoding.

Replicates /root/reference/utils/helpers.py:62-107 with batch support.
The reference operates on (N, 2) points and (N, 4) / (N, 2K) distances;
here every function also accepts leading batch dimensions.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray,
                  max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Decode (left, top, right, bottom) distances into x1y1x2y2 boxes.

    points: (..., N, 2); distance: (..., N, 4) -> (..., N, 4).
    Mirrors helpers.py:62-83.
    """
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2kps(points: jnp.ndarray, distance: jnp.ndarray,
                 max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Decode keypoint offsets into absolute keypoints.

    points: (..., N, 2); distance: (..., N, 2K) -> (..., N, K, 2).
    Mirrors helpers.py:86-107 (where px = cx + d[2i], py = cy + d[2i+1];
    the reference's ``points[:, i % 2]`` is always column 0/1 since i is even).
    """
    k = distance.shape[-1] // 2
    d = distance.reshape(distance.shape[:-1] + (k, 2))
    kps = points[..., None, :] + d  # broadcast centers over K keypoints
    if max_shape is not None:
        kx = jnp.clip(kps[..., 0], 0, max_shape[1])
        ky = jnp.clip(kps[..., 1], 0, max_shape[0])
        kps = jnp.stack([kx, ky], axis=-1)
    return kps
