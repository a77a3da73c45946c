"""Embedding similarity: L2-normalize, cosine, batched gallery matching.

Replicates /root/reference/utils/helpers.py:110-123 (compute_similarity)
and replaces the reference's per-target Python loop (main.py:136-142) and
per-person Qdrant queries (qdrant_manager.py:138-188) with single matmuls:
the gallery is a [G, 512] HBM-resident matrix, matching is query @ gallery.T
on the MXU followed by top-k.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps)).astype(x.dtype)


def compute_similarity(feat1: jnp.ndarray, feat2: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity of two flat feature vectors (helpers.py:110-123)."""
    f1 = feat1.reshape(-1).astype(jnp.float32)
    f2 = feat2.reshape(-1).astype(jnp.float32)
    denom = jnp.linalg.norm(f1) * jnp.linalg.norm(f2)
    return jnp.dot(f1, f2) / jnp.maximum(denom, 1e-12)


def cosine_matrix(queries: jnp.ndarray, gallery: jnp.ndarray,
                  normalized: bool = False) -> jnp.ndarray:
    """(Q, D) x (G, D) -> (Q, G) cosine-similarity matrix, one MXU matmul.

    This is the TPU replacement for both the linear target scan
    (main.py:136-142) and Qdrant search (qdrant_manager.py:138); with
    queries == gallery it is the all-pairs G x G duplicate-detection matrix
    (smart_face_recognition.py:2726-2792 semantics).
    """
    q = queries.astype(jnp.float32)
    g = gallery.astype(jnp.float32)
    if not normalized:
        q = l2_normalize(q)
        g = l2_normalize(g)
    return jnp.dot(q, g.T, preferred_element_type=jnp.float32)


def top_k_matches(queries: jnp.ndarray, gallery: jnp.ndarray, k: int,
                  normalized: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k gallery matches per query: (Q, k) scores and (Q, k) indices."""
    sims = cosine_matrix(queries, gallery, normalized=normalized)
    k = min(k, sims.shape[-1])
    return jax.lax.top_k(sims, k)
