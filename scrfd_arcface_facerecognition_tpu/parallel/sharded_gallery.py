"""Gallery sharding over the mesh: local matmul + top-k + ICI all_gather.

For galleries too large for one chip's HBM (or to scale search throughput),
the [G, D] matrix shards row-wise over the 'model' axis. Search is:

    per shard:  sims = q @ gallery_shard.T        (MXU, local)
                local (k) top-k + global row offset
    collective: all_gather of (k, score) candidates over ICI
    final:      top-k of the m*k candidates (replicated, tiny)

This is the framework's one genuine collective (SURVEY.md §2.3) — the
all_gather moves Q*k*m scores, not the G-sized similarity row.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import l2_normalize


def _local_topk(q_block, g_block, valid_block, k: int, axis: str):
    """Runs per-shard inside shard_map."""
    sims = jnp.dot(q_block, g_block.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)      # (Q, G/m)
    sims = jnp.where(valid_block[None, :], sims, -jnp.inf)
    rows_per_shard = g_block.shape[0]
    k_local = min(k, rows_per_shard)
    scores, idx = jax.lax.top_k(sims, k_local)               # (Q, k_local)
    shard = jax.lax.axis_index(axis)
    global_idx = idx + shard * rows_per_shard
    # gather candidates from every shard: (Q, m*k_local)
    all_scores = jax.lax.all_gather(scores, axis, axis=1, tiled=True)
    all_idx = jax.lax.all_gather(global_idx, axis, axis=1, tiled=True)
    final_scores, pos = jax.lax.top_k(all_scores, min(k, all_scores.shape[1]))
    final_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return final_scores, final_idx


def sharded_top_k(queries: jnp.ndarray, gallery: jnp.ndarray,
                  valid: jnp.ndarray, k: int, mesh: Mesh,
                  axis: str = "model") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k search over a row-sharded gallery.

    queries (Q, D) replicated; gallery (G, D) and valid (G,) sharded on
    `axis` (G divisible by the axis size). Returns replicated (Q, k)
    scores and global row indices.
    """
    fn = jax.shard_map(
        functools.partial(_local_topk, k=k, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, gallery, valid)


class ShardedGallery:
    """A device-sharded gallery matrix with top-k search.

    Rows are padded to a multiple of the mesh axis size; search results are
    identical to the single-device cosine top-k (tests/test_parallel.py).
    """

    def __init__(self, embeddings: np.ndarray, mesh: Mesh, axis: str = "model"):
        self.mesh = mesh
        self.axis = axis
        m = mesh.shape[axis]
        g, d = embeddings.shape
        g_pad = max(1, -(-g // m)) * m
        buf = np.zeros((g_pad, d), np.float32)
        buf[:g] = embeddings
        valid = np.zeros((g_pad,), bool)
        valid[:g] = True
        norm = np.linalg.norm(buf, axis=1, keepdims=True)
        buf = buf / np.maximum(norm, 1e-12)
        self.size = g
        self._emb = jax.device_put(buf, NamedSharding(mesh, P(axis, None)))
        self._valid = jax.device_put(valid, NamedSharding(mesh, P(axis)))
        self._search = jax.jit(
            functools.partial(sharded_top_k, mesh=mesh, axis=axis),
            static_argnames=("k",))

    def search(self, queries, k: int = 5) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, D) -> (Q, k) scores + global indices (numpy).

        k clamps to the REAL row count (padding rows are -inf-masked and
        must never surface as result indices)."""
        q = l2_normalize(jnp.asarray(np.asarray(queries, np.float32)))
        k_eff = max(1, min(k, self.size))
        scores, idx = self._search(q, self._emb, self._valid, k=k_eff)
        return np.asarray(scores), np.asarray(idx)
