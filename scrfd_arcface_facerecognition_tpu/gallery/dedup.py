"""Duplicate detection / merging over the whole gallery as one G x G matmul.

Replaces the reference's find_and_merge_duplicates loop
(/root/reference/smart_face_recognition.py:2726-2792: per-person Qdrant
queries, O(G) round-trips) with a single tiled cosine matmul on the MXU
followed by a host-side union-find over the thresholded pairs — the exact
computation BASELINE.json config 4 asks for.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import l2_normalize


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.jit
def _sim_kernel(embs: jnp.ndarray) -> jnp.ndarray:
    e = l2_normalize(embs.astype(jnp.float32))
    return jnp.dot(e, e.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def all_pairs_similarity(embeddings: np.ndarray, pad_to: int = 128) -> np.ndarray:
    """(G, D) -> (G, G) cosine matrix, computed on device in one shot.

    Rows are padded to an MXU-friendly multiple so recompiles are rare.
    """
    g = embeddings.shape[0]
    if g == 0:
        return np.zeros((0, 0), np.float32)
    gp = _round_up(g, pad_to)
    buf = np.zeros((gp, embeddings.shape[1]), np.float32)
    buf[:g] = embeddings
    sims = np.asarray(_sim_kernel(jnp.asarray(buf)))[:g, :g]
    return sims


def find_duplicate_pairs(embeddings: np.ndarray, threshold: float,
                         ids: Sequence[int] = None) -> List[Tuple[int, int, float]]:
    """All (id_i, id_j, sim) with i<j and sim >= threshold.

    Pair semantics match smart_face_recognition.py:2769-2788 (id2 > id1,
    each unordered pair reported once).
    """
    sims = all_pairs_similarity(embeddings)
    g = sims.shape[0]
    if ids is None:
        ids = list(range(g))
    iu, ju = np.triu_indices(g, k=1)
    hits = sims[iu, ju] >= threshold
    return [(ids[i], ids[j], float(sims[i, j]))
            for i, j in zip(iu[hits], ju[hits])]


class UnionFind:
    """Host-side union-find for transitive duplicate grouping."""

    def __init__(self, items: Sequence[int]):
        self.parent = {i: i for i in items}

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # smaller id wins, mirroring "merge person2 into person1"
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def duplicate_groups(embeddings: np.ndarray, threshold: float,
                     ids: Sequence[int] = None) -> List[List[int]]:
    """Group transitively-duplicate identities; each group sorted ascending,
    groups of size >= 2 only (the merge worklist: keep group[0], merge rest).

    Grouping runs through the native C union-find (runtime/native.py
    uf_group_roots, Python fallback inside) — ids map to their ascending
    rank so the min-rank root is the min id, preserving the "merge into
    the smaller id" semantics (smart_face_recognition.py:2788)."""
    from ..runtime.native import uf_group_roots

    g = embeddings.shape[0]
    if ids is None:
        ids = list(range(g))
    pairs = find_duplicate_pairs(embeddings, threshold, ids)
    if not pairs:
        return []
    order = sorted(ids)
    rank = {pid: r for r, pid in enumerate(order)}
    idx_pairs = np.asarray([(rank[a], rank[b]) for a, b, _ in pairs],
                           np.int64)
    roots = uf_group_roots(len(order), idx_pairs)
    groups = {}
    for r, pid in zip(roots, order):
        groups.setdefault(int(r), []).append(pid)
    return sorted([sorted(v) for v in groups.values() if len(v) > 1])
