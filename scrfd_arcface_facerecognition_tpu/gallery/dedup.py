"""Duplicate detection / merging over the whole gallery as one G x G matmul.

Replaces the reference's find_and_merge_duplicates loop
(/root/reference/smart_face_recognition.py:2726-2792: per-person Qdrant
queries, O(G) round-trips) with a single tiled cosine matmul on the MXU
followed by a host-side union-find over the thresholded pairs — the exact
computation BASELINE.json config 4 asks for.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

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


def _block_topk_core(emb_n, row0, k, block, g):
    """One row block vs the full (Gp, D) PRE-NORMALIZED gallery: per-row
    top-k of the strictly-upper triangle (col > global row), so each
    unordered pair surfaces exactly once across blocks. The block is
    sliced ON DEVICE (no per-block upload, no per-block re-normalize —
    normalizing the full matrix inside every block call tripled the 1M
    scan's runtime)."""
    blk = jax.lax.dynamic_slice(emb_n, (row0, 0), (block, emb_n.shape[1]))
    sims = jnp.dot(blk, emb_n.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    cols = jnp.arange(emb_n.shape[0])[None, :]
    rows = row0 + jnp.arange(block)[:, None]
    sims = jnp.where((cols > rows) & (cols < g), sims, -jnp.inf)
    return jax.lax.top_k(sims, k)


@functools.partial(jax.jit, static_argnames=("k", "block", "g", "nblocks"))
def _blocks_topk(emb_n, row0_start, k, block, g, nblocks):
    """`nblocks` consecutive row blocks in ONE dispatch (lax.scan).

    A per-block dispatch+readback pays the transport round-trip 2000 times
    at G=1M (per-block sync latency dominated the scan: 557 s measured vs
    ~200 s of actual compute on a tunneled v5e); chunking amortizes it to
    ~60 dispatches with a (nblocks, block, k) readback each."""
    def body(_, i):
        s, j = _block_topk_core(emb_n, row0_start + i * block, k, block, g)
        return None, (s, j)

    _, (ss, jj) = jax.lax.scan(body, None, jnp.arange(nblocks))
    return ss, jj


def find_duplicate_pairs_blocked(
        embeddings: np.ndarray, threshold: float,
        ids: Optional[Sequence[int]] = None, block: int = 4096,
        k_neighbors: int = 16) -> List[Tuple[int, int, float]]:
    """All (id_i, id_j, sim) with i<j and sim >= threshold — BLOCKED.

    The one-shot formulation (find_duplicate_pairs) materializes the full
    (G, G) similarity matrix on the host: 40 GB at G=100k, impossible at
    the 1M+ scale the capacity tiers serve. This version streams (block, G)
    device matmuls and reads back only each row's top `k_neighbors`
    candidates (block x k x 8 B per step — ~0.5 MB), so host memory is
    O(G x k), device memory O(G x D + block x G).

    k_neighbors caps the duplicates detectable PER ROW per pass; rows at
    the cap are re-queried against their own above-threshold tail (rare —
    a real gallery has a handful of duplicates per person). Grouping
    semantics are identical to find_duplicate_pairs (verified in
    tests/test_gallery.py).
    """
    mat = np.asarray(embeddings, np.float32)
    g = mat.shape[0]
    if ids is None:
        ids = list(range(g))
    if g < 2:
        return []
    # the (block, G) f32 similarity slab must fit HBM next to the (G, D)
    # rows: cap it at ~2 GB (block 512 at G=1M)
    block = max(128, min(block, (2 << 30) // max(4 * g, 1)))
    k = min(k_neighbors, g)
    gp = -(-g // block) * block
    emb_pad = mat if gp == g else np.pad(mat, ((0, gp - g), (0, 0)))
    # normalize ONCE on device; padded rows are zero (masked by col < g)
    emb_dev = l2_normalize(jnp.asarray(emb_pad))
    pairs: List[Tuple[int, int, float]] = []
    saturated: List[int] = []
    n_total = gp // block
    chunk = min(32, n_total)             # blocks per dispatch
    for c0 in range(0, n_total, chunk):
        nb = min(chunk, n_total - c0)
        ss, jj = _blocks_topk(emb_dev, c0 * block, k, block, g, nb)
        ss = np.asarray(ss)
        jj = np.asarray(jj)
        for b in range(nb):
            r0 = (c0 + b) * block
            if r0 >= g:
                break
            s = ss[b][:min(block, g - r0)]
            j = jj[b][:min(block, g - r0)]
            hit = s >= threshold
            for bi in np.nonzero(hit.any(axis=1))[0]:
                row = r0 + int(bi)
                for col, sim in zip(j[bi][hit[bi]], s[bi][hit[bi]]):
                    pairs.append((ids[row], ids[int(col)], float(sim)))
                if hit[bi].all():
                    saturated.append(row)
    # rows whose ENTIRE top-k cleared the threshold may have more
    # duplicates past the cap: rescan those rows exactly (full-width).
    # Two scaling hazards on duplicate-heavy galleries, both handled:
    # index the found pairs ONCE (re-filtering the full pair list per row
    # is O(saturated x total_pairs) host time — 1e10 comparisons at 10k
    # rows x 1M pairs), and rescan rows in BATCHED device calls (one
    # dispatch per row pays the tunnel round-trip per saturated row; a
    # (chunk, G) matmul pays it once per chunk).
    if saturated:
        have_by_row: dict = {}
        for a, b, _ in pairs:
            have_by_row.setdefault(a, set()).add(b)
        cols_idx = np.arange(g)
        # same HBM cap as the main scan: chunk x Gp f32 slab next to rows
        chunk = max(1, min(256, (2 << 30) // max(4 * g, 1)))
        for c0 in range(0, len(saturated), chunk):
            rows = saturated[c0:c0 + chunk]
            sims = np.asarray(_sim_rows(
                emb_dev, jnp.asarray(mat[rows])))[:, :g]
            for ri, row in enumerate(rows):
                extra = np.nonzero((sims[ri] >= threshold)
                                   & (cols_idx > row))[0]
                have = have_by_row.get(ids[row], set())
                for col in extra:
                    if ids[int(col)] not in have:
                        pairs.append((ids[row], ids[int(col)],
                                      float(sims[ri, int(col)])))
    return pairs


@jax.jit
def _sim_rows(emb_norm, row_vecs):
    """A chunk of rows' exact similarities: (chunk, D) x (Gp, D)^T.
    emb_norm is ALREADY normalized by the caller
    (find_duplicate_pairs_blocked normalizes once, up front) —
    re-normalizing here cost a full (Gp, D) pass per saturated chunk."""
    r = l2_normalize(row_vecs.astype(jnp.float32))
    return jnp.dot(r, emb_norm.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


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
                     ids: Sequence[int] = None,
                     block_above: int = 8192) -> List[List[int]]:
    """Group transitively-duplicate identities; each group sorted ascending,
    groups of size >= 2 only (the merge worklist: keep group[0], merge rest).

    Past `block_above` rows the pair scan switches to the blocked
    formulation (find_duplicate_pairs_blocked): the one-shot G x G host
    matrix is 40 GB at G=100k and the capacity tiers go to millions.

    Grouping runs through the native C union-find (runtime/native.py
    uf_group_roots, Python fallback inside) — ids map to their ascending
    rank so the min-rank root is the min id, preserving the "merge into
    the smaller id" semantics (smart_face_recognition.py:2788)."""
    from ..runtime.native import uf_group_roots

    g = embeddings.shape[0]
    if ids is None:
        ids = list(range(g))
    if g > block_above:
        pairs = find_duplicate_pairs_blocked(embeddings, threshold, ids)
    else:
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
