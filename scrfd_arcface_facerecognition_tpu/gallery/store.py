"""HBM-resident embedding store with the QdrantManager API surface.

API mirror of /root/reference/qdrant_manager.py:17-309 (add_embedding :91,
search_similar :138, delete_embedding :190, get_embedding :228,
get_embedding_count :214, update_embedding :255, clear_all :271), rebuilt
TPU-first:

- embeddings live as one [capacity, D] float32 device array (L2-normalized
  rows), padded to a static capacity so growth never recompiles;
- search is a single cosine matmul + top-k on device (batched: N queries in
  one call — the reference can only search one vector per round-trip);
- payloads/id-mapping are a host-side dict (metadata, not hot path);
- snapshot()/restore() give explicit checkpoint/resume.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import l2_normalize


@jax.jit
def _scatter_rows(emb, valid, pos, vals):
    return emb.at[pos].set(vals), valid.at[pos].set(True)


def _pad_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class SearchHit(NamedTuple):
    id: int
    score: float
    payload: Dict[str, Any]


class GalleryStore:
    def __init__(self, vector_size: int = 512, capacity: int = 1024,
                 distance: str = "cosine"):
        if distance != "cosine":
            raise ValueError("only cosine distance is supported")
        self.vector_size = vector_size
        self.capacity = capacity
        self._emb = jnp.zeros((capacity, vector_size), jnp.float32)
        # Host mirror of the normalized rows: every mutation originates
        # host-side, so reads (snapshot, dense_matrix, get_embedding) never
        # pay a device->host transfer — on remote-PJRT transports that
        # readback is the single slowest op in the store (~3 MB/s measured
        # through an axon tunnel vs ~0.2 s for the 200 MB upload).
        self._host = np.zeros((capacity, vector_size), np.float32)
        self._valid = jnp.zeros((capacity,), bool)
        self._row_of: Dict[int, int] = {}       # external id -> row
        self._id_of: Dict[int, int] = {}        # row -> external id
        self._payloads: Dict[int, Dict[str, Any]] = {}
        self._free: List[int] = list(range(capacity - 1, -1, -1))
        self._topk_jit = jax.jit(self._topk_impl, static_argnames=("k",))
        # change-sets since the last snapshot event (incremental snapshots)
        self._dirty_adds: set = set()
        self._dirty_dels: set = set()

    # ----------------------------------------------------------- internals

    @staticmethod
    def _topk_impl(emb, valid, queries, k):
        q = l2_normalize(queries.astype(jnp.float32))
        sims = jnp.dot(q, emb.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        sims = jnp.where(valid[None, :], sims, -jnp.inf)
        # NaN sims (non-finite query) sort FIRST in top_k, silently eating
        # the k slots; rank them last instead
        sims = jnp.where(jnp.isnan(sims), -jnp.inf, sims)
        return jax.lax.top_k(sims, k)

    def _grow(self, min_capacity: Optional[int] = None) -> None:
        """Double capacity (to at least min_capacity) in ONE array rebuild.

        Growth retriggers jit for the new static shape, so bulk paths pass
        min_capacity to land on the final size in a single step instead of
        log2(target) successive rebuilds; production deployments should
        pre-size via the constructor's capacity argument and never hit this.
        """
        new_cap = self.capacity * 2
        while min_capacity is not None and new_cap < min_capacity:
            new_cap *= 2
        emb = jnp.zeros((new_cap, self.vector_size), jnp.float32)
        emb = emb.at[: self.capacity].set(self._emb)
        valid = jnp.zeros((new_cap,), bool).at[: self.capacity].set(self._valid)
        host = np.zeros((new_cap, self.vector_size), np.float32)
        host[: self.capacity] = self._host
        self._free = list(range(new_cap - 1, self.capacity - 1, -1)) + self._free
        self.capacity = new_cap
        self._emb = emb
        self._host = host
        self._valid = valid

    # ----------------------------------------------------------------- API

    def add_embedding(self, person_id: int, embedding,
                      payload: Optional[Dict[str, Any]] = None) -> bool:
        """Upsert one embedding (qdrant_manager.py:91 semantics)."""
        vec = np.asarray(embedding, dtype=np.float32).reshape(-1)
        if vec.shape[0] != self.vector_size:
            return False
        if not np.all(np.isfinite(vec)):
            # a NaN row would poison every later search (NaN cosines sort
            # first in top-k); refuse it so callers' rollback paths fire
            return False
        if person_id in self._row_of:
            row = self._row_of[person_id]
        else:
            if not self._free:
                self._grow()
            row = self._free.pop()
            self._row_of[person_id] = row
            self._id_of[row] = person_id
        norm = np.linalg.norm(vec)
        vec = vec / max(norm, 1e-12)
        self._emb = self._emb.at[row].set(jnp.asarray(vec))
        self._host[row] = vec
        self._valid = self._valid.at[row].set(True)
        self._payloads[person_id] = dict(payload or {})
        self._dirty_adds.add(person_id)
        self._dirty_dels.discard(person_id)
        return True

    def add_batch(self, ids, embeddings,
                  payloads: Optional[List[Dict[str, Any]]] = None) -> int:
        """Bulk upsert: ONE device scatter for N rows.

        Matches the reference's batched qdrant upsert surface
        (qdrant_manager.py:91-137) and fixes the per-row dispatch cost of
        calling add_embedding in a loop (1M dispatches to restore a 1M-row
        gallery). Later duplicates of the same id win, mirroring sequential
        add_embedding semantics. Returns the number of rows written.
        """
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        mat = np.atleast_2d(np.asarray(embeddings, np.float32))
        if mat.shape[0] != len(ids) or mat.shape[1] != self.vector_size:
            return 0
        finite = np.all(np.isfinite(mat), axis=1)
        if not finite.all():   # refuse NaN/inf rows (see add_embedding)
            keep = np.flatnonzero(finite)
            ids = ids[keep]
            mat = mat[keep]
            if payloads is not None:
                payloads = [payloads[i] for i in keep]
        if payloads is not None and len(payloads) != len(ids):
            raise ValueError("payloads length must match ids")
        if len(ids) == 0:   # a filtered-to-empty batch is a no-op, not an
            return 0        # IndexError in _write_rows' run detection
        # collapse duplicate ids (last write wins) before allocating rows
        last = {int(pid): i for i, pid in enumerate(ids)}
        order = sorted(last.values())
        n_new = sum(1 for i in order if int(ids[i]) not in self._row_of)
        if n_new > len(self._free):
            self._grow(self.capacity + (n_new - len(self._free)))
        rows = np.empty(len(order), np.int64)
        for j, i in enumerate(order):
            pid = int(ids[i])
            row = self._row_of.get(pid)
            if row is None:
                row = self._free.pop()
                self._row_of[pid] = row
                self._id_of[row] = pid
            rows[j] = row
            self._payloads[pid] = dict(payloads[i]) if payloads else {}
            self._dirty_adds.add(pid)
            self._dirty_dels.discard(pid)
        vecs = mat[order]
        vecs = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        self._write_rows(rows, vecs)
        return len(order)

    def _write_rows(self, rows: np.ndarray, vecs: np.ndarray) -> None:
        """Write N normalized rows in O(1) device ops.

        An eager `.at[pos].set` traces + compiles a fresh scatter every call
        (~16 s for 100k rows on a tunneled v5e); instead: sort into
        contiguous runs and use dynamic_update_slice when there are few
        (the restore path is ONE run), else one jitted scatter padded to a
        pow-2 row count so repeat batch sizes reuse the compile cache.
        """
        order = np.argsort(rows, kind="stable")
        rows = rows[order]
        vecs = vecs[order]
        self._host[rows] = vecs
        n = len(rows)
        run_starts = np.flatnonzero(
            np.diff(rows, prepend=rows[0] - 2) != 1)
        if len(run_starts) <= 8:
            bounds = list(run_starts) + [n]
            for a, b in zip(bounds[:-1], bounds[1:]):
                self._emb = jax.lax.dynamic_update_slice(
                    self._emb, jnp.asarray(vecs[a:b]), (int(rows[a]), 0))
                self._valid = jax.lax.dynamic_update_slice(
                    self._valid, jnp.ones(b - a, bool), (int(rows[a]),))
        else:
            pad = _pad_pow2(n)
            # repeat the final row: writing the same data twice is benign
            pos = np.concatenate([rows, np.full(pad - n, rows[-1])])
            vals = np.concatenate([vecs, np.repeat(vecs[-1:], pad - n, 0)])
            self._emb, self._valid = _scatter_rows(
                self._emb, self._valid, jnp.asarray(pos), jnp.asarray(vals))

    def search_similar(self, query, k: int = 5,
                       threshold: Optional[float] = None) -> List[SearchHit]:
        """k-NN over the gallery (qdrant_manager.py:138 semantics)."""
        hits = self.search_batch(np.asarray(query, np.float32).reshape(1, -1),
                                 k=k, threshold=threshold)
        return hits[0]

    def search_batch(self, queries, k: int = 5,
                     threshold: Optional[float] = None) -> List[List[SearchHit]]:
        """Batched k-NN: (Q, D) queries in ONE device matmul."""
        q = np.asarray(queries, np.float32)
        if self.get_embedding_count() == 0:
            return [[] for _ in range(len(q))]
        k_eff = max(1, min(k, self.capacity))
        scores, idx = self._topk_jit(self._emb, self._valid, jnp.asarray(q),
                                     k=k_eff)
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        out: List[List[SearchHit]] = []
        for qi in range(len(q)):
            row_hits = []
            for score, row in zip(scores[qi], idx[qi]):
                if not np.isfinite(score):
                    continue
                if threshold is not None and score < threshold:
                    continue
                pid = self._id_of.get(int(row))
                if pid is None:
                    continue
                row_hits.append(SearchHit(pid, float(score),
                                          self._payloads.get(pid, {})))
            out.append(row_hits)
        return out

    def get_embedding(self, person_id: int) -> Optional[np.ndarray]:
        row = self._row_of.get(person_id)
        if row is None:
            return None
        return self._host[row].copy()

    def get_payload(self, person_id: int) -> Optional[Dict[str, Any]]:
        return self._payloads.get(person_id)

    def update_embedding(self, person_id: int, embedding,
                         payload: Optional[Dict[str, Any]] = None) -> bool:
        if person_id not in self._row_of:
            return False
        return self.add_embedding(person_id, embedding,
                                  payload if payload is not None
                                  else self._payloads.get(person_id))

    def delete_embedding(self, person_id: int) -> bool:
        row = self._row_of.pop(person_id, None)
        if row is None:
            return False
        self._id_of.pop(row, None)
        self._payloads.pop(person_id, None)
        self._valid = self._valid.at[row].set(False)
        self._free.append(row)
        self._dirty_adds.discard(person_id)
        self._dirty_dels.add(person_id)
        return True

    def get_embedding_count(self) -> int:
        return len(self._row_of)

    def clear_all(self) -> bool:
        # record as deletions so incremental snapshots replay the clear
        self._dirty_dels.update(self._row_of.keys())
        self._dirty_adds.clear()
        self._emb = jnp.zeros((self.capacity, self.vector_size), jnp.float32)
        self._host[:] = 0.0
        self._valid = jnp.zeros((self.capacity,), bool)
        self._row_of.clear()
        self._id_of.clear()
        self._payloads.clear()
        self._free = list(range(self.capacity - 1, -1, -1))
        return True

    def ids(self) -> List[int]:
        return list(self._row_of.keys())

    def dense_matrix(self) -> "tuple[np.ndarray, list]":
        """(G, D) matrix of valid embeddings + aligned id list (for G x G
        dedup and sharded search)."""
        ids = sorted(self._row_of.keys())
        if not ids:
            return np.zeros((0, self.vector_size), np.float32), []
        return self._read_rows([self._row_of[i] for i in ids]), ids

    def _read_rows(self, rows) -> np.ndarray:
        """Gather N rows from the host mirror — zero device traffic."""
        return self._host[np.asarray(rows, np.int64)].copy()

    def duplicate_groups(self, threshold: float) -> List[List[int]]:
        """Merge worklist over the resident rows (tier-API parity with
        gallery/auto.py; blocked pair scan past 8k rows)."""
        from .dedup import duplicate_groups

        mat, ids = self.dense_matrix()
        if len(ids) < 2:
            return []
        return duplicate_groups(mat, threshold, ids)

    # ------------------------------------------------------- persistence

    def snapshot(self, path: str) -> None:
        """Write an atomic gallery checkpoint.

        Embeddings + ids go through the native CRC-verified binary store
        (runtime/native.py gs_write); payload metadata rides alongside as
        <path>.meta.json (atomic replace).
        """
        from ..runtime.native import snapshot_write

        mat, ids = self.dense_matrix()
        snapshot_write(path, mat, np.asarray(ids, np.int64))
        meta_tmp = path + ".meta.json.tmp"
        with open(meta_tmp, "w") as f:
            json.dump({str(i): self._payloads.get(i, {}) for i in ids}, f)
        os.replace(meta_tmp, path + ".meta.json")

    @classmethod
    def restore(cls, path: str, capacity: Optional[int] = None) -> "GalleryStore":
        from ..runtime.native import snapshot_read

        vecs, ids = snapshot_read(path)
        payloads = {}
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                payloads = json.load(f)
        cap = capacity or max(1024, 2 * len(ids))
        store = cls(vector_size=int(vecs.shape[1]) if len(vecs) else 512,
                    capacity=cap)
        if len(ids):
            store.add_batch(ids, vecs,
                            [payloads.get(str(int(p)), {}) for p in ids])
        return store

    # ------------------------------------------- incremental persistence

    def snapshot_incremental(self, directory: str) -> str:
        """Write only what changed since the last snapshot call.

        Layout: `base.bin` (full CRC snapshot) + ordered `delta_NNNNN.bin`
        segments (upserts since the previous segment; deletions ride in the
        segment's .meta.json) + an atomically-replaced MANIFEST.json. A
        million-row gallery absorbing a 100-visit batch writes ~6 KB, not
        2 GB. Returns the path written.
        """
        from ..runtime.native import snapshot_write

        os.makedirs(directory, exist_ok=True)
        manifest_path = os.path.join(directory, "MANIFEST.json")
        manifest = {"base": None, "deltas": []}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)

        if manifest["base"] is None:
            path = os.path.join(directory, "base.bin")
            self.snapshot(path)
            manifest = {"base": "base.bin", "deltas": []}
        elif not self._dirty_adds and not self._dirty_dels:
            # nothing changed since the last snapshot: no empty delta
            return os.path.join(directory, manifest["base"])
        else:
            seq = len(manifest["deltas"]) + 1
            name = f"delta_{seq:05d}.bin"
            path = os.path.join(directory, name)
            adds = sorted(self._dirty_adds)
            if adds:
                mat = self._read_rows([self._row_of[i] for i in adds])
            else:
                mat = np.zeros((0, self.vector_size), np.float32)
            snapshot_write(path, mat, np.asarray(adds, np.int64))
            meta_tmp = path + ".meta.json.tmp"
            with open(meta_tmp, "w") as f:
                json.dump({"deleted": sorted(self._dirty_dels),
                           "payloads": {str(i): self._payloads.get(i, {})
                                        for i in adds}}, f)
            os.replace(meta_tmp, path + ".meta.json")
            manifest["deltas"].append(name)

        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)
        self._dirty_adds.clear()
        self._dirty_dels.clear()
        return path

    @classmethod
    def restore_dir(cls, directory: str,
                    capacity: Optional[int] = None) -> "GalleryStore":
        """Rebuild from base + ordered deltas (snapshot_incremental)."""
        from ..runtime.native import snapshot_read

        with open(os.path.join(directory, "MANIFEST.json")) as f:
            manifest = json.load(f)
        store = cls.restore(os.path.join(directory, manifest["base"]),
                            capacity=capacity)
        for name in manifest["deltas"]:
            path = os.path.join(directory, name)
            vecs, ids = snapshot_read(path)
            meta = {"deleted": [], "payloads": {}}
            if os.path.exists(path + ".meta.json"):
                with open(path + ".meta.json") as f:
                    meta = json.load(f)
            if len(ids):
                store.add_batch(
                    ids, vecs,
                    [meta["payloads"].get(str(int(p)), {}) for p in ids])
            for pid in meta["deleted"]:
                store.delete_embedding(int(pid))
        store._dirty_adds.clear()
        store._dirty_dels.clear()
        return store

    @staticmethod
    def compact_snapshots(directory: str) -> None:
        """Fold all deltas into a fresh base (bounds restore time and
        reclaims space from deleted/overwritten rows)."""
        store = GalleryStore.restore_dir(directory)
        tmp_base = os.path.join(directory, "base.bin.compact")
        store.snapshot(tmp_base)
        manifest_path = os.path.join(directory, "MANIFEST.json")
        with open(manifest_path) as f:
            old_deltas = json.load(f)["deltas"]
        os.replace(tmp_base, os.path.join(directory, "base.bin"))
        os.replace(tmp_base + ".meta.json",
                   os.path.join(directory, "base.bin.meta.json"))
        # Crash-safety ordering: point the manifest at the compacted base
        # BEFORE removing delta files. Replaying the old deltas over the
        # compacted base is idempotent (same upserts, already-gone deletes),
        # but a manifest referencing deleted files would break restore_dir.
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"base": "base.bin", "deltas": []}, f)
        os.replace(tmp, manifest_path)
        for name in old_deltas:
            for suffix in ("", ".meta.json"):
                try:
                    os.remove(os.path.join(directory, name + suffix))
                except OSError:
                    pass
