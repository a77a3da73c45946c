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
        return jax.lax.top_k(sims, k)

    def _grow(self) -> None:
        new_cap = self.capacity * 2
        emb = jnp.zeros((new_cap, self.vector_size), jnp.float32)
        emb = emb.at[: self.capacity].set(self._emb)
        valid = jnp.zeros((new_cap,), bool).at[: self.capacity].set(self._valid)
        self._free = list(range(new_cap - 1, self.capacity - 1, -1)) + self._free
        self.capacity = new_cap
        self._emb = emb
        self._valid = valid

    # ----------------------------------------------------------------- API

    def add_embedding(self, person_id: int, embedding,
                      payload: Optional[Dict[str, Any]] = None) -> bool:
        """Upsert one embedding (qdrant_manager.py:91 semantics)."""
        vec = np.asarray(embedding, dtype=np.float32).reshape(-1)
        if vec.shape[0] != self.vector_size:
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
        self._valid = self._valid.at[row].set(True)
        self._payloads[person_id] = dict(payload or {})
        self._dirty_adds.add(person_id)
        self._dirty_dels.discard(person_id)
        return True

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
        return np.asarray(self._emb[row])

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
        rows = [self._row_of[i] for i in ids]
        return np.asarray(self._emb[jnp.asarray(rows)]), ids

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
        for pid, vec in zip(ids, vecs):
            store.add_embedding(int(pid), vec, payloads.get(str(int(pid)), {}))
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
                rows = [self._row_of[i] for i in adds]
                mat = np.asarray(self._emb[jnp.asarray(rows)])
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
            for pid, vec in zip(ids, vecs):
                store.add_embedding(
                    int(pid), vec, meta["payloads"].get(str(int(pid)), {}))
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
        os.replace(tmp_base, os.path.join(directory, "base.bin"))
        os.replace(tmp_base + ".meta.json",
                   os.path.join(directory, "base.bin.meta.json"))
        manifest_path = os.path.join(directory, "MANIFEST.json")
        with open(manifest_path) as f:
            manifest = json.load(f)
        for name in manifest["deltas"]:
            for suffix in ("", ".meta.json"):
                try:
                    os.remove(os.path.join(directory, name + suffix))
                except OSError:
                    pass
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"base": "base.bin", "deltas": []}, f)
        os.replace(tmp, manifest_path)
