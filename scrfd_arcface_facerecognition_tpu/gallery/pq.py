"""Product-quantized gallery tier: million-identity search in HBM.

The dense GalleryStore holds [G, 512] f32 rows — 2 GB/chip at G=1M, which
crowds out the model. This tier compresses each embedding to M uint8 codes
(default M=64: one code per 8-dim subspace, 256 centroids each) — 64 B/row,
a 32x reduction — and searches with asymmetric distance computation (ADC):

    LUT[m, k]  = q_m . centroid[m, k]          (one small matmul per query
                                                batch — MXU)
    score[g]   = sum_m LUT[m, codes[g, m]]     (table lookups — VPU)

Training is batched Lloyd's k-means over all M subspaces at once (the
assignment and update steps are einsums, so the whole codec trains on
device). Everything is static-shape: capacity-padded codes, validity mask.

This is the "long-context" scaling tier of SURVEY.md §5: the dense store
serves galleries that fit HBM exactly; PQ serves the regime beyond it;
both shard over the mesh ('model' axis) with the same local-score
+ all_gather top-k collective (sharded_pq_top_k).

Measured on v5e at G=1M, Q=16: dense f32 matmul search 6.7 ms (2 GB HBM)
vs PQ ADC 243 ms (64 MB) — the MXU matmul beats the VPU table gathers
whenever the dense matrix FITS, so use GalleryStore until HBM is the
constraint (≈5M+ identities per chip alongside the models, or sharded
further over the mesh) and PQ past it. PQ's ADC cost scales linearly, and
the sharded variant divides G per chip.

No counterpart exists in the reference (Qdrant in ":memory:" mode is a
pure-Python scan, qdrant_manager.py:40-43).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class PQCodec:
    """Per-subspace k-means codebooks. dim = M * sub_dim."""
    centroids: jnp.ndarray        # (M, K, sub_dim) f32

    def __post_init__(self):
        if self.centroids.shape[1] > 256:
            # codes are uint8: a larger codebook would silently wrap
            # assignments modulo 256 in encode()
            raise ValueError(
                f"k={self.centroids.shape[1]} > 256 does not fit uint8 "
                f"codes")

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def k(self) -> int:
        return self.centroids.shape[1]

    @property
    def sub_dim(self) -> int:
        return self.centroids.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.sub_dim

    # ------------------------------------------------------------- train

    @staticmethod
    def train(embeddings: np.ndarray, m: int = 64, k: int = 256,
              iters: int = 20, seed: int = 0,
              chunk: int = 8192) -> "PQCodec":
        """Batched Lloyd's k-means, all M subspaces in parallel on device.

        embeddings (N, dim) with dim % m == 0; N should be >= ~4k for a
        256-centroid codebook (empty clusters re-seed from the data).

        The assignment/update einsums scan over `chunk`-row blocks so peak
        device memory is O(M*chunk*K) regardless of corpus size (the
        unblocked formulation materialized two (M, N, K) tensors — ~13 GB
        at a typical N=100k corpus, crowding out the models this tier
        exists to protect).
        """
        x = np.asarray(embeddings, np.float32)
        n, dim = x.shape
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        if k > 256:
            raise ValueError(f"k={k} > 256 does not fit uint8 codes")
        sub = dim // m
        data_np = x.reshape(n, m, sub).transpose(1, 0, 2)            # (M,N,S)
        rng = np.random.default_rng(seed)
        k_eff = min(k, n)
        init_idx = rng.choice(n, size=k_eff, replace=False)
        # host-side init gather: an eager device fancy-gather compiles a
        # fresh scatter/gather program (minutes through a remote compiler)
        cent = jnp.asarray(data_np[:, init_idx, :])                  # (M,K,S)
        # re-seed VALUES precomputed on host (tiny: iters*M*K*S f32) —
        # avoids keeping a second full-data layout around for the gather
        reseed_idx = rng.choice(n, size=(iters, k_eff))
        reseed = jnp.asarray(
            data_np[:, reseed_idx.reshape(-1), :]
            .reshape(m, iters, k_eff, sub).transpose(1, 0, 2, 3))

        c = min(chunk, n)
        n_pad = -(-n // c) * c
        dpad = np.zeros((m, n_pad, sub), np.float32)
        dpad[:, :n] = data_np
        w = np.zeros(n_pad, np.float32)
        w[:n] = 1.0                          # padded rows carry zero weight
        data_sc = jnp.asarray(
            dpad.reshape(m, n_pad // c, c, sub).transpose(1, 0, 2, 3))
        w_sc = jnp.asarray(w.reshape(n_pad // c, c))

        @jax.jit
        def step(cent, rs_vals):
            c2 = jnp.sum(cent * cent, axis=-1)                       # (M,K)

            def body(carry, inp):
                counts, sums = carry
                data_c, w_c = inp                                # (M,C,S),(C,)
                # assignment: argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c)
                xc = jnp.einsum("mcs,mks->mck", data_c, cent)
                assign = jnp.argmin(c2[:, None, :] - 2.0 * xc, axis=-1)
                oh = (jax.nn.one_hot(assign, k_eff, dtype=jnp.float32)
                      * w_c[None, :, None])
                return (counts + jnp.sum(oh, axis=1),
                        sums + jnp.einsum("mck,mcs->mks", oh, data_c)), None

            (counts, sums), _ = jax.lax.scan(
                body,
                (jnp.zeros((m, k_eff), jnp.float32),
                 jnp.zeros((m, k_eff, sub), jnp.float32)),
                (data_sc, w_sc))
            new = sums / jnp.maximum(counts[..., None], 1.0)
            # re-seed empty clusters from random data points
            return jnp.where(counts[..., None] > 0, new, rs_vals)

        for i in range(iters):
            cent = step(cent, reseed[i])
        return PQCodec(centroids=cent)

    # ----------------------------------------------------- encode/decode

    def encode(self, embeddings, chunk: int = 16384) -> jnp.ndarray:
        """(N, dim) -> (N, M) uint8 codes.

        Blocked over `chunk` rows: the (N, M, K) distance tensor of the
        one-shot formulation is 64 GB at the advertised 1M-row bulk add —
        blocking caps peak memory at (chunk, M, K) with one compiled
        program reused for every block."""
        x = np.asarray(embeddings, np.float32)
        n = x.shape[0]
        if n <= chunk:
            return _encode_block(self.centroids, jnp.asarray(x))
        out = np.empty((n, self.m), np.uint8)
        for i0 in range(0, n, chunk):
            blk = x[i0:i0 + chunk]
            if len(blk) < chunk:             # pad: one program for all blocks
                blk = np.pad(blk, ((0, chunk - len(blk)), (0, 0)))
            codes = np.asarray(_encode_block(self.centroids,
                                             jnp.asarray(blk)))
            out[i0:i0 + chunk] = codes[:len(out) - i0]
        return jnp.asarray(out)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """(N, M) uint8 -> (N, dim) reconstruction."""
        c = jnp.take_along_axis(
            self.centroids[None], codes.astype(jnp.int32)[:, :, None, None],
            axis=2)[:, :, 0, :]                                      # (N,M,S)
        return c.reshape(codes.shape[0], self.dim)

    def lut(self, queries) -> jnp.ndarray:
        """(Q, dim) -> (Q, M, K) inner-product lookup tables.

        Tracer-safe (jnp coercion, no host round-trip): PQGallery jit-fuses
        this into its compiled search program."""
        q = jnp.asarray(queries, dtype=jnp.float32)
        qs = q.reshape(q.shape[0], self.m, self.sub_dim)
        return jnp.einsum("qms,mks->qmk", qs, self.centroids)


@jax.jit
def _encode_block(centroids: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(C, dim) block -> (C, M) uint8 codes (PQCodec.encode body)."""
    m, _, sub = centroids.shape
    data = x.reshape(x.shape[0], m, sub)
    xc = jnp.einsum("nms,mks->nmk", data, centroids)
    c2 = jnp.sum(centroids * centroids, axis=-1)                  # (M,K)
    return jnp.argmin(c2[None] - 2.0 * xc, axis=-1).astype(jnp.uint8)


def adc_scores(lut: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """(Q, M, K) LUTs x (G, M) codes -> (Q, G) inner-product scores.

    Accumulated with a scan over the M subspaces: a one-shot gather would
    materialize (Q, M, G) — 32 GB at the advertised G=1M scale — while the
    scan's live state is one (Q, G) accumulator plus a (Q, K) table slice.
    """
    q = lut.shape[0]
    g = codes.shape[0]
    codes_t = codes.astype(jnp.int32).T                      # (M, G)
    lut_m_major = jnp.swapaxes(lut, 0, 1)                    # (M, Q, K)

    def body(acc, inputs):
        lut_m, c_m = inputs                                  # (Q, K), (G,)
        return acc + jnp.take(lut_m, c_m, axis=1), None

    acc, _ = jax.lax.scan(body, jnp.zeros((q, g), jnp.float32),
                          (lut_m_major, codes_t))
    return acc


def _adc_mxu_kernel(codes_ref, lut_ref, out_ref, *, hilo: bool = True):
    """One G-block of ADC as one-hot x LUT matmuls on the MXU.

    codes_ref (M, Gb) int32; lut_ref (M, Q, K) f32; out_ref (Q, Gb) f32.
    Per subspace m: onehot (K, Gb) = (iota_K == codes_m) in bf16 (exact:
    entries are 0/1), then lut_m @ onehot -> (Q, Gb) accumulated in f32.
    The one-hot never leaves VMEM — the table lookup the VPU gather
    formulation serializes becomes dense MXU work instead.

    hilo=True: the f32 LUT rides the bf16 MXU as a hi/lo mantissa split
    (the pallas_warp._hilo technique): hi = bf16(lut), lo =
    bf16((lut-hi)*2^9), two matmuls whose f32-accumulated sum carries ~17
    mantissa bits — this matches the f32 scan path to ~1e-6 relative
    instead of the ~2e-3 a single bf16 cast costs (near-tie top-k orders
    agree across adc_impl choices). The 2^9 scale also blocks XLA's
    dot(A,hi)+dot(A,lo) -> dot(A,hi+lo) rewrite, which would silently undo
    the split. hilo=False halves the MXU work for searches whose shortlist
    is exactly reranked anyway (AutoGallery keep_exact): PQ quantization
    error dwarfs the 2e-3, and the rerank re-orders with true cosines.
    """
    m_total, q, k = lut_ref.shape
    gb = codes_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, gb), 0)

    def body(m, acc):
        c = codes_ref[pl.ds(m, 1), :]                       # (1, Gb)
        onehot = (row_ids == c).astype(jnp.bfloat16)        # (K, Gb)
        lut_m = lut_ref[pl.ds(m, 1)].reshape(q, k)          # f32
        hi = lut_m.astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            hi, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if not hilo:
            return acc
        lo = ((lut_m - hi.astype(jnp.float32)) * 512.0).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            lo, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (1.0 / 512.0)

    out_ref[:] = jax.lax.fori_loop(
        0, m_total, body, jnp.zeros((q, gb), jnp.float32))


def adc_scores_mxu(lut: jnp.ndarray, codes: jnp.ndarray,
                   block_g: int = 4096, interpret: bool = False,
                   precision: str = "hilo",
                   max_q: int = 128) -> jnp.ndarray:
    """(Q, M, K) LUTs x (G, M) codes -> (Q, G), MXU formulation.

    Equivalent to adc_scores but ~MXU-bound instead of gather-bound: the
    scan-of-takes does VPU table lookups serially over subspaces (243 ms at
    G=1M, Q=16 on v5e — docs/PERF.md), while score[q, g] =
    sum_m lut[q, m, codes[g, m]] is exactly sum_m lut_m @ onehot(codes_m),
    a chain of (Q, K) x (K, Gb) matmuls whose one-hot operand is built and
    consumed entirely in VMEM.

    The per-query cost drops with batch size until Q=128 fills the MXU's
    rows (13.3 -> 5.2 ms/query hilo at G=10M going 16 -> 128, and 3.36
    with the rerank-mode "hi" shortlist — docs/PERF.md "Query batching");
    queries beyond `max_q` are chunked — the (M, Qp, K) LUT block must fit
    VMEM (17.9 MB at Qp=256 overflows the 16 MB limit).

    precision: "hilo" (f32-faithful, 2 matmuls/subspace) or "hi" (single
    bf16 matmul, ~2e-3 relative — the right choice when an exact rerank
    follows, see _adc_mxu_kernel).
    """
    import functools as _ft

    q, m, k = lut.shape
    g = codes.shape[0]
    if q > max_q:
        return jnp.concatenate(
            [adc_scores_mxu(lut[i:i + max_q], codes, block_g, interpret,
                            precision, max_q)
             for i in range(0, q, max_q)], axis=0)
    qp = -(-q // 8) * 8                    # sublane-align the thin Q dim
    gp = -(-g // block_g) * block_g
    lut_p = jnp.zeros((m, qp, k), jnp.float32).at[:, :q].set(
        jnp.swapaxes(lut, 0, 1))
    codes_t = jnp.zeros((m, gp), jnp.int32).at[:, :g].set(
        codes.astype(jnp.int32).T)
    out = pl.pallas_call(
        _ft.partial(_adc_mxu_kernel, hilo=(precision == "hilo")),
        grid=(gp // block_g,),
        in_specs=[
            pl.BlockSpec((m, block_g), lambda i: (0, i)),
            pl.BlockSpec((m, qp, k), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((qp, block_g), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((qp, gp), jnp.float32),
        interpret=interpret,
    )(codes_t, lut_p)
    return out[:q, :g]


def _local_pq_topk(lut, codes, valid, k: int, axis: str,
                   impl: str = "scan", precision: str = "hilo"):
    if impl == "mxu":
        scores = adc_scores_mxu(lut, codes,
                                interpret=jax.default_backend() != "tpu",
                                precision=precision)
    else:
        scores = adc_scores(lut, codes)                      # (Q, G/m)
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    rows = codes.shape[0]
    k_local = min(k, rows)
    s, i = jax.lax.top_k(scores, k_local)
    shard = jax.lax.axis_index(axis)
    gi = i + shard * rows
    all_s = jax.lax.all_gather(s, axis, axis=1, tiled=True)
    all_i = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
    fs, pos = jax.lax.top_k(all_s, min(k, all_s.shape[1]))
    return fs, jnp.take_along_axis(all_i, pos, axis=1)


def sharded_pq_top_k(queries, codec: PQCodec, codes, valid, k: int,
                     mesh: Mesh, axis: str = "model",
                     adc_impl: str = "scan", precision: str = "hilo"):
    """Top-k ADC search over codes row-sharded on `axis` (same collective
    shape as the dense sharded_top_k: local scores + all_gather of
    candidates over ICI). adc_impl picks the per-shard score kernel —
    'mxu' runs the pallas one-hot-matmul kernel inside the shard_map body
    (a multi-chip deployment should not fall back to the gather scan it
    exists to replace)."""
    lut = codec.lut(queries)
    fn = jax.shard_map(
        functools.partial(_local_pq_topk, k=k, axis=axis, impl=adc_impl,
                          precision=precision),
        mesh=mesh, in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()), check_vma=False)
    return fn(lut, codes, valid)


class PQGallery:
    """Capacity-padded PQ store with the GalleryStore search surface.

    >>> codec = PQCodec.train(corpus)         # once, on device
    >>> g = PQGallery(codec, capacity=1_000_000)
    >>> g.add(ids, embeddings)                # encodes on device
    >>> scores, found_ids = g.search(query, k=5)
    """

    def __init__(self, codec: PQCodec, capacity: int = 1 << 20,
                 mesh: Optional[Mesh] = None, axis: str = "model",
                 keep_exact: bool = False, adc_impl: str = "auto"):
        # adc_impl: "mxu" (pallas one-hot matmul kernel, ~10x the scan on
        # v5e), "scan" (gather formulation, any backend), "auto" = mxu on
        # TPU. Applies to the sharded path too (the kernel runs inside the
        # shard_map body; interpret mode covers the virtual CPU test mesh).
        if adc_impl == "auto":
            adc_impl = "mxu" if jax.default_backend() == "tpu" else "scan"
        self.adc_impl = adc_impl
        self.codec = codec
        self.mesh = mesh
        self.axis = axis
        if mesh is not None:
            m = mesh.shape[axis]
            capacity = -(-capacity // m) * m
        self.capacity = capacity
        # keep_exact retains full-precision embeddings in HOST memory
        # (2 GB at 1M x 512 f32 — host RAM, not the HBM the codes solve)
        # so search() can rerank the ADC shortlist exactly. Allocated at the
        # final (mesh-rounded) capacity so every code row has an exact row.
        self._exact = (np.zeros((capacity, codec.dim), np.float32)
                       if keep_exact else None)
        self._codes = jnp.zeros((capacity, codec.m), jnp.uint8)
        self._valid = jnp.zeros((capacity,), bool)
        self._ids = np.full((capacity,), -1, np.int64)
        self._free = list(range(capacity - 1, -1, -1))  # deleted slots reuse
        self._jit_search = {}          # k_fetch -> compiled search program
        if mesh is not None:
            sh = NamedSharding(mesh, P(axis, None))
            self._codes = jax.device_put(self._codes, sh)
            self._valid = jax.device_put(self._valid,
                                         NamedSharding(mesh, P(axis)))

    def __len__(self) -> int:
        return self.capacity - len(self._free)

    def add(self, ids, embeddings) -> np.ndarray:
        """Add rows; returns the slot indices written (facade bookkeeping)."""
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        if (ids < 0).any():
            # -1 is the empty-slot sentinel; snapshot() derives validity
            # from id sign, so a negative id would silently vanish across
            # snapshot/restore
            raise ValueError("person ids must be >= 0")
        emb = np.atleast_2d(np.asarray(embeddings, np.float32))
        codes = self.codec.encode(emb)
        n = len(ids)
        if n > len(self._free):
            raise ValueError(f"PQ gallery full ({self.capacity})")
        rows = np.asarray([self._free.pop() for _ in range(n)])
        pos = jnp.asarray(rows)
        self._codes = self._codes.at[pos].set(codes)
        self._valid = self._valid.at[pos].set(True)
        self._ids[rows] = ids
        if self._exact is not None:
            self._exact[rows] = emb
        return rows

    def delete(self, person_id: int) -> bool:
        rows = np.nonzero(self._ids == person_id)[0]
        if not len(rows):
            return False
        self._valid = self._valid.at[jnp.asarray(rows)].set(False)
        self._ids[rows] = -1
        self._free.extend(int(r) for r in rows)
        return True

    # ------------------------------------------------------- persistence

    def snapshot(self, path: str) -> None:
        """Atomic PQ-tier checkpoint: codebooks + codes + ids (+ the exact
        rerank rows when keep_exact).

        At the 1M-identity scale a restart must not re-train codebooks or
        re-encode embeddings (the encode alone is minutes of device time
        the snapshot makes redundant). The npz container checksums every
        member (zip CRC32), and the tmp-write + os.replace makes the file
        appear atomically — the same guarantees as the dense store's
        native CRC snapshot (store.py snapshot/restore)."""
        valid_rows = np.nonzero(self._ids >= 0)[0]
        arrays = dict(
            centroids=np.asarray(self.codec.centroids, np.float32),
            codes=np.asarray(self._codes)[valid_rows],
            ids=self._ids[valid_rows],
            capacity=np.int64(self.capacity))
        if self._exact is not None:
            arrays["exact"] = self._exact[valid_rows]
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)

    @classmethod
    def restore(cls, path: str, mesh: Optional[Mesh] = None,
                axis: str = "model", adc_impl: str = "auto",
                capacity: Optional[int] = None) -> "PQGallery":
        """Rebuild a gallery from snapshot(); codes load directly (no
        re-encode). mesh/axis/adc_impl are runtime choices, not snapshot
        properties — a snapshot taken unsharded restores onto a mesh and
        vice versa (capacity re-rounds to the new mesh)."""
        with np.load(path) as z:
            centroids = z["centroids"]
            codes = z["codes"]
            ids = z["ids"].astype(np.int64)
            cap = int(capacity if capacity is not None else z["capacity"])
            exact = z["exact"] if "exact" in z.files else None
        n = len(ids)
        g = cls(PQCodec(jnp.asarray(centroids)), capacity=max(cap, n, 1),
                mesh=mesh, axis=axis, keep_exact=exact is not None,
                adc_impl=adc_impl)
        if n:
            # rows 0..n-1 in one contiguous device write
            g._codes = jax.lax.dynamic_update_slice(
                g._codes, jnp.asarray(codes), (0, 0))
            g._valid = jax.lax.dynamic_update_slice(
                g._valid, jnp.ones(n, bool), (0,))
            g._ids[:n] = ids
            g._free = list(range(g.capacity - 1, n - 1, -1))
            if exact is not None:
                g._exact[:n] = exact
        return g

    def search(self, queries, k: int = 5, rerank: int = 0,
               precision: Optional[str] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, dim) or (dim,) -> (scores (Q, k), ids (Q, k)); ids -1 where
        fewer than k valid rows exist.

        rerank > 0 (requires keep_exact=True): the ADC pass shortlists
        max(k, rerank) candidates, then exact host-side inner products
        re-order them — PQ recall at full-precision top-k accuracy for the
        cost of a (Q, rerank) dot product.

        precision overrides the ADC pass's LUT precision ("hilo"/"hi",
        see adc_scores_mxu); default: "hi" when an exact rerank follows,
        "hilo" otherwise."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        k_fetch = max(k, rerank) if rerank else k
        # an exact rerank follows -> the cheaper single-bf16 ADC pass is
        # enough for shortlisting (the rerank re-orders with true cosines;
        # quantization error dwarfs the bf16 2e-3). 2x fewer MXU matmuls.
        if precision is None:
            precision = "hi" if rerank else "hilo"
        if self.mesh is not None:
            s, i = sharded_pq_top_k(q, self.codec, self._codes, self._valid,
                                    k_fetch, self.mesh, self.axis,
                                    adc_impl=self.adc_impl,
                                    precision=precision)
        else:
            # ONE compiled program for lut -> ADC -> mask -> top-k: eager
            # op-by-op dispatch costs more than the kernel itself at
            # G=10M through a remote transport (833 -> ~250 ms, PERF.md)
            fn = self._jit_search.get((k_fetch, precision))
            if fn is None:
                impl, cap = self.adc_impl, self.capacity
                interp = jax.default_backend() != "tpu"
                codec = self.codec
                prec = precision

                def _search(qd, codes, valid):
                    lut = codec.lut(qd)
                    if impl == "mxu":
                        scores = adc_scores_mxu(lut, codes,
                                                interpret=interp,
                                                precision=prec)
                    else:
                        scores = adc_scores(lut, codes)
                    scores = jnp.where(valid[None], scores, -jnp.inf)
                    return jax.lax.top_k(scores, min(k_fetch, cap))

                fn = self._jit_search[(k_fetch, precision)] = \
                    jax.jit(_search)
            s, i = fn(jnp.asarray(q), self._codes, self._valid)
        s = np.asarray(s)
        i = np.asarray(i)
        if s.shape[1] < k_fetch:
            # fewer candidate columns than asked (capacity < k, or sharded
            # gather < k): honor the documented (Q, k) contract — pad with
            # -inf scores (masked to ids=-1 below)
            pad = ((0, 0), (0, k_fetch - s.shape[1]))
            s = np.pad(s, pad, constant_values=-np.inf)
            i = np.pad(i, pad)
        if rerank:
            if self._exact is None:
                raise ValueError("rerank needs PQGallery(keep_exact=True)")
            exact = np.einsum("qd,qrd->qr", q, self._exact[i])
            exact = np.where(np.isfinite(s), exact, -np.inf)
            order = np.argsort(-exact, axis=1)[:, :k]
            s = np.take_along_axis(exact, order, axis=1)
            i = np.take_along_axis(i, order, axis=1)
        else:
            s, i = s[:, :k], i[:, :k]
        ids = np.where(np.isfinite(s), self._ids[i], -1)
        return np.where(np.isfinite(s), s, 0.0), ids
