"""Product-quantized gallery: codec quality, store semantics, sharded
search parity (the million-identity scaling tier — no reference
counterpart; Qdrant ':memory:' is a Python scan, qdrant_manager.py:40-43)."""
import numpy as np
import jax.numpy as jnp
import pytest

from scrfd_arcface_facerecognition_tpu.gallery import (
    PQCodec, PQGallery, adc_scores)
from scrfd_arcface_facerecognition_tpu.parallel import make_mesh


def _identity_corpus(n_ids=128, per_id=16, dim=512, seed=0):
    """Clustered unit vectors: per_id noisy copies of n_ids identities."""
    rng = np.random.default_rng(seed)
    ids = rng.normal(size=(n_ids, dim)).astype(np.float32)
    ids /= np.linalg.norm(ids, axis=1, keepdims=True)
    x = np.repeat(ids, per_id, axis=0)
    x += rng.normal(scale=0.05, size=x.shape).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return ids, x


@pytest.fixture(scope="module")
def codec_and_corpus():
    ids, corpus = _identity_corpus()
    codec = PQCodec.train(corpus, m=64, k=128, iters=10, seed=0)
    return codec, ids, corpus


def test_codec_reconstruction_preserves_identity(codec_and_corpus):
    codec, ids, corpus = codec_and_corpus
    codes = codec.encode(corpus[:256])
    assert codes.shape == (256, 64) and codes.dtype == jnp.uint8
    recon = np.asarray(codec.decode(codes))
    cos = np.sum(recon * corpus[:256], axis=1) / np.maximum(
        np.linalg.norm(recon, axis=1), 1e-9)
    # PQ is lossy (64 codes for 512 dims); identity-level structure must
    # survive — the recall test below is the functional bar
    assert np.mean(cos) > 0.8, float(np.mean(cos))


def test_adc_matches_reconstructed_inner_product(codec_and_corpus):
    codec, ids, corpus = codec_and_corpus
    codes = codec.encode(corpus[:64])
    q = ids[:4]
    scores = np.asarray(adc_scores(codec.lut(q), codes))
    recon = np.asarray(codec.decode(codes))
    want = q @ recon.T
    np.testing.assert_allclose(scores, want, rtol=1e-4, atol=1e-4)


def test_pq_gallery_top1_recall(codec_and_corpus):
    codec, ids, corpus = codec_and_corpus
    g = PQGallery(codec, capacity=2048)
    # one exemplar per identity
    g.add(np.arange(128), corpus[::16])
    # query with a different noisy view of each identity
    queries = corpus[1::16][:64]
    _, got = g.search(queries, k=1)
    recall = float(np.mean(got[:, 0] == np.arange(64)))
    assert recall >= 0.95, recall


def test_pq_gallery_delete_and_padding(codec_and_corpus):
    codec, ids, corpus = codec_and_corpus
    g = PQGallery(codec, capacity=64)
    g.add([10, 11, 12], corpus[:3])
    assert len(g) == 3
    assert g.delete(11)
    assert not g.delete(999)
    scores, got = g.search(corpus[1], k=4)
    assert 11 not in got[0]
    # padded / deleted slots surface as id -1 with zero score
    assert (got[0][2:] == -1).all()


def test_sharded_pq_matches_single_device(codec_and_corpus):
    codec, ids, corpus = codec_and_corpus
    mesh = make_mesh((8,), ("model",))
    g1 = PQGallery(codec, capacity=256)
    g8 = PQGallery(codec, capacity=256, mesh=mesh)
    g1.add(np.arange(128), corpus[::16])
    g8.add(np.arange(128), corpus[::16])
    q = corpus[1::16][:8]
    s1, i1 = g1.search(q, k=5)
    s8, i8 = g8.search(q, k=5)
    np.testing.assert_allclose(s8, s1, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i8, i1)


def test_pq_gallery_slot_reuse_under_churn(codec_and_corpus):
    """Deleted slots must be reusable: capacity-N store survives >N
    cumulative adds when deletions keep the live count below capacity."""
    codec, ids, corpus = codec_and_corpus
    g = PQGallery(codec, capacity=8)
    for round_ in range(5):               # 5*4 = 20 cumulative adds > 8
        base = round_ * 4
        g.add(np.arange(base, base + 4), corpus[base:base + 4])
        for i in range(base, base + 4):
            g.delete(i)
    assert len(g) == 0
    g.add([999], corpus[:1])
    _, got = g.search(corpus[0], k=1)
    assert got[0, 0] == 999


def test_exact_rerank_restores_full_precision_ranking(codec_and_corpus):
    """keep_exact + rerank: results equal the dense full-precision top-k
    even where raw ADC ranking differs."""
    codec, ids, corpus = codec_and_corpus
    g = PQGallery(codec, capacity=256, keep_exact=True)
    g.add(np.arange(128), corpus[::16])
    queries = corpus[3::16][:16]
    s, got = g.search(queries, k=3, rerank=32)

    gal = corpus[::16][:128]
    sims = queries @ gal.T
    want = np.argsort(-sims, axis=1)[:, :3]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(
        s, np.take_along_axis(sims, want, axis=1), rtol=1e-5)

    # deleted rows must not resurface through the exact store
    g.delete(int(want[0, 0]))
    _, got2 = g.search(queries[:1], k=3, rerank=32)
    assert want[0, 0] not in got2[0]

    # rerank without keep_exact raises
    g2 = PQGallery(codec, capacity=64)
    g2.add([1], corpus[:1])
    with pytest.raises(ValueError, match="keep_exact"):
        g2.search(corpus[0], k=1, rerank=8)


def test_adc_mxu_matches_scan():
    """The MXU one-hot-matmul ADC (pallas) == the gather-scan formulation
    (bf16 LUT quantization bounds the difference; PQ codebook error
    dominates both)."""
    from scrfd_arcface_facerecognition_tpu.gallery.pq import (
        PQCodec, adc_scores, adc_scores_mxu)

    rng = np.random.default_rng(3)
    codec = PQCodec(centroids=jnp.asarray(
        rng.normal(size=(8, 16, 4)).astype(np.float32)))
    codes = jnp.asarray(rng.integers(0, 16, (500, 8), dtype=np.uint8))
    lut = codec.lut(rng.normal(size=(3, 32)).astype(np.float32))
    a = np.asarray(adc_scores(lut, codes))
    b = np.asarray(adc_scores_mxu(lut, codes, block_g=128, interpret=True))
    assert a.shape == b.shape == (3, 500)
    scale = max(float(np.abs(a).max()), 1e-6)
    assert float(np.abs(a - b).max()) / scale < 5e-3


def test_pq_gallery_mxu_search_matches_scan():
    from scrfd_arcface_facerecognition_tpu.gallery.pq import PQCodec, PQGallery

    rng = np.random.default_rng(4)
    corpus = rng.normal(size=(2048, 64)).astype(np.float32)
    codec = PQCodec.train(corpus, m=8, k=32, iters=3)
    ids = np.arange(300)
    vecs = corpus[:300]
    a = PQGallery(codec, capacity=512, adc_impl="scan")
    b = PQGallery(codec, capacity=512, adc_impl="mxu")  # interpret on CPU
    a.add(ids, vecs)
    b.add(ids, vecs)
    q = vecs[7:9]
    sa, ia = a.search(q, k=5)
    sb, ib = b.search(q, k=5)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, atol=5e-2)


def test_pq_snapshot_restore_round_trip(codec_and_corpus, tmp_path):
    """snapshot/restore preserves codes, ids, and exact-rerank rows —
    search results are identical without any re-encode."""
    codec, ids_mat, corpus = codec_and_corpus
    g = PQGallery(codec, capacity=256, keep_exact=True)
    ids = np.arange(100)
    g.add(ids, corpus[:100])
    g.delete(17)           # a hole: restore must keep ids/rows aligned
    path = str(tmp_path / "pq.npz")
    g.snapshot(path)

    r = PQGallery.restore(path)
    assert len(r) == len(g) == 99
    q = corpus[3:6]
    s0, i0 = g.search(q, k=5, rerank=20)
    s1, i1 = r.search(q, k=5, rerank=20)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, atol=1e-6)
    # adds continue after restore (free-list rebuilt)
    rows = r.add(np.asarray([999]), corpus[200:201])
    assert len(rows) == 1        # add returns the slot indices written
    assert len(r) == 100


def test_pq_snapshot_restores_onto_mesh(codec_and_corpus, tmp_path):
    """A snapshot taken unsharded restores onto an 8-device mesh (capacity
    re-rounds) with identical search results."""
    codec, _, corpus = codec_and_corpus
    g = PQGallery(codec, capacity=100)   # not a mesh multiple
    ids = np.arange(60)
    g.add(ids, corpus[:60])
    path = str(tmp_path / "pq_mesh.npz")
    g.snapshot(path)

    mesh = make_mesh((8,), ("model",))
    r = PQGallery.restore(path, mesh=mesh)
    assert r.capacity % 8 == 0
    q = corpus[10:12]
    s0, i0 = g.search(q, k=4)
    s1, i1 = r.search(q, k=4)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, atol=1e-4)


def test_codec_rejects_k_over_256():
    """uint8 codes: k > 256 would silently wrap assignments modulo 256."""
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(64, 64)).astype(np.float32)
    with pytest.raises(ValueError, match="256"):
        PQCodec.train(corpus, m=8, k=512, iters=1)
    with pytest.raises(ValueError, match="256"):
        PQCodec(jnp.zeros((8, 300, 8), jnp.float32))


def test_encode_chunked_matches_one_shot(codec_and_corpus):
    """Blocked encode (the path bulk million-row adds take) must produce
    the identical codes as a single-block encode."""
    codec, ids, corpus = codec_and_corpus
    one = np.asarray(codec.encode(corpus, chunk=len(corpus)))
    blocked = np.asarray(codec.encode(corpus, chunk=100))  # uneven tail
    np.testing.assert_array_equal(blocked, one)


def test_train_chunked_matches_unblocked(codec_and_corpus):
    """Chunked k-means sweep == single-chunk sweep (same seeds/draws; the
    blocked accumulation only reorders f32 sums)."""
    _, ids, corpus = codec_and_corpus
    small = corpus[:512]
    c1 = PQCodec.train(small, m=16, k=32, iters=3, seed=7, chunk=512)
    c2 = PQCodec.train(small, m=16, k=32, iters=3, seed=7, chunk=100)
    np.testing.assert_allclose(np.asarray(c2.centroids),
                               np.asarray(c1.centroids), atol=1e-4)


def test_search_pads_to_k_when_capacity_smaller(codec_and_corpus):
    """Documented contract: (Q, k) with ids=-1 where fewer than k valid
    rows exist — even when capacity itself is below k."""
    codec, ids, corpus = codec_and_corpus
    g = PQGallery(codec, capacity=3)
    g.add([5, 6], corpus[:2])
    s, got = g.search(corpus[:2], k=5)
    assert s.shape == (2, 5) and got.shape == (2, 5)
    assert (got[:, 3:] == -1).all() and (s[:, 3:] == 0.0).all()
    # rerank path honors the same contract
    ge = PQGallery(codec, capacity=3, keep_exact=True)
    ge.add([5, 6], corpus[:2])
    s2, got2 = ge.search(corpus[:2], k=5, rerank=4)
    assert s2.shape == (2, 5) and got2.shape == (2, 5)
    assert (got2[:, 2:] == -1).all()


def test_add_rejects_negative_ids(codec_and_corpus):
    """-1 is the empty-slot sentinel snapshot() keys on; a negative id
    would vanish silently across snapshot/restore."""
    codec, ids, corpus = codec_and_corpus
    g = PQGallery(codec, capacity=8)
    with pytest.raises(ValueError, match=">= 0"):
        g.add([-5], corpus[:1])


def test_sharded_mxu_matches_scan(codec_and_corpus):
    """adc_impl='mxu' must reach the shard_map body (not silently fall
    back to the scan) and agree with the scan path."""
    codec, ids, corpus = codec_and_corpus
    mesh = make_mesh((8,), ("model",))
    gs = PQGallery(codec, capacity=256, mesh=mesh, adc_impl="scan")
    gm = PQGallery(codec, capacity=256, mesh=mesh, adc_impl="mxu")
    gs.add(np.arange(128), corpus[::16])
    gm.add(np.arange(128), corpus[::16])
    q = corpus[1::16][:4]
    ss, is_ = gs.search(q, k=5)
    sm, im = gm.search(q, k=5)
    np.testing.assert_allclose(sm, ss, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(im, is_)
