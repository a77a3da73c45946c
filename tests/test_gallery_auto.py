"""AutoGallery tier policy + blocked dedup (gallery/auto.py, dedup.py).

The facade must be behaviorally indistinguishable from the dense store:
same hits, same true-cosine scores (PQ searches rerank exactly), same
upsert/delete semantics, same merge worklists — checked by running both
tiers side by side on identity-structured data.
"""
import os
import numpy as np
import pytest

from scrfd_arcface_facerecognition_tpu.gallery import (
    AutoGallery, GalleryStore, duplicate_groups, find_duplicate_pairs,
    find_duplicate_pairs_blocked)


def _rows(rng, n, d=512):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _identity_rows(rng, n_ident, per, d=512, sigma=0.03):
    centers = _rows(rng, n_ident, d)
    rows = np.repeat(centers, per, axis=0)
    rows = rows + sigma * rng.normal(size=rows.shape).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    ident = np.repeat(np.arange(n_ident), per)
    return rows, ident, centers


# ----------------------------------------------------------- blocked dedup


def test_blocked_pairs_match_oneshot():
    rng = np.random.default_rng(0)
    rows, _, _ = _identity_rows(rng, 40, 4, sigma=0.01)
    ids = [int(i) * 3 + 7 for i in range(len(rows))]   # non-contiguous ids
    want = sorted(find_duplicate_pairs(rows, 0.9, ids))
    assert want, "fixture must produce duplicate pairs"
    got = sorted((a, b) for a, b, _ in
                 find_duplicate_pairs_blocked(rows, 0.9, ids, block=32))
    assert got == sorted((a, b) for a, b, _ in want)


def test_blocked_pairs_saturated_row_rescanned():
    # one identity with MORE duplicates than k_neighbors: the per-row
    # top-k saturates and the exact full-width rescan must find the rest
    rng = np.random.default_rng(1)
    rows, _, _ = _identity_rows(rng, 3, 24, sigma=0.01)
    want = sorted((a, b) for a, b, _ in find_duplicate_pairs(rows, 0.9))
    got = sorted((a, b) for a, b, _ in find_duplicate_pairs_blocked(
        rows, 0.9, block=16, k_neighbors=8))
    assert got == want


def test_duplicate_groups_switches_to_blocked():
    rng = np.random.default_rng(2)
    rows, _, _ = _identity_rows(rng, 30, 3, sigma=0.01)
    small = duplicate_groups(rows, 0.9)                 # one-shot
    large = duplicate_groups(rows, 0.9, block_above=10)  # forced blocked
    assert small == large and len(small) == 30


# ------------------------------------------------------------ tier policy


def test_auto_migrates_at_threshold():
    rng = np.random.default_rng(3)
    g = AutoGallery(tier="auto", pq_threshold=24, min_train_rows=8)
    rows = _rows(rng, 30)
    for i in range(23):
        g.add_embedding(i, rows[i], {"n": i})
    assert g.tier == "dense"
    g.add_batch(np.arange(23, 30), rows[23:30])
    assert g.tier == "pq"
    assert g.get_embedding_count() == 30
    np.testing.assert_allclose(g.get_embedding(5), rows[5], atol=1e-6)
    assert g.get_payload(5) == {"n": 5}


def test_forced_pq_matches_dense_hits():
    rng = np.random.default_rng(4)
    rows, ident, centers = _identity_rows(rng, 50, 4)
    dense = GalleryStore(capacity=256)
    pq = AutoGallery(tier="pq", min_train_rows=4)
    for i, r in enumerate(rows):
        dense.add_embedding(i, r, {"ident": int(ident[i])})
        pq.add_embedding(i, r, {"ident": int(ident[i])})
    assert pq.tier == "pq"
    q = centers[:8] + 0.02 * rng.normal(size=(8, 512)).astype(np.float32)
    hd = dense.search_batch(q, k=4)
    hp = pq.search_batch(q, k=4)
    for qi in range(len(q)):
        assert [h.id for h in hp[qi]] == [h.id for h in hd[qi]]
        # reranked scores are exact cosines -> equal to the dense tier's
        np.testing.assert_allclose([h.score for h in hp[qi]],
                                   [h.score for h in hd[qi]], atol=1e-5)
        assert [h.payload for h in hp[qi]] == [h.payload for h in hd[qi]]


def test_pq_tier_upsert_delete_clear():
    rng = np.random.default_rng(5)
    g = AutoGallery(tier="pq", min_train_rows=4)
    rows = _rows(rng, 12)
    g.add_batch(np.arange(12), rows, [{"k": i} for i in range(12)])
    assert g.tier == "pq" and g.get_embedding_count() == 12
    # upsert: id 3 becomes a copy of row 0
    assert g.update_embedding(3, rows[0])
    hits = g.search_similar(rows[0], k=2)
    assert {h.id for h in hits} == {0, 3}
    assert g.get_payload(3) == {"k": 3}        # payload preserved
    # delete
    assert g.delete_embedding(3)
    assert not g.delete_embedding(3)
    assert g.get_embedding(3) is None
    assert g.get_embedding_count() == 11
    assert 3 not in {h.id for h in g.search_similar(rows[0], k=3)}
    # upsert via add_embedding on an existing id keeps the count
    g.add_embedding(5, rows[0], {"k": "new"})
    assert g.get_embedding_count() == 11
    assert g.get_payload(5) == {"k": "new"}
    # clear drops back to the dense tier
    assert g.clear_all()
    assert g.tier == "dense" and g.get_embedding_count() == 0
    assert g.search_batch(rows[:2], k=1) == [[], []]


def test_pq_tier_grows_past_capacity():
    rng = np.random.default_rng(6)
    g = AutoGallery(tier="pq", min_train_rows=4)
    rows = _rows(rng, 4)
    g.add_batch(np.arange(4), rows)
    assert g.tier == "pq"
    cap = g._pq.capacity
    more = _rows(rng, cap + 10)
    g.add_batch(np.arange(100, 100 + cap + 10), more)
    assert g.get_embedding_count() == cap + 14
    hits = g.search_similar(more[0], k=1)
    assert hits[0].id == 100


def test_duplicate_groups_same_on_both_tiers():
    rng = np.random.default_rng(7)
    rows, ident, _ = _identity_rows(rng, 20, 3, sigma=0.01)
    dense = AutoGallery(tier="dense")
    pq = AutoGallery(tier="pq", min_train_rows=4)
    ids = np.arange(len(rows)) * 2 + 1
    dense.add_batch(ids, rows)
    pq.add_batch(ids, rows)
    want = dense.duplicate_groups(0.9)
    got = pq.duplicate_groups(0.9)
    assert want == got and len(want) == 20


def test_snapshot_restore_both_tiers(tmp_path):
    rng = np.random.default_rng(8)
    rows = _rows(rng, 10)
    for tier, kw in (("dense", {}), ("pq", {"min_train_rows": 4})):
        g = AutoGallery(tier=tier, **kw)
        g.add_batch(np.arange(10), rows, [{"i": i} for i in range(10)])
        path = str(tmp_path / f"snap_{tier}.bin")
        g.snapshot(path)
        r = AutoGallery.restore(path, tier=tier, **kw)
        assert r.tier == g.tier
        assert r.get_embedding_count() == 10
        assert r.get_payload(7) == {"i": 7}
        hits = r.search_similar(rows[7], k=1)
        assert hits[0].id == 7 and hits[0].score > 0.999


def test_search_threshold_filtering_pq():
    rng = np.random.default_rng(9)
    rows, ident, centers = _identity_rows(rng, 6, 2, sigma=0.01)
    g = AutoGallery(tier="pq", min_train_rows=4)
    g.add_batch(np.arange(12), rows)
    hits = g.search_similar(rows[0], k=12, threshold=0.9)
    assert all(h.score >= 0.9 for h in hits)
    assert {h.id for h in hits} == {0, 1}      # same identity only


def test_dense_tier_allows_odd_vector_size():
    # a forced-dense gallery can never reach the PQ tier, so a vector_size
    # not divisible by pq_m must construct and work (parity with the old
    # GalleryStore wiring the clustering engine used before AutoGallery)
    g = AutoGallery(vector_size=200, tier="dense")
    rng = np.random.default_rng(11)
    rows = _rows(rng, 4, d=200)
    assert g.add_batch(np.arange(4), rows) == 4
    assert g.search_similar(rows[2], k=1)[0].id == 2
    # pq/auto tiers still fail loudly at construction
    for tier in ("auto", "pq"):
        with pytest.raises(ValueError):
            AutoGallery(vector_size=200, tier=tier)


def test_restore_sniffs_by_format_not_exception(tmp_path):
    rng = np.random.default_rng(12)
    rows = _rows(rng, 8)
    dense = AutoGallery(tier="dense")
    dense.add_batch(np.arange(8), rows)
    dpath = str(tmp_path / "dense.bin")
    dense.snapshot(dpath)
    assert not AutoGallery._is_pq_snapshot(dpath)

    pq = AutoGallery(tier="pq", min_train_rows=4)
    pq.add_batch(np.arange(8), rows)
    ppath = str(tmp_path / "pq.bin")
    pq.snapshot(ppath)
    assert AutoGallery._is_pq_snapshot(ppath)

    # a corrupt PQ snapshot must surface the REAL (PQ) error, not be
    # silently retried as a dense snapshot and fail with a misleading
    # dense-format message
    import zipfile

    import numpy as _np
    bad = str(tmp_path / "bad_pq.bin")
    with zipfile.ZipFile(bad, "w") as zf:
        with zf.open("centroids.npy", "w") as f:
            _np.save(f, _np.zeros((2, 2), _np.float32))
        with zf.open("codes.npy", "w") as f:
            _np.save(f, _np.zeros((2, 2), _np.uint8))
    assert AutoGallery._is_pq_snapshot(bad)
    with pytest.raises(Exception) as ei:
        AutoGallery.restore(bad)
    assert "dense" not in str(ei.value).lower()


def test_restore_truncated_and_alien_snapshots_fail_loudly(tmp_path):
    # truncated zip (PQ snapshot cut mid-copy): must say the container is
    # damaged, not misroute to the dense reader's unrelated error
    rng = np.random.default_rng(13)
    pq = AutoGallery(tier="pq", min_train_rows=4)
    pq.add_batch(np.arange(8), _rows(rng, 8))
    full = str(tmp_path / "pq_full.bin")
    pq.snapshot(full)
    cut = str(tmp_path / "pq_cut.bin")
    with open(full, "rb") as f, open(cut, "wb") as g:
        g.write(f.read()[: os.path.getsize(full) // 2])
    with pytest.raises(ValueError, match="damaged|truncated"):
        AutoGallery.restore(cut)

    alien = str(tmp_path / "alien.bin")
    with open(alien, "wb") as f:
        f.write(b"definitely not a snapshot")
    with pytest.raises(ValueError, match="not a gallery snapshot"):
        AutoGallery.restore(alien)


# ------------------------------------------------------- async migration


def _wait_bg(g, timeout=60):
    import time
    t = g._bg_thread
    if t is not None:
        t.join(timeout=timeout)
        assert not t.is_alive(), "background migration did not finish"


def test_async_migration_zero_stall_swap_and_parity():
    rng = np.random.default_rng(21)
    rows, ident, _ = _identity_rows(rng, 16, 4, sigma=0.02)
    g = AutoGallery(tier="pq", min_train_rows=16, migrate_async=True)
    oracle = AutoGallery(tier="dense")
    ids = np.arange(len(rows)) * 3 + 1
    g.add_batch(ids, rows, [{"i": int(i)} for i in ids])
    oracle.add_batch(ids, rows, [{"i": int(i)} for i in ids])
    # the crossing add returns immediately on the dense tier; the build
    # runs in the background
    assert g.tier == "dense" and g._bg_thread is not None
    # the dense tier keeps serving (count AND search) during the build
    assert g.get_embedding_count() == len(ids)
    assert g.search_similar(rows[2], k=1)[0].id == ids[2]

    # mutations DURING the background build must survive the swap
    extra = rng.normal(size=(2, 512)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    g.add_batch([1001, 1002], extra, [{"i": 1001}, {"i": 1002}])
    oracle.add_batch([1001, 1002], extra, [{"i": 1001}, {"i": 1002}])
    g.update_embedding(ids[0], rows[5], {"i": -5})
    oracle.update_embedding(ids[0], rows[5], {"i": -5})
    g.delete_embedding(ids[1])
    oracle.delete_embedding(ids[1])

    _wait_bg(g)
    # first call after completion swaps tiers with reconciliation
    assert g.get_embedding_count() == oracle.get_embedding_count()
    assert g.tier == "pq"
    assert sorted(g.ids()) == sorted(oracle.ids())
    assert g.get_payload(1001) == {"i": 1001}
    assert g.get_payload(int(ids[0])) == {"i": -5}
    np.testing.assert_allclose(g.get_embedding(int(ids[0])), rows[5],
                               atol=1e-5)
    for q in (rows[7], extra[0]):
        want = oracle.search_similar(q, k=3)
        got = g.search_similar(q, k=3)
        assert [h.id for h in got] == [h.id for h in want]
        for a, b in zip(got, want):
            assert abs(a.score - b.score) < 1e-4


def test_async_migration_abandoned_by_clear():
    rng = np.random.default_rng(22)
    rows = _rows(rng, 24)
    g = AutoGallery(tier="pq", min_train_rows=16, migrate_async=True)
    g.add_batch(np.arange(24), rows)
    assert g._bg_thread is not None
    t = g._bg_thread
    g.clear_all()                        # abandons the in-flight build
    assert g.tier == "dense" and g.get_embedding_count() == 0
    t.join(timeout=60)
    # the stale result must never be applied
    g.add_batch(np.arange(4), rows[:4])
    assert g.get_embedding_count() == 4
    assert g.tier == "dense" or g._bg_thread is not None


def test_async_migration_concurrent_readers_survive_swap():
    """Lock-free webapp GET routes read the gallery from other threads
    while a clustering job mutates it: the tier swap must never expose a
    half-torn state (the pre-lock bug: reader finalizes, mutator's
    self._dense goes None mid-operation)."""
    import threading

    rng = np.random.default_rng(23)
    rows = _rows(rng, 64)
    g = AutoGallery(tier="pq", min_train_rows=32, migrate_async=True)
    g.add_batch(np.arange(32), rows[:32])
    assert g._bg_thread is not None
    errs = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                n = g.get_embedding_count()
                assert n >= 32
                hits = g.search_similar(rows[0], k=1)
                assert hits and hits[0].id == 0
        except BaseException as e:   # noqa: BLE001
            errs.append(repr(e))

    readers = [threading.Thread(target=reader) for _ in range(4)]
    for t in readers:
        t.start()
    # mutate from this thread while the build runs and readers hammer
    for i in range(32, 64):
        g.add_embedding(i, rows[i], {"i": i})
    _wait_bg(g)
    g.get_embedding_count()          # ensure the swap happened
    stop.set()
    for t in readers:
        t.join(timeout=10)
    assert not errs, errs
    assert g.tier == "pq"
    assert g.get_embedding_count() == 64
    assert g.get_payload(50) == {"i": 50}
    assert g.search_similar(rows[50], k=1)[0].id == 50


def test_restore_pq_snapshot_into_dense_policy_raises(tmp_path):
    """ADVICE r4: restoring a PQ snapshot into a tier='dense' facade must
    refuse loudly — the forced-dense policy promises the PQ tier is
    unreachable, and a silent install would contradict it."""
    rng = np.random.default_rng(11)
    g = AutoGallery(tier="pq", min_train_rows=4)
    g.add_batch(np.arange(8), _rows(rng, 8))
    assert g.tier == "pq"
    path = str(tmp_path / "snap.bin")
    g.snapshot(path)
    with pytest.raises(ValueError, match="tier='dense'"):
        AutoGallery.restore(path, tier="dense")
    r = AutoGallery.restore(path, tier="auto")   # policy-compatible: fine
    assert r.tier == "pq" and r.get_embedding_count() == 8
