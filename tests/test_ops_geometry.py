"""Parity tests: anchor grids, distance decode, cosine similarity."""
import numpy as np
import jax.numpy as jnp

from scrfd_arcface_facerecognition_tpu import ops
from oracles import np_distance2bbox, np_distance2kps, np_anchor_centers


def test_anchor_centers_match_reference_layout():
    for (h, w, s) in [(80, 80, 8), (40, 40, 16), (20, 20, 32), (17, 23, 8)]:
        got = np.asarray(ops.anchor_centers(h, w, s, 2))
        want = np_anchor_centers(h, w, s, 2)
        np.testing.assert_array_equal(got, want)


def test_anchor_table_640():
    table = np.asarray(ops.scrfd_anchor_table((640, 640)))
    assert table.shape == ((80 * 80 + 40 * 40 + 20 * 20) * 2, 2)
    want = np.concatenate([
        np_anchor_centers(80, 80, 8, 2),
        np_anchor_centers(40, 40, 16, 2),
        np_anchor_centers(20, 20, 32, 2),
    ])
    np.testing.assert_array_equal(table, want)


def test_distance2bbox_parity():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 640, size=(100, 2)).astype(np.float32)
    dist = rng.uniform(0, 80, size=(100, 4)).astype(np.float32)
    got = np.asarray(ops.distance2bbox(jnp.asarray(pts), jnp.asarray(dist)))
    np.testing.assert_allclose(got, np_distance2bbox(pts, dist), rtol=1e-6)


def test_distance2bbox_batched():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 640, size=(3, 50, 2)).astype(np.float32)
    dist = rng.uniform(0, 80, size=(3, 50, 4)).astype(np.float32)
    got = np.asarray(ops.distance2bbox(jnp.asarray(pts), jnp.asarray(dist)))
    for b in range(3):
        np.testing.assert_allclose(got[b], np_distance2bbox(pts[b], dist[b]), rtol=1e-6)


def test_distance2kps_parity():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 640, size=(60, 2)).astype(np.float32)
    dist = rng.uniform(-40, 40, size=(60, 10)).astype(np.float32)
    got = np.asarray(ops.distance2kps(jnp.asarray(pts), jnp.asarray(dist)))
    want = np_distance2kps(pts, dist).reshape(60, 5, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_compute_similarity_parity():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(512,)).astype(np.float32)
    b = rng.normal(size=(512,)).astype(np.float32)
    want = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    got = float(ops.compute_similarity(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-6


def test_cosine_matrix_and_topk():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(7, 512)).astype(np.float32)
    g = rng.normal(size=(23, 512)).astype(np.float32)
    sims = np.asarray(ops.cosine_matrix(jnp.asarray(q), jnp.asarray(g)))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    np.testing.assert_allclose(sims, qn @ gn.T, atol=1e-5)

    scores, idx = ops.top_k_matches(jnp.asarray(q), jnp.asarray(g), k=5)
    want_idx = np.argsort(-sims, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(scores), np.take_along_axis(sims, want_idx, 1), atol=1e-5)


def test_l2_normalize():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(4, 512)).astype(np.float32)
    got = np.asarray(ops.l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)
