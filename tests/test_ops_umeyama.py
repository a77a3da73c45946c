"""Umeyama closed-form vs SVD oracle, and estimate_norm behavior."""
import numpy as np
import jax.numpy as jnp

from scrfd_arcface_facerecognition_tpu import ops
from oracles import np_umeyama


def _random_landmarks(rng, n=5, jitter=3.0):
    base = np.asarray(ops.ARCFACE_DST)
    angle = rng.uniform(-0.6, 0.6)
    scale = rng.uniform(0.5, 3.0)
    t = rng.uniform(-50, 300, size=2)
    rot = np.array([[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]])
    pts = (base @ rot.T) * scale + t
    pts += rng.normal(scale=jitter, size=pts.shape)
    return pts.astype(np.float32)


def test_umeyama_matches_svd_oracle():
    rng = np.random.default_rng(0)
    for _ in range(50):
        src = _random_landmarks(rng)
        dst = np.asarray(ops.ARCFACE_DST)
        want = np_umeyama(src, dst)
        got = np.asarray(ops.umeyama_similarity(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_umeyama_reflection_case():
    # Mirrored source points force det(cov) < 0; the closed form must still
    # produce a proper rotation matching the SVD d-correction path.
    rng = np.random.default_rng(1)
    src = _random_landmarks(rng)
    src_flipped = src.copy()
    src_flipped[:, 0] = -src_flipped[:, 0]
    dst = np.asarray(ops.ARCFACE_DST)
    want = np_umeyama(src_flipped, dst)
    got = np.asarray(ops.umeyama_similarity(jnp.asarray(src_flipped), jnp.asarray(dst)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    rot = got[:, :2]
    assert np.linalg.det(rot) > 0  # similarity, never reflection


def test_umeyama_batched():
    rng = np.random.default_rng(2)
    srcs = np.stack([_random_landmarks(rng) for _ in range(8)])
    dst = np.asarray(ops.ARCFACE_DST)
    dsts = np.broadcast_to(dst, srcs.shape)
    got = np.asarray(ops.umeyama_similarity(jnp.asarray(srcs), jnp.asarray(dsts)))
    for i in range(8):
        np.testing.assert_allclose(got[i], np_umeyama(srcs[i], dst), atol=1e-4)


def test_estimate_norm_roundtrip():
    # Exact similarity-transformed template must map back exactly.
    rng = np.random.default_rng(3)
    src = _random_landmarks(rng, jitter=0.0)
    m = np.asarray(ops.estimate_norm(jnp.asarray(src)))
    ones = np.ones((5, 1), dtype=np.float32)
    mapped = np.concatenate([src, ones], axis=1) @ m.T
    np.testing.assert_allclose(mapped, np.asarray(ops.ARCFACE_DST), atol=1e-3)


def test_estimate_norm_cv2_crosscheck():
    import cv2
    rng = np.random.default_rng(4)
    src = _random_landmarks(rng, jitter=1.0)
    m_cv, _ = cv2.estimateAffinePartial2D(
        src.reshape(-1, 1, 2), np.asarray(ops.ARCFACE_DST).reshape(-1, 1, 2),
        method=cv2.LMEDS)
    got = np.asarray(ops.estimate_norm(jnp.asarray(src)))
    np.testing.assert_allclose(got, m_cv, atol=0.5)  # loose: different estimator


def test_estimate_norm_image_size_scaling():
    rng = np.random.default_rng(5)
    src = _random_landmarks(rng)
    m112 = np.asarray(ops.estimate_norm(jnp.asarray(src), 112))
    m224 = np.asarray(ops.estimate_norm(jnp.asarray(src), 224))
    np.testing.assert_allclose(m224, m112 * 2.0, atol=1e-4)
