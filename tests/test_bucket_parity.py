"""Shape-bucketed ingestion must be numerically identical to exact-shape
processing (VERDICT r1 item 6): heterogeneous web images merge into padded
buckets, but the per-image letterbox matrices are built from the ORIGINAL
shapes (ops.letterbox_matrices), so the detector sees the very same canvas.

The reference processes every web image at its own shape
(smart_face_recognition.py:1434-1509 via FaceAnalysis.get); bucketing is a
TPU-side compile-count optimization that must not shift results.
"""
import glob

import numpy as np
import jax.numpy as jnp
import pytest

from scrfd_arcface_facerecognition_tpu import ops
from scrfd_arcface_facerecognition_tpu.apps.face_analysis import FaceAnalysis


def _fixtures(n=3):
    files = sorted(glob.glob("/root/reference/image_cache/*.jpg"))
    import cv2
    imgs, seen = [], set()
    for f in files:
        im = cv2.imread(f)
        if im is None or im.shape in seen:
            continue
        seen.add(im.shape)
        imgs.append(im)
        if len(imgs) == n:
            break
    return imgs


def test_letterbox_matrices_match_exact_letterbox():
    rng = np.random.default_rng(0)
    for (h, w), (ph, pw) in [((300, 200), (512, 256)), ((444, 216), (512, 256)),
                             ((256, 256), (256, 256)), ((100, 700), (256, 768))]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        padded = np.zeros((ph, pw, 3), np.uint8)
        padded[:h, :w] = img
        wy, wx, scale = ops.letterbox_matrices((h, w), (ph, pw), (640, 640))
        got = np.asarray(ops.letterbox_dynamic(
            jnp.asarray(padded[None]), jnp.asarray(wy[None]),
            jnp.asarray(wx[None])))[0]
        plan = ops.letterbox_plan((h, w), (640, 640))
        want = np.asarray(ops.letterbox(jnp.asarray(img), plan))
        assert scale == plan.det_scale
        np.testing.assert_allclose(got, want, atol=1e-4,
                                   err_msg=f"{(h, w)} in {(ph, pw)}")


@pytest.fixture(scope="module")
def small_app():
    app = FaceAnalysis(det_variant="det_500m", rec_variant="w600k_mbf",
                       seed=0, max_det=8)
    app.prepare(det_thresh=0.5)
    # square canvas on both paths: this test isolates BUCKETING drift; the
    # tight-canvas trim is a separately-tested, separately-bounded tradeoff
    # (test_tight_canvas_agrees_with_square)
    app._pipe.tight_canvas = False
    app._pipe._jitted.clear()
    return app


def test_bucketed_get_batch_matches_exact_shape(small_app):
    """Mixed-shape get_batch (dynamic bucket path) vs one-shape-at-a-time
    processing: same boxes, kps, and embedding cosine >= 1 - 1e-3 on real
    reference crops through the real model stack."""
    import jax.numpy as jnp

    imgs = _fixtures(3)
    assert len(imgs) >= 2, "need heterogeneous fixtures"

    # exact baseline: per-image static program straight through the
    # pipeline (get_batch routes small groups to the bucket path now)
    exact = []
    for im in imgs:
        res = small_app._pipe(jnp.asarray(im[None]))
        faces = []
        small_app._scatter_faces(res, [0], out := [None])
        exact.append(out[0])
    # bucketed path: mixed shapes in one call => dynamic bucket program
    mixed = small_app.get_batch(imgs)

    for i, (fe, fm) in enumerate(zip(exact, mixed)):
        assert len(fe) == len(fm), f"img {i}: face count differs"
        for a, b in zip(fe, fm):
            np.testing.assert_allclose(b.bbox, a.bbox, atol=0.1,
                                       err_msg=f"img {i} bbox")
            np.testing.assert_allclose(b.kps, a.kps, atol=0.1,
                                       err_msg=f"img {i} kps")
            assert abs(b.det_score - a.det_score) < 1e-3
            cos = float(np.dot(a.normed_embedding, b.normed_embedding))
            assert cos >= 1.0 - 1e-3, f"img {i}: embedding cosine {cos}"


def test_clustering_ingest_uses_dynamic_bucketing(small_app):
    """extract_batch passes original shapes through; FaceAnalysis groups
    heterogeneous shapes into few padded buckets (compile-count bound)."""
    imgs = _fixtures(3)
    calls = []
    orig = small_app._pipe.call_dynamic

    def spy(frames, *a, **k):
        calls.append(tuple(frames.shape))
        return orig(frames, *a, **k)

    small_app._pipe.call_dynamic = spy
    try:
        small_app.get_batch(imgs)
    finally:
        small_app._pipe.call_dynamic = orig
    assert calls, "heterogeneous batch should use the dynamic bucket path"
    for shape in calls:
        assert shape[1] % 256 == 0 and shape[2] % 256 == 0


def test_streamed_mixed_shape_chunks_keep_order(small_app):
    """get_batch streams static chunks of DIFFERENT shapes through
    process_stream: results must map 1:1 in submission order (a swap
    would assign one image's faces to another)."""
    import cv2

    imgs = _fixtures(2)
    a = cv2.resize(imgs[0], (256, 320))
    b = cv2.resize(imgs[1], (320, 256))
    # two single-shape groups of MIN_STATIC_GROUP images -> two static
    # chunks with distinct shapes going through one stream
    batch = [a] * small_app.MIN_STATIC_GROUP + [b] * small_app.MIN_STATIC_GROUP
    res = small_app.get_batch(batch)
    assert len(res) == len(batch)
    # per-image results equal the single-group runs (order preserved)
    res_a = small_app.get_batch([a] * small_app.MIN_STATIC_GROUP)
    res_b = small_app.get_batch([b] * small_app.MIN_STATIC_GROUP)
    for i in range(small_app.MIN_STATIC_GROUP):
        assert len(res[i]) == len(res_a[i])
        assert len(res[small_app.MIN_STATIC_GROUP + i]) == len(res_b[i])
        for f1, f2 in zip(res[i], res_a[i]):
            np.testing.assert_allclose(f1.bbox, f2.bbox, atol=1e-3)
        for f1, f2 in zip(res[small_app.MIN_STATIC_GROUP + i], res_b[i]):
            np.testing.assert_allclose(f1.bbox, f2.bbox, atol=1e-3)
