"""Embedder pipeline: alignment parity with the cv2 path + API behavior."""
import cv2
import numpy as np
import jax.numpy as jnp

from scrfd_arcface_facerecognition_tpu import ops
from scrfd_arcface_facerecognition_tpu.pipeline import Embedder, FacePipeline
from oracles import np_umeyama


def _landmarks(offset, scale=1.5):
    return (np.asarray(ops.ARCFACE_DST) * scale + np.asarray(offset)).astype(np.float32)


def test_embed_matches_cv2_aligned_path():
    """Pipeline embedding == get_feat(cv2-warped crop): same model, two
    alignment paths (fused JAX warp vs cv2.warpAffine oracle)."""
    emb = Embedder("w600k_mbf", seed=0)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    kps = _landmarks((150.0, 100.0)) + rng.normal(scale=1.5, size=(5, 2)).astype(np.float32)

    got = emb(frame, kps)  # raw (un-normalized) embedding, pipeline warp

    m = np_umeyama(kps, np.asarray(ops.ARCFACE_DST)).astype(np.float32)
    crop = cv2.warpAffine(frame.astype(np.float32), m, (112, 112), borderValue=0.0)
    want = emb.get_feat(crop)[0]

    cos = np.dot(got, want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos


def test_embed_batched_invalid_slots_zero():
    emb = Embedder("w600k_mbf", seed=0)
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, size=(2, 240, 320, 3), dtype=np.uint8)
    kps = np.stack([
        np.stack([_landmarks((60, 40)), _landmarks((120, 60))]),
        np.stack([_landmarks((30, 30)), _landmarks((90, 80))]),
    ])  # (2, 2, 5, 2)
    valid = np.array([[True, False], [True, True]])
    out = np.asarray(emb.embed_batched(jnp.asarray(frame), jnp.asarray(kps),
                                       jnp.asarray(valid)))
    assert out.shape == (2, 2, 512)
    assert np.all(out[0, 1] == 0.0)
    norms = np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms[valid], 1.0, atol=1e-5)


def test_get_feat_batch_and_single_agree():
    emb = Embedder("w600k_mbf", seed=0)
    rng = np.random.default_rng(2)
    crops = rng.integers(0, 255, size=(3, 112, 112, 3), dtype=np.uint8)
    batch = emb.get_feat(crops)
    singles = np.stack([emb.get_feat(c)[0] for c in crops])
    np.testing.assert_allclose(batch, singles, atol=1e-4)


def test_face_pipeline_self_match():
    """A face whose embedding is in the gallery must match itself with
    similarity ~1 through the fully fused program."""
    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=0.003, pre_nms=64, max_det=4,
                        gallery_capacity=8, similarity_thresh=0.4, seed=0)
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, size=(360, 480, 3), dtype=np.uint8)
    out = pipe(frame)
    n = int(out.count[0])
    if n == 0:  # random weights may yield no confident det; force via thresh
        pipe.detector.conf_thres = 0.0
        pipe._jitted.clear()
        out = pipe(frame)
        n = int(out.count[0])
    assert n > 0
    emb0 = np.asarray(out.embeddings[0, 0])
    pipe.set_gallery(emb0[None], ["alice"])
    out2 = pipe(frame)
    assert float(out2.match_sim[0, 0]) > 0.999
    assert int(out2.match_idx[0, 0]) == 0
    names = pipe.match_names(out2)
    assert names[0][0] == "alice"


def test_face_pipeline_unknown_below_threshold():
    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=0.0, pre_nms=64, max_det=4,
                        gallery_capacity=8, similarity_thresh=0.99, seed=0)
    rng = np.random.default_rng(4)
    frame = rng.integers(0, 255, size=(360, 480, 3), dtype=np.uint8)
    # orthogonal-ish random gallery: should not match at 0.99 threshold
    g = rng.normal(size=(3, 512)).astype(np.float32)
    pipe.set_gallery(g, ["a", "b", "c"])
    out = pipe(frame)
    n = int(out.count[0])
    assert n > 0
    assert int(out.match_idx[0, 0]) == -1
    assert pipe.match_names(out)[0][0] == "Unknown"


def test_bucketed_matches_dense():
    """Bucketed stage-2 must produce identical outputs to the dense path."""
    import jax
    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=0.0, pre_nms=32, max_det=4,
                        gallery_capacity=8, similarity_thresh=0.4, seed=0)
    rng = np.random.default_rng(5)
    g = rng.normal(size=(3, 512)).astype(np.float32)
    pipe.set_gallery(g, ["a", "b", "c"])
    frames = rng.integers(0, 255, size=(2, 128, 160, 3), dtype=np.uint8)
    dense = pipe(jnp.asarray(frames), max_num=2, bucketed=False)
    buck = pipe(jnp.asarray(frames), max_num=2, bucketed=True)
    np.testing.assert_array_equal(np.asarray(dense.valid), np.asarray(buck.valid))
    np.testing.assert_allclose(np.asarray(dense.embeddings),
                               np.asarray(buck.embeddings), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(dense.match_idx),
                                  np.asarray(buck.match_idx))
    np.testing.assert_allclose(np.asarray(dense.match_sim),
                               np.asarray(buck.match_sim), atol=2e-5)


def test_bucketed_zero_faces():
    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=2.0, pre_nms=16, max_det=4,
                        gallery_capacity=8, seed=0)  # conf>1: nothing passes
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, size=(1, 96, 96, 3), dtype=np.uint8)
    out = pipe(jnp.asarray(frames), bucketed=True)
    assert int(np.asarray(out.count).sum()) == 0
    assert (np.asarray(out.match_idx) == -1).all()
    assert (np.asarray(out.embeddings) == 0).all()


def test_process_stream_matches_call():
    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=0.0, pre_nms=32, max_det=4,
                        gallery_capacity=8, seed=0)
    rng = np.random.default_rng(9)
    g = rng.normal(size=(3, 512)).astype(np.float32)
    pipe.set_gallery(g, ["a", "b", "c"])
    batches = [rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
               for _ in range(3)]
    stream_outs = list(pipe.process_stream(iter(batches), max_num=2))
    assert len(stream_outs) == 3
    for frames, got in zip(batches, stream_outs):
        want = pipe(jnp.asarray(frames), max_num=2)
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(want.valid))
        np.testing.assert_allclose(np.asarray(got.embeddings),
                                   np.asarray(want.embeddings), atol=2e-5)


def test_ctor_commits_host_numpy_weights_to_device():
    """Importer/executor weights arrive as host numpy; the ctors must
    place them ONCE (init_utils.place_variables). Regression: numpy
    leaves re-uploaded the full tree on every jitted call — 16x slower
    than the forward itself through a remote transport (docs/PERF.md
    "Host-resident weights re-uploaded per call")."""
    import jax
    from scrfd_arcface_facerecognition_tpu.pipeline import Detector

    base = Detector("det_500m", seed=0)
    host_vars = jax.tree.map(np.asarray, base.variables)
    assert all(isinstance(x, np.ndarray)
               for x in jax.tree.leaves(host_vars))
    for d in (Detector("det_500m", variables=host_vars),
              Embedder("w600k_mbf",
                       variables=jax.tree.map(
                           np.asarray,
                           Embedder("w600k_mbf", seed=0).variables))):
        leaves = jax.tree.leaves(d.variables)
        assert leaves and all(isinstance(x, jax.Array) for x in leaves)
