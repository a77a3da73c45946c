"""Multi-device tests on the virtual 8-CPU mesh: sharded gallery + frame DP."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from scrfd_arcface_facerecognition_tpu import parallel
from scrfd_arcface_facerecognition_tpu.parallel import (
    make_mesh, ShardedGallery, shard_frames, replicate)


def test_virtual_mesh_has_8_devices():
    assert parallel.local_device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh((2, 4), ("data", "model"))
    assert mesh2.shape == {"data": 2, "model": 4}


def test_sharded_gallery_matches_dense():
    rng = np.random.default_rng(0)
    g = rng.normal(size=(100, 512)).astype(np.float32)
    q = rng.normal(size=(7, 512)).astype(np.float32)
    mesh = make_mesh((8,), ("model",))
    sg = ShardedGallery(g, mesh, axis="model")
    scores, idx = sg.search(q, k=5)

    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ gn.T
    want_idx = np.argsort(-sims, axis=1)[:, :5]
    np.testing.assert_array_equal(idx, want_idx)
    np.testing.assert_allclose(scores, np.take_along_axis(sims, want_idx, 1),
                               atol=1e-5)


def test_sharded_gallery_padding_rows_never_match():
    rng = np.random.default_rng(1)
    g = rng.normal(size=(5, 512)).astype(np.float32)  # pads 5 -> 8
    q = rng.normal(size=(2, 512)).astype(np.float32)
    mesh = make_mesh((8,), ("model",))
    sg = ShardedGallery(g, mesh, axis="model")
    scores, idx = sg.search(q, k=5)
    assert (idx < 5).all()
    assert np.isfinite(scores).all()


def test_shard_frames_and_replicate():
    mesh = make_mesh()
    frames = np.zeros((8, 32, 32, 3), np.uint8)
    sharded = shard_frames(frames, mesh)
    assert sharded.sharding.spec == P("data")
    tree = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.spec == P()


def test_dp_batch_math_partitioned():
    """A jitted per-frame reduction over a sharded batch runs without
    resharding and matches the unsharded result."""
    mesh = make_mesh()
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(8, 64, 64, 3), dtype=np.uint8)

    @jax.jit
    def mean_per_frame(x):
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))

    sharded = shard_frames(frames, mesh)
    got = np.asarray(mean_per_frame(sharded))
    want = frames.reshape(8, -1).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dp_fused_pipeline_on_mesh():
    """The real fused e2e program executes over a batch-sharded input on the
    8-device mesh (tiny model + frames to keep CPU compile fast)."""
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline

    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=0.0, pre_nms=16, max_det=2,
                        gallery_capacity=8, seed=0)
    rng = np.random.default_rng(3)
    g = rng.normal(size=(3, 512)).astype(np.float32)
    pipe.set_gallery(g, ["a", "b", "c"])

    frames = rng.integers(0, 255, size=(8, 96, 96, 3), dtype=np.uint8)
    mesh = make_mesh()
    sharded = shard_frames(jnp.asarray(frames), mesh)
    out = pipe(sharded)
    assert out.boxes.shape[0] == 8
    # parity with unsharded execution
    out_ref = pipe(jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out.embeddings),
                               np.asarray(out_ref.embeddings), atol=1e-4)


def test_hybrid_mesh_axes_and_layout():
    """DCN-aware mesh: leading 'replica' axis strides across slice groups,
    ici axes tile within; 8 virtual devices -> 2 slices x (2, 2)."""
    from scrfd_arcface_facerecognition_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh((2, 2), ("data", "model"), num_slices=2)
    assert mesh.axis_names == ("replica", "data", "model")
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "model": 2}
    # contiguous device groups per replica (the ICI locality analog)
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert ids[0].max() < ids[1].min()


def test_sharded_gallery_on_hybrid_mesh_matches_dense():
    """Gallery sharded over the in-slice 'model' axis, replicated across
    the DCN 'replica' axis: results equal the dense cosine top-k."""
    from scrfd_arcface_facerecognition_tpu.parallel import (
        make_hybrid_mesh, ShardedGallery)

    mesh = make_hybrid_mesh((4,), ("model",), num_slices=2)
    rng = np.random.default_rng(5)
    g = rng.normal(size=(32, 512)).astype(np.float32)
    q = rng.normal(size=(3, 512)).astype(np.float32)
    sg = ShardedGallery(g, mesh, axis="model")
    scores, idx = sg.search(q, k=5)

    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ gn.T
    want_idx = np.argsort(-sims, axis=1)[:, :5]
    np.testing.assert_array_equal(idx, want_idx)
    np.testing.assert_allclose(scores, np.take_along_axis(sims, want_idx, 1),
                               rtol=1e-5)


def test_initialize_distributed_single_process_is_graceful():
    from scrfd_arcface_facerecognition_tpu.parallel import (
        initialize_distributed)

    # no coordinator anywhere: must not raise, reports single-process
    assert initialize_distributed() is False


def test_verification_metrics_separable_and_random():
    """Known-geometry check: separable pairs -> accuracy 1.0 at a sensible
    threshold; random pairs -> ~0.5."""
    from scrfd_arcface_facerecognition_tpu.train import verification_metrics

    rng = np.random.default_rng(0)
    ids = rng.normal(size=(64, 128)).astype(np.float32)
    e1 = ids + rng.normal(scale=0.05, size=ids.shape).astype(np.float32)
    # positives: same identity; negatives: shuffled identities
    e2_pos = ids + rng.normal(scale=0.05, size=ids.shape).astype(np.float32)
    e2_neg = np.roll(ids, 1, axis=0)
    emb1 = np.concatenate([e1, e1])
    emb2 = np.concatenate([e2_pos, e2_neg])
    same = np.concatenate([np.ones(64, bool), np.zeros(64, bool)])
    m = verification_metrics(emb1, emb2, same)
    assert m["accuracy"] > 0.99 and 0.2 < m["threshold"] < 1.0
    assert m["tar_at_far"][1e-2] > 0.95

    rnd = rng.normal(size=(128, 128)).astype(np.float32)
    m2 = verification_metrics(rnd, rng.normal(size=(128, 128)).astype(np.float32),
                              same)
    assert 0.3 < m2["accuracy"] < 0.75


def test_evaluate_embedder_batches():
    from scrfd_arcface_facerecognition_tpu.train import evaluate_embedder

    rng = np.random.default_rng(1)
    flat = lambda v, x: np.asarray(x).reshape(x.shape[0], -1)[:, :32]
    pairs = []
    for i in range(10):
        a = rng.normal(size=(4, 4, 2)).astype(np.float32)
        b = a + rng.normal(scale=0.01, size=a.shape).astype(np.float32)
        pairs.append((a, b, True))
        pairs.append((a, rng.normal(size=a.shape).astype(np.float32), False))
    m = evaluate_embedder(flat, None, pairs, batch=8)
    assert m["n_pairs"] == 20 and m["accuracy"] > 0.9


def test_set_gallery_invalidates_dp_placement_cache():
    """set_gallery after a multi-device run must not leave stale gallery
    copies in the placement cache (new identities would never match)."""
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline

    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=0.0, pre_nms=16, max_det=2,
                        gallery_capacity=8, seed=0)
    rng = np.random.default_rng(0)
    pipe.set_gallery(rng.normal(size=(2, 512)).astype(np.float32), ["a", "b"])
    mesh = make_mesh()
    frames = shard_frames(jnp.asarray(
        rng.integers(0, 255, size=(8, 96, 96, 3), dtype=np.uint8)), mesh)
    out1 = pipe(frames)
    assert any(isinstance(k, tuple) and k and k[0] == "placement"
               for k in pipe._jitted), "expected a cached placement"
    new_g = rng.normal(size=(3, 512)).astype(np.float32)
    pipe.set_gallery(new_g, ["a", "b", "c"])
    assert not any(isinstance(k, tuple) and k and k[0] == "placement"
                   for k in pipe._jitted)
    out2 = pipe(frames)  # re-placement happens against the new gallery
    # gallery row 2 is now valid: sims against it must be finite/considered
    assert np.asarray(out2.match_sim).shape == np.asarray(out1.match_sim).shape


# ---------------------------------------------------------------------------
# Stage disaggregation (the PP axis): detect group | embed group
# ---------------------------------------------------------------------------

def _tiny_pipe(rng, gallery_rows=3):
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline

    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=0.0, pre_nms=16, max_det=2,
                        gallery_capacity=8, seed=0)
    g = rng.normal(size=(gallery_rows, 512)).astype(np.float32)
    pipe.set_gallery(g, [f"p{i}" for i in range(gallery_rows)])
    return pipe


def test_disagg_matches_colocated():
    """Detect on devices 0-3, embed on 4-7: outputs match the single-device
    pipeline (same jit closures, different placement)."""
    from scrfd_arcface_facerecognition_tpu.parallel import (
        DisaggPipeline, split_devices)

    rng = np.random.default_rng(7)
    pipe = _tiny_pipe(rng)
    det_g, emb_g = split_devices()
    assert len(det_g) == 4 and len(emb_g) == 4
    server = DisaggPipeline(pipe, det_g, emb_g)

    frames = rng.integers(0, 255, size=(8, 96, 96, 3), dtype=np.uint8)
    out = server(frames)
    out_ref = pipe(jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out.embeddings),
                               np.asarray(out_ref.embeddings), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.valid),
                                  np.asarray(out_ref.valid))
    np.testing.assert_array_equal(np.asarray(out.match_idx),
                                  np.asarray(out_ref.match_idx))
    # stage placement actually happened: detect weights live ONLY on the
    # det group, embedder weights ONLY on the emb group
    det_dev = {d.id for d in jax.tree.leaves(
        server._det_vars)[0].sharding.device_set}
    emb_dev = {d.id for d in jax.tree.leaves(
        server._emb_placed()[1])[0].sharding.device_set}
    assert det_dev == {d.id for d in det_g}
    assert emb_dev == {d.id for d in emb_g}


def test_disagg_sharded_gallery_matches_colocated():
    """PP x sharded gallery composition (VERDICT r3 item 5): the gallery
    row-shards over the embed group instead of replicating; GSPMD inserts
    the match argmax collective; outputs stay identical to the co-located
    pipeline."""
    from jax.sharding import PartitionSpec as P
    from scrfd_arcface_facerecognition_tpu.parallel import (
        DisaggPipeline, split_devices)

    rng = np.random.default_rng(11)
    pipe = _tiny_pipe(rng, gallery_rows=6)
    det_g, emb_g = split_devices()
    server = DisaggPipeline(pipe, det_g, emb_g, shard_gallery=True)

    frames = rng.integers(0, 255, size=(8, 96, 96, 3), dtype=np.uint8)
    out = server(frames)
    out_ref = pipe(jnp.asarray(frames))
    np.testing.assert_array_equal(np.asarray(out.match_idx),
                                  np.asarray(out_ref.match_idx))
    np.testing.assert_allclose(np.asarray(out.match_sim),
                               np.asarray(out_ref.match_sim), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.embeddings),
                               np.asarray(out_ref.embeddings), atol=1e-4)
    # the gallery is genuinely ROW-SHARDED over the embed group: each
    # embed device holds 1/len(emb_g) of the rows, and no detect device
    # holds any
    placed_gallery = server._emb_placed()[2]
    spec = placed_gallery.sharding.spec
    assert spec == P("data", None)
    assert ({d.id for d in placed_gallery.sharding.device_set}
            == {d.id for d in emb_g})
    shard_rows = {s.data.shape[0] for s in placed_gallery.addressable_shards}
    assert shard_rows == {placed_gallery.shape[0] // len(emb_g)}


def test_disagg_shard_auto_thresholds_on_bytes():
    from scrfd_arcface_facerecognition_tpu.parallel import (
        DisaggPipeline, split_devices)

    rng = np.random.default_rng(12)
    pipe = _tiny_pipe(rng)      # tiny gallery -> auto keeps replication
    server = DisaggPipeline(pipe, *split_devices(), shard_gallery="auto")
    placed = server._emb_placed()[2]
    assert len(placed.sharding.device_set) == 4   # replicated on emb group
    assert placed.sharding.is_fully_replicated


def test_disagg_stream_pipelines_batches():
    from scrfd_arcface_facerecognition_tpu.parallel import (
        DisaggPipeline, split_devices)

    rng = np.random.default_rng(8)
    pipe = _tiny_pipe(rng)
    server = DisaggPipeline(pipe, *split_devices(n_det=2))
    batches = [rng.integers(0, 255, size=(6, 96, 96, 3), dtype=np.uint8)
               for _ in range(4)]
    outs = list(server.process_stream(iter(batches), depth=2))
    assert len(outs) == 4
    ref = [pipe(jnp.asarray(b)) for b in batches]
    for o, r in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(o.embeddings),
                                   np.asarray(r.embeddings), atol=1e-4)


def test_disagg_set_gallery_repicks_placement():
    """set_gallery on the wrapped pipeline must reach the embed group on
    the next call (the placement cache keys on the source objects)."""
    from scrfd_arcface_facerecognition_tpu.parallel import (
        DisaggPipeline, split_devices)

    rng = np.random.default_rng(9)
    pipe = _tiny_pipe(rng, gallery_rows=2)
    server = DisaggPipeline(pipe, *split_devices())
    frames = rng.integers(0, 255, size=(8, 96, 96, 3), dtype=np.uint8)
    server(frames)
    first = server._emb_state[2][2]
    pipe.set_gallery(rng.normal(size=(3, 512)).astype(np.float32),
                     ["a", "b", "c"])
    server(frames)
    assert server._emb_state[2][2] is not first
    np.testing.assert_allclose(
        np.asarray(server._emb_state[2][2])[:3],
        np.asarray(pipe._gallery)[:3], atol=1e-6)


def test_disagg_rejects_bad_configs():
    import pytest
    from scrfd_arcface_facerecognition_tpu.parallel import (
        DisaggPipeline, split_devices)

    rng = np.random.default_rng(10)
    pipe = _tiny_pipe(rng)
    devs = jax.devices()
    with pytest.raises(ValueError, match="overlap"):
        DisaggPipeline(pipe, devs[:5], devs[4:])
    with pytest.raises(ValueError, match="non-empty"):
        split_devices(n_det=8)
    server = DisaggPipeline(pipe, *split_devices())
    with pytest.raises(ValueError, match="not divisible"):
        server(rng.integers(0, 255, size=(6, 96, 96, 3), dtype=np.uint8))


def test_custom_config_pipeline_serves():
    """Detector(config=...)/Embedder(config=...) serve custom architectures
    (e.g. ones trained here) through the full FacePipeline, including a
    non-512 embedding dim."""
    from scrfd_arcface_facerecognition_tpu.models.arcface import (
        ArcFaceConfig, )
    from scrfd_arcface_facerecognition_tpu.models.scrfd import SCRFDConfig
    from scrfd_arcface_facerecognition_tpu.pipeline import (
        Detector, Embedder, FacePipeline)

    det_cfg = SCRFDConfig("tiny_det", 8, (1, 1, 1, 1), (8, 8, 16, 16),
                          neck_filters=8, head_stacks=1, head_filters=16)
    emb_cfg = ArcFaceConfig(name="tiny_emb", arch="mobilefacenet",
                            mbf_blocks=(1, 1, 1, 1), mbf_scale=1, emb_dim=64)
    pipe = FacePipeline(
        detector=Detector(config=det_cfg, conf_thres=0.0, pre_nms=8,
                          max_det=2, seed=0, input_size=(64, 64)),
        embedder=Embedder(config=emb_cfg, seed=1),
        gallery_capacity=8)
    assert pipe.emb_dim == 64
    rng = np.random.default_rng(11)
    pipe.set_gallery(rng.normal(size=(3, 64)).astype(np.float32),
                     ["a", "b", "c"])
    out = pipe(rng.integers(0, 255, size=(2, 48, 64, 3), dtype=np.uint8))
    assert out.embeddings.shape == (2, 2, 64)
    assert np.isfinite(np.asarray(out.embeddings)).all()
