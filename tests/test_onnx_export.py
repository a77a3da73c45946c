"""ONNX exporter: Flax models -> ModelProto bytes, validated both ways.

The exported graph must (a) reproduce the Flax forward when run through the
graph executor (models/onnx_exec.py — itself oracle-tested against
torch-exported graphs in test_onnx_exec*.py), and (b) round-trip through
the ordered importer (models/onnx_import.py) bit-exactly, proving the
weight-layout conversions are exact inverses. This closes the train ->
deploy loop: a model trained here drops into the reference's onnxruntime
serving stack (/root/reference/models/scrfd.py:59-61, arcface.py:18-21).
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scrfd_arcface_facerecognition_tpu.models.arcface import (
    ARCFACE_CONFIGS, ArcFaceConfig, IResNet, MobileFaceNet, build_arcface)
from scrfd_arcface_facerecognition_tpu.models.scrfd import (
    SCRFD_CONFIGS, SCRFDConfig, SCRFDNet, adapt_stem_variables, build_scrfd)
from scrfd_arcface_facerecognition_tpu.models.onnx_export import (
    export_arcface, export_model, export_scrfd, s2d_kernel_to_stem)
from scrfd_arcface_facerecognition_tpu.models.onnx_proto import load_onnx
from scrfd_arcface_facerecognition_tpu.models.onnx_exec import OnnxModel
from scrfd_arcface_facerecognition_tpu.models import onnx_import as oi
from scrfd_arcface_facerecognition_tpu.models.scrfd import stem_kernel_to_s2d

TINY_IRES = ArcFaceConfig(name="tiny_ires", arch="iresnet", emb_dim=32,
                          stage_blocks=(1, 1, 1, 1),
                          stage_filters=(8, 8, 16, 16))
TINY_MBF = ArcFaceConfig(name="tiny_mbf", arch="mobilefacenet", emb_dim=32,
                         mbf_blocks=(1, 1, 1, 1), mbf_scale=1)
TINY_DET = SCRFDConfig("tiny_det", 8, (1, 1, 1, 1), (8, 8, 16, 16),
                       neck_filters=8, head_stacks=2, head_filters=16)


def _randomize(vars_, seed=0):
    """Random weights with SANE statistics: He-scaled kernels, BN params
    near identity, var > 0. Keeps activations O(1) through 50-layer nets
    so parity diffs measure the export, not catastrophic cancellation at
    exploded magnitudes."""
    rng = np.random.default_rng(seed)

    def f(path, a):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "var":
            return jnp.asarray(
                rng.uniform(0.5, 2.0, a.shape).astype(np.float32))
        if name == "scale" or name.startswith("scale"):
            return jnp.asarray(
                rng.uniform(0.8, 1.2, a.shape).astype(np.float32))
        if name in ("bias", "mean", "alpha"):
            return jnp.asarray(
                rng.normal(size=a.shape, scale=0.1).astype(np.float32))
        fan_out = a.shape[-1] if a.ndim >= 1 else 1
        rec = int(np.prod(a.shape[:-2])) if a.ndim > 2 else 1
        std = float(np.sqrt(2.0 / max(fan_out * rec, 1)))
        return jnp.asarray(
            rng.normal(size=a.shape, scale=std).astype(np.float32))

    return jax.tree_util.tree_map_with_path(f, vars_)


def _build(model, shape, seed=0):
    x = np.random.default_rng(seed + 7).normal(size=shape).astype(np.float32)
    vars_ = _randomize(model.init(jax.random.PRNGKey(seed), jnp.asarray(x)),
                       seed)
    return x, vars_


def _run_exported(path, x):
    om = OnnxModel(load_onnx(path))
    return [np.asarray(o) for o in om.apply(om.variables, jnp.asarray(x))]


def _flat_det(out):
    return [np.asarray(o) for o in out["scores"] + out["bboxes"] + out["kps"]]


# ----------------------------------------------------------- executor parity


@pytest.mark.parametrize("cfg", [TINY_IRES, TINY_MBF], ids=["ires", "mbf"])
def test_embedder_export_executor_parity(tmp_path, cfg):
    model = IResNet(cfg) if cfg.arch == "iresnet" else MobileFaceNet(cfg)
    x, vars_ = _build(model, (2, 112, 112, 3))
    ref = np.asarray(model.apply(vars_, jnp.asarray(x)))
    path = str(tmp_path / "emb.onnx")
    export_arcface(model, vars_, path)
    out = _run_exported(path, x)[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_mbf_multiblock_stage0_export(tmp_path):
    """mbf_blocks[0] > 1 takes the residual stage-0 path (distinct graph)."""
    cfg = dataclasses.replace(TINY_MBF, mbf_blocks=(2, 1, 1, 1))
    model = MobileFaceNet(cfg)
    x, vars_ = _build(model, (1, 112, 112, 3))
    ref = np.asarray(model.apply(vars_, jnp.asarray(x)))
    path = str(tmp_path / "emb.onnx")
    export_arcface(model, vars_, path)
    np.testing.assert_allclose(_run_exported(path, x)[0], ref,
                               atol=1e-4, rtol=1e-4)


def test_scrfd_export_executor_parity(tmp_path):
    model = SCRFDNet(TINY_DET)
    x, vars_ = _build(model, (2, 64, 64, 3))
    ref = _flat_det(model.apply(vars_, jnp.asarray(x)))
    path = str(tmp_path / "det.onnx")
    export_scrfd(model, vars_, path)
    outs = _run_exported(path, x)
    assert len(outs) == 9          # [score x3, bbox x3, kps x3]
    for r, o in zip(ref, outs):
        assert o.shape == r.shape
        np.testing.assert_allclose(o, r, atol=2e-5)
    # anchor-count contract: (B, Hs*Ws*2, {1,4,10}) per stride
    for i, s in enumerate((8, 16, 32)):
        n = (64 // s) * (64 // s) * 2
        assert outs[i].shape == (2, n, 1)
        assert outs[3 + i].shape == (2, n, 4)
        assert outs[6 + i].shape == (2, n, 10)


def test_scrfd_export_input_size_free(tmp_path):
    """No baked spatial dims: one exported graph serves multiple canvases."""
    model = SCRFDNet(TINY_DET)
    x, vars_ = _build(model, (1, 64, 64, 3))
    path = str(tmp_path / "det.onnx")
    export_scrfd(model, vars_, path)
    x2 = np.random.default_rng(3).normal(size=(1, 96, 64, 3)).astype(
        np.float32)
    ref = _flat_det(model.apply(vars_, jnp.asarray(x2)))
    for r, o in zip(ref, _run_exported(path, x2)):
        np.testing.assert_allclose(o, r, atol=2e-5)


def test_scrfd_s2d_stem_exports_plain(tmp_path):
    """A serving Detector's s2d-layout variables export as the equivalent
    plain stride-2 stem (models/scrfd.py adapt_stem_variables inverse)."""
    plain = SCRFDNet(TINY_DET)
    x, vars_ = _build(plain, (1, 64, 64, 3))
    s2d_model = SCRFDNet(dataclasses.replace(TINY_DET, s2d_stem=True))
    s2d_vars = adapt_stem_variables(vars_, True)
    ref = _flat_det(plain.apply(vars_, jnp.asarray(x)))
    path = str(tmp_path / "det.onnx")
    export_scrfd(s2d_model, s2d_vars, path)
    for r, o in zip(ref, _run_exported(path, x)):
        np.testing.assert_allclose(o, r, atol=2e-5)


def test_s2d_kernel_inverse_exact():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)
    np.testing.assert_array_equal(
        s2d_kernel_to_stem(stem_kernel_to_s2d(w)), w)


def test_s2d_kernel_inverse_rejects_true_4x4():
    """A kernel with weight OUTSIDE the scatter image (trained as a real
    4x4 s2d conv) has no 3x3 equivalent: raise, don't drop weights."""
    w = stem_kernel_to_s2d(
        np.random.default_rng(0).normal(size=(3, 3, 3, 8))
        .astype(np.float32))
    bad = w.copy()
    bad[0, 0, 0, 0] += 1.0   # slot the scatter never writes
    assert np.all(w[0, 0, 0] == 0)
    with pytest.raises(ValueError, match="no exact plain-stem"):
        s2d_kernel_to_stem(bad)


def test_negative_attribute_ints_roundtrip(tmp_path):
    """Protobuf varints for negative ints (axis=-1, Slice end=-1) encode
    as 64-bit two's complement — regression for an infinite loop."""
    from scrfd_arcface_facerecognition_tpu.models.onnx_write import (
        encode_attr_int, encode_attr_ints, encode_model, encode_node)

    nodes = [encode_node("Flatten", ["x"], ["y"],
                         attrs=[encode_attr_int("axis", -1)]),
             encode_node("Slice", ["y"], ["z"],
                         attrs=[encode_attr_ints("starts", [0]),
                                encode_attr_ints("ends", [-1]),
                                encode_attr_ints("axes", [-1])])]
    p = str(tmp_path / "neg.onnx")
    with open(p, "wb") as f:
        f.write(encode_model(nodes, {}, ["x"], ["z"]))
    g = load_onnx(p)
    assert g.nodes[0].attrs["axis"] == -1
    assert g.nodes[1].attrs["ends"] == [-1]
    assert g.nodes[1].attrs["axes"] == [-1]


def test_exported_graph_io_carries_type_info(tmp_path):
    """onnxruntime rejects models whose graph IO lacks a TypeProto; check
    the exported bytes carry elem_type + shape on input and outputs by
    decoding the ValueInfoProto wire format directly (this repo's parser
    ignores it, so a byte-level check is the only in-env validation)."""
    from scrfd_arcface_facerecognition_tpu.models.onnx_proto import (
        iter_fields)

    model = SCRFDNet(TINY_DET)
    _, vars_ = _build(model, (1, 64, 64, 3))
    data = export_scrfd(model, vars_)

    def value_infos(buf):
        for field, wire, val in iter_fields(buf):
            if field == 7 and wire == 2:               # ModelProto.graph
                for f2, w2, v2 in iter_fields(val):
                    if f2 in (11, 12) and w2 == 2:     # input / output
                        yield f2, v2

    def parse_vi(buf):
        name, elem, dims = None, None, []
        for f, w, v in iter_fields(buf):
            if f == 1 and w == 2:
                name = v.decode()
            elif f == 2 and w == 2:                    # TypeProto
                for f3, w3, v3 in iter_fields(v):
                    if f3 == 1 and w3 == 2:            # tensor_type
                        for f4, w4, v4 in iter_fields(v3):
                            if f4 == 1 and w4 == 0:
                                elem = v4
                            elif f4 == 2 and w4 == 2:  # shape
                                for f5, w5, v5 in iter_fields(v4):
                                    if f5 == 1 and w5 == 2:
                                        dims.append(v5)
        return name, elem, dims

    vis = list(value_infos(data))
    assert sum(1 for f, _ in vis if f == 11) == 1      # one data input
    assert sum(1 for f, _ in vis if f == 12) == 9      # nine outputs
    for _, buf in vis:
        name, elem, dims = parse_vi(buf)
        assert name, "ValueInfo without a name"
        assert elem == 1, f"{name}: missing/wrong elem_type (want f32)"
        assert len(dims) in (3, 4), f"{name}: missing shape dims"


# ----------------------------------------------------- importer round-trips


def test_embedder_importer_roundtrip_bitexact(tmp_path):
    for cfg in (TINY_IRES, TINY_MBF):
        model = IResNet(cfg) if cfg.arch == "iresnet" else MobileFaceNet(cfg)
        x, vars_ = _build(model, (2, 112, 112, 3))
        path = str(tmp_path / f"{cfg.name}.onnx")
        export_arcface(model, vars_, path)
        v2 = oi.load_arcface_weights(model, path)
        ref = np.asarray(model.apply(vars_, jnp.asarray(x)))
        out = np.asarray(model.apply(v2, jnp.asarray(x)))
        np.testing.assert_array_equal(out, ref)   # bit-exact


def test_scrfd_importer_roundtrip_bitexact(tmp_path):
    model = SCRFDNet(TINY_DET)
    x, vars_ = _build(model, (1, 64, 64, 3))
    path = str(tmp_path / "det.onnx")
    export_scrfd(model, vars_, path)
    v2 = oi.load_scrfd_weights(model, path)
    ref = _flat_det(model.apply(vars_, jnp.asarray(x)))
    out = _flat_det(model.apply(v2, jnp.asarray(x)))
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(o, r)


# -------------------------------------------------------------- graph shape


def test_shared_head_weights_registered_once(tmp_path):
    """The head tower/branch weights appear ONCE and are referenced by all
    three FPN levels (like the released files), not duplicated per level."""
    model = SCRFDNet(TINY_DET)
    _, vars_ = _build(model, (1, 64, 64, 3))
    path = str(tmp_path / "det.onnx")
    export_scrfd(model, vars_, path)
    g = load_onnx(path)
    for wname in ("tower0_w", "tower1_w", "cls_w", "box_w", "kps_w"):
        assert wname in g.initializers
        users = sum(wname in n.inputs for n in g.nodes)
        assert users == 3, f"{wname} used {users}x (want one per level)"


def test_export_model_dispatch(tmp_path):
    det = SCRFDNet(TINY_DET)
    _, dv = _build(det, (1, 64, 64, 3))
    emb = MobileFaceNet(TINY_MBF)
    _, ev = _build(emb, (1, 112, 112, 3))
    assert len(load_onnx_bytes(export_model(det, dv)).outputs) == 9
    assert len(load_onnx_bytes(export_model(emb, ev)).outputs) == 1


def load_onnx_bytes(data):
    import tempfile, os
    fd, p = tempfile.mkstemp(suffix=".onnx")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return load_onnx(p)
    finally:
        os.unlink(p)


def test_exported_detector_serves_via_jitted_graph_path(tmp_path):
    """The exported file plugs into the serving Detector's graph path
    (Detector(onnx_path=...)), whose apply is JITTED over the variables.

    Regression: initializer-backed structural constants (Reshape shapes,
    Resize scales) become tracers under jit; the executor must resolve
    them from the parsed graph bytes (onnx_exec._static_np), not env —
    torch-exported graphs masked this by using Constant nodes."""
    from scrfd_arcface_facerecognition_tpu.pipeline.detector import Detector

    model = SCRFDNet(TINY_DET)
    x, vars_ = _build(model, (1, 64, 64, 3))
    path = str(tmp_path / "det.onnx")
    export_scrfd(model, vars_, path)
    det = Detector("tiny", onnx_path=path, input_size=(64, 64),
                   conf_thres=0.003, pre_nms=16, max_det=4)
    frame = np.random.default_rng(5).integers(
        0, 255, size=(48, 64, 3), dtype=np.uint8)
    boxes, kps = det.detect(frame)
    assert boxes.shape == (4, 5) and kps.shape == (4, 5, 2)
    assert np.isfinite(boxes).all()


def test_exported_pair_drives_full_face_pipeline(tmp_path):
    """An exported detector + embedder pair drives the complete fused
    FacePipeline (detect -> warp -> embed -> match) — the consumption
    path the realtime CLI takes for --det-weight/--rec-weight files."""
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline
    from scrfd_arcface_facerecognition_tpu.pipeline.detector import Detector
    from scrfd_arcface_facerecognition_tpu.pipeline.embedder import Embedder

    det_m = SCRFDNet(TINY_DET)
    _, det_v = _build(det_m, (1, 64, 64, 3))
    cfg512 = dataclasses.replace(TINY_MBF, emb_dim=512)  # pipeline gallery
    emb_m = MobileFaceNet(cfg512)                        # contract is 512-d
    _, emb_v = _build(emb_m, (1, 112, 112, 3), seed=1)
    det_path = str(tmp_path / "det.onnx")
    emb_path = str(tmp_path / "emb.onnx")
    export_scrfd(det_m, det_v, det_path)
    export_arcface(emb_m, emb_v, emb_path)

    pipe = FacePipeline(
        detector=Detector("tiny", onnx_path=det_path, input_size=(64, 64),
                          conf_thres=0.0, pre_nms=16, max_det=2),
        embedder=Embedder("tiny", onnx_path=emb_path),
        gallery_capacity=8)
    rng = np.random.default_rng(9)
    gal = rng.normal(size=(3, 512)).astype(np.float32)
    pipe.set_gallery(gal, ["a", "b", "c"])
    frames = rng.integers(0, 255, size=(2, 48, 64, 3), dtype=np.uint8)
    out = pipe(frames)
    assert out.boxes.shape[0] == 2
    assert out.embeddings.shape == (2, 2, 512)
    assert np.isfinite(np.asarray(out.match_sim)).all()


# ------------------------------------------------------- full-scale (slow)


@pytest.mark.slow
def test_full_scale_det10g_export(tmp_path):
    model = build_scrfd("det_10g")
    x, vars_ = _build(model, (1, 320, 320, 3))
    ref = _flat_det(model.apply(vars_, jnp.asarray(x)))
    path = str(tmp_path / "det_10g.onnx")
    export_scrfd(model, vars_, path)
    for r, o in zip(ref, _run_exported(path, x)):
        np.testing.assert_allclose(o, r, atol=1e-4)


@pytest.mark.slow
def test_full_scale_r50_export(tmp_path):
    """24 residual blocks of random weights explode activations to ~1e6,
    so elementwise f32 comparison measures conditioning, not the export;
    assert the framework's parity metric (cosine, budget 1e-3) + norm."""
    model = build_arcface("w600k_r50")
    x, vars_ = _build(model, (1, 112, 112, 3))
    ref = np.asarray(model.apply(vars_, jnp.asarray(x))).reshape(-1)
    path = str(tmp_path / "w600k_r50.onnx")
    export_arcface(model, vars_, path)
    out = _run_exported(path, x)[0].reshape(-1)
    cos = float(np.dot(ref, out)
                / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 1 - 1e-6, f"cosine {cos}"
    np.testing.assert_allclose(np.linalg.norm(out), np.linalg.norm(ref),
                               rtol=1e-4)


@pytest.mark.slow
def test_full_scale_mbf_export_and_reimport(tmp_path):
    model = build_arcface("w600k_mbf")
    x, vars_ = _build(model, (1, 112, 112, 3))
    ref = np.asarray(model.apply(vars_, jnp.asarray(x)))
    path = str(tmp_path / "w600k_mbf.onnx")
    export_arcface(model, vars_, path)
    np.testing.assert_allclose(_run_exported(path, x)[0], ref,
                               atol=1e-4, rtol=1e-4)
    v2 = oi.load_arcface_weights(model, path)
    np.testing.assert_array_equal(
        np.asarray(model.apply(v2, jnp.asarray(x))), ref)
