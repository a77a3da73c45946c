"""ONNX graph executor vs torch oracle, at full scale.

The executor (models/onnx_exec.py) must reproduce a torch-exported graph's
numerics exactly (same ops, same weights) — this is the graph-driven import
path that runs the released det_*/w600k_* files directly when present.
Graphs here are full-scale synthetic stand-ins (tests/torch_export.py)
with random weights, exercising every op idiom the released exports use.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from scrfd_arcface_facerecognition_tpu.models.onnx_exec import (
    OnnxModel, onnx_model)
from scrfd_arcface_facerecognition_tpu.models.onnx_proto import load_onnx
from torch_export import (TorchSCRFD, TorchIResNet, export_onnx, seeded)


def _run_exec(path, x_nchw):
    m = onnx_model(path)
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    outs = jax.jit(m.apply)(m.variables, x_nhwc)
    return [np.asarray(o) for o in outs]


def test_gn_reshape_resize_seams(tmp_path):
    """GroupNorm export idiom + nearest-resize + NCHW flatten + Gemm."""
    import torch.nn as nn
    import torch.nn.functional as F

    class Seams(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 16, 3, 2, 1)
            self.gn = nn.GroupNorm(4, 16)
            self.c2 = nn.Conv2d(16, 8, 1)
            self.fc = nn.Linear(8 * 16 * 16, 10)

        def forward(self, x):
            y = F.relu(self.gn(self.c1(x)))                # GN decomposition
            y = F.interpolate(y, scale_factor=2.0, mode="nearest")
            y = self.c2(y)
            return self.fc(torch.flatten(y, 1))

    m = seeded(Seams(), 1)
    x = torch.randn(2, 3, 16, 16, generator=torch.Generator().manual_seed(2))
    path = str(tmp_path / "seams.onnx")
    export_onnx(m, x, path)
    with torch.no_grad():
        want = m(x).numpy()
    got = _run_exec(path, x.numpy())[0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_executor_full_scale_scrfd(tmp_path):
    """Full det_10g-scale graph (deep stem, avg-down residuals, PAFPN,
    GN head, 9 reshaped outputs) matches torch exactly."""
    m = seeded(TorchSCRFD(), 0)
    x = torch.randn(1, 3, 640, 640,
                    generator=torch.Generator().manual_seed(1)) * 0.5
    path = str(tmp_path / "scrfd10g.onnx")
    export_onnx(m, x, path)
    with torch.no_grad():
        want = [o.numpy() for o in m(x)]
    got = _run_exec(path, x.numpy())
    assert len(got) == 9
    strides = [8, 16, 32]
    for i, (g, w) in enumerate(zip(got, want)):
        n = 2 * (640 // strides[i % 3]) ** 2
        c = [1, 4, 10][i // 3]
        assert g.shape == (1, n, c), (i, g.shape)
        np.testing.assert_allclose(g, w, atol=5e-3, rtol=1e-3,
                                   err_msg=f"output {i}")


def test_executor_full_scale_iresnet(tmp_path):
    """Full r50-scale ArcFace graph (BN-flatten-FC-BN head) matches torch."""
    m = seeded(TorchIResNet(blocks=(3, 4, 14, 3)), 0)
    x = torch.randn(2, 3, 112, 112,
                    generator=torch.Generator().manual_seed(3)) * 0.5
    path = str(tmp_path / "r50.onnx")
    export_onnx(m, x, path)
    with torch.no_grad():
        want = m(x).numpy()
    got = _run_exec(path, x.numpy())[0]
    assert got.shape == (2, 512)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    assert np.all(cos > 1 - 1e-5), cos
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_executor_weight_roundtrip(tmp_path):
    """Executor variables are a real pytree: jit with donated/updated
    weights works (the gallery/training side needs this)."""
    import torch.nn as nn

    class Tiny(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 4, 3, 1, 1)

        def forward(self, x):
            return self.c(x).relu()

    m = seeded(Tiny(), 0)
    x = torch.randn(1, 3, 8, 8, generator=torch.Generator().manual_seed(0))
    path = str(tmp_path / "tiny.onnx")
    export_onnx(m, x, path)
    ex = onnx_model(path)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out1 = jax.jit(ex.apply)(ex.variables, x_nhwc)[0]
    doubled = jax.tree.map(lambda a: a * 2, ex.variables)
    out2 = jax.jit(ex.apply)(doubled, x_nhwc)[0]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_pipeline_runs_on_graph_models(tmp_path):
    """FacePipeline with det_onnx/rec_onnx: the released-file path, end to
    end (letterbox -> graph SCRFD -> decode/NMS -> warp -> graph ArcFace ->
    match) on a small synthetic export."""
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline

    det = seeded(TorchSCRFD(stem=8, blocks=(1, 1, 1, 1),
                            planes=(8, 8, 16, 16), neck=8, head_feat=16,
                            head_stacks=1), 0)
    rec = seeded(TorchIResNet(blocks=(1, 1, 1, 1), planes=(8, 8, 16, 16),
                              emb=32), 0)
    dpath = str(tmp_path / "det.onnx")
    rpath = str(tmp_path / "rec.onnx")
    export_onnx(det, torch.randn(1, 3, 640, 640), dpath)
    export_onnx(rec, torch.randn(1, 3, 112, 112), rpath)

    # emb dim 32 != 512: wire the pipeline pieces directly
    pipe = FacePipeline(det_onnx=dpath, rec_onnx=rpath, conf_thres=0.0,
                        max_det=4, pre_nms=16, gallery_capacity=8,
                        use_pallas_warp=False)
    rng = np.random.default_rng(0)
    g = rng.normal(size=(4, 32)).astype(np.float32)
    pipe.gallery_capacity = 8
    buf = np.zeros((8, 32), np.float32)
    buf[:4] = g
    from scrfd_arcface_facerecognition_tpu import ops
    pipe._gallery = ops.l2_normalize(jnp.asarray(buf))
    pipe._gallery_valid = jnp.asarray([True] * 4 + [False] * 4)
    pipe.names = [f"p{i}" for i in range(4)]

    frames = jnp.asarray(rng.integers(0, 255, size=(1, 480, 640, 3),
                                      dtype=np.uint8))
    out = pipe(frames, max_num=2)
    assert out.boxes.shape[0] == 1
    assert np.isfinite(np.asarray(out.match_sim)).all()


def test_conv_auto_pad_same_upper(tmp_path):
    """auto_pad=SAME_UPPER (no explicit pads) must behave like SAME, not
    silently degrade to zero padding."""
    from onnx_writer import (encode_model, encode_node, encode_attr_ints,
                             encode_attr_string)
    import jax.lax as lax

    rng = np.random.default_rng(0)
    k = rng.normal(scale=0.1, size=(4, 2, 3, 3)).astype(np.float32)  # OIHW
    node = encode_node("Conv", ["x", "w"], ["y"], attrs=[
        encode_attr_string("auto_pad", "SAME_UPPER"),
        encode_attr_ints("kernel_shape", [3, 3]),
        encode_attr_ints("strides", [2, 2])])
    path = str(tmp_path / "sameupper.onnx")
    with open(path, "wb") as f:
        f.write(encode_model([node], {"w": k}, ["x"], ["y"]))
    m = onnx_model(path)
    x = rng.normal(size=(1, 7, 7, 2)).astype(np.float32)
    # outputs come back in ONNX (NCHW) semantics
    got = np.asarray(m.apply(m.variables, jnp.asarray(x))[0]
                     ).transpose(0, 2, 3, 1)
    # SAME with stride 2 on 7: out=4, total pad = 3*2+3-7 = 2 -> (1, 1)
    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k.transpose(2, 3, 1, 0)), (2, 2),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (1, 4, 4, 4)


def test_resize_sizes_input(tmp_path):
    """Resize with the opset-11 'sizes' input (absolute dims) must scale by
    sizes/current, not treat the values as scale factors."""
    from onnx_writer import (encode_model, encode_node, encode_attr_string,
                             encode_tensor)

    rng = np.random.default_rng(1)
    sizes = np.asarray([1, 3, 8, 8], np.int64)
    node = encode_node("Resize", ["x", "", "", "sizes"], ["y"], attrs=[
        encode_attr_string("mode", "nearest")])
    path = str(tmp_path / "resize_sizes.onnx")
    with open(path, "wb") as f:
        f.write(encode_model([node], {"sizes": sizes}, ["x"], ["y"]))
    m = onnx_model(path)
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)    # NHWC executor
    got = np.asarray(m.apply(m.variables, jnp.asarray(x))[0]
                     ).transpose(0, 2, 3, 1)                # NCHW out
    want = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
    np.testing.assert_allclose(got, want)
