"""ONNX importer: parser + conversion conventions, end to end.

Synthetic ONNX graphs (built with tests/onnx_writer.py) are imported into
small Flax models; the Flax forward must reproduce the graph's semantics
computed independently with numpy/torch.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from scrfd_arcface_facerecognition_tpu.models.onnx_proto import load_onnx
from scrfd_arcface_facerecognition_tpu.models import onnx_import as oi
from scrfd_arcface_facerecognition_tpu.models.layers import PReLU
from onnx_writer import (encode_model, encode_node, encode_attr_int,
                         encode_attr_ints)


def _write_model(tmp_path, nodes, inits, inputs, outputs, name="m.onnx"):
    path = str(tmp_path / name)
    with open(path, "wb") as f:
        f.write(encode_model(nodes, inits, inputs, outputs))
    return path


def test_parse_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    ids = np.asarray([1, 2, 3], np.int64)
    nodes = [encode_node("Conv", ["x", "w"], ["y"], name="conv0",
                         attrs=[encode_attr_int("group", 1),
                                encode_attr_ints("pads", [1, 1, 1, 1])])]
    path = _write_model(tmp_path, nodes, {"w": w, "ids": ids}, ["x"], ["y"])
    g = load_onnx(path)
    assert len(g.nodes) == 1
    assert g.nodes[0].op_type == "Conv"
    assert g.nodes[0].inputs == ["x", "w"]
    assert g.nodes[0].attrs["group"] == 1
    assert g.nodes[0].attrs["pads"] == [1, 1, 1, 1]
    np.testing.assert_array_equal(g.initializers["w"], w)
    np.testing.assert_array_equal(g.initializers["ids"], ids)
    assert g.inputs == ["x"] and g.outputs == ["y"]


def test_conv_kernel_layout():
    rng = np.random.default_rng(1)
    w_oihw = rng.normal(size=(16, 4, 3, 3)).astype(np.float32)
    w_hwio = oi.conv_kernel_to_flax(w_oihw)
    assert w_hwio.shape == (3, 3, 4, 16)
    # spot-check an element: OIHW[o,i,h,w] == HWIO[h,w,i,o]
    assert w_oihw[5, 2, 1, 0] == w_hwio[1, 0, 2, 5]


def test_fc_kernel_nchw_to_nhwc_flatten():
    """The Gemm weight permutation must make NHWC-flatten forward equal the
    ONNX NCHW-flatten semantics."""
    rng = np.random.default_rng(2)
    c, h, w, out = 6, 4, 5, 7
    feat_nhwc = rng.normal(size=(1, h, w, c)).astype(np.float32)
    w_onnx = rng.normal(size=(out, c * h * w)).astype(np.float32)

    want = w_onnx @ feat_nhwc[0].transpose(2, 0, 1).reshape(-1)  # NCHW flatten
    kernel = oi.fc_kernel_to_flax(w_onnx, (c, h, w))
    got = feat_nhwc[0].reshape(-1) @ kernel                      # NHWC flatten
    np.testing.assert_allclose(got, want, rtol=1e-5)


class TinyNet(nn.Module):
    """conv-bn-prelu -> dwconv-bn -> flatten -> dense (definition order)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="c1")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         name="b1")(x)
        x = PReLU(name="p1")(x)
        x = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    feature_group_count=8, name="c2")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         name="b2")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(4, use_bias=True, name="fc")(x)
        return x


def _tiny_onnx(tmp_path, rng, hw=6):
    """ONNX graph matching TinyNet: Conv-BN-PRelu-Conv(group)-BN-Gemm."""
    c1 = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    bn1 = [rng.uniform(0.5, 1.5, 8).astype(np.float32),
           rng.normal(size=8).astype(np.float32),
           rng.normal(scale=0.3, size=8).astype(np.float32),
           rng.uniform(0.5, 1.5, 8).astype(np.float32)]
    slope = rng.uniform(0.1, 0.4, size=(8, 1, 1)).astype(np.float32)
    c2 = rng.normal(size=(8, 1, 3, 3)).astype(np.float32)  # depthwise OIHW
    bn2 = [rng.uniform(0.5, 1.5, 8).astype(np.float32),
           rng.normal(size=8).astype(np.float32),
           rng.normal(scale=0.3, size=8).astype(np.float32),
           rng.uniform(0.5, 1.5, 8).astype(np.float32)]
    w_fc = rng.normal(size=(4, 8 * hw * hw)).astype(np.float32)
    b_fc = rng.normal(size=4).astype(np.float32)

    inits = {"c1_w": c1, "bn1_s": bn1[0], "bn1_b": bn1[1], "bn1_m": bn1[2],
             "bn1_v": bn1[3], "p1_s": slope, "c2_w": c2, "bn2_s": bn2[0],
             "bn2_b": bn2[1], "bn2_m": bn2[2], "bn2_v": bn2[3],
             "fc_w": w_fc, "fc_b": b_fc}
    nodes = [
        encode_node("Conv", ["x", "c1_w"], ["t1"],
                    attrs=[encode_attr_ints("pads", [1, 1, 1, 1])]),
        encode_node("BatchNormalization",
                    ["t1", "bn1_s", "bn1_b", "bn1_m", "bn1_v"], ["t2"]),
        encode_node("PRelu", ["t2", "p1_s"], ["t3"]),
        encode_node("Conv", ["t3", "c2_w"], ["t4"],
                    attrs=[encode_attr_int("group", 8),
                           encode_attr_ints("pads", [1, 1, 1, 1])]),
        encode_node("BatchNormalization",
                    ["t4", "bn2_s", "bn2_b", "bn2_m", "bn2_v"], ["t5"]),
        encode_node("Flatten", ["t5"], ["t6"]),
        encode_node("Gemm", ["t6", "fc_w", "fc_b"], ["y"],
                    attrs=[encode_attr_int("transB", 1)]),
    ]
    path = _write_model(tmp_path, nodes, inits, ["x"], ["y"])
    return path, inits


def _torch_reference(inits, x_nchw, hw):
    import torch
    import torch.nn.functional as F

    t = torch.tensor(x_nchw)
    t = F.conv2d(t, torch.tensor(inits["c1_w"]), padding=1)
    t = F.batch_norm(t, torch.tensor(inits["bn1_m"]), torch.tensor(inits["bn1_v"]),
                     torch.tensor(inits["bn1_s"]), torch.tensor(inits["bn1_b"]),
                     training=False, eps=1e-5)
    slope = torch.tensor(inits["p1_s"]).view(1, -1, 1, 1)
    t = torch.where(t >= 0, t, slope * t)
    t = F.conv2d(t, torch.tensor(inits["c2_w"]), padding=1, groups=8)
    t = F.batch_norm(t, torch.tensor(inits["bn2_m"]), torch.tensor(inits["bn2_v"]),
                     torch.tensor(inits["bn2_s"]), torch.tensor(inits["bn2_b"]),
                     training=False, eps=1e-5)
    flat = t.reshape(t.shape[0], -1)  # NCHW flatten, ONNX semantics
    y = flat @ torch.tensor(inits["fc_w"]).T + torch.tensor(inits["fc_b"])
    return y.numpy()


def test_end_to_end_import_matches_onnx_semantics(tmp_path):
    rng = np.random.default_rng(3)
    hw = 6
    path, inits = _tiny_onnx(tmp_path, rng, hw)
    graph = load_onnx(path)

    model = TinyNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
    imported = oi.import_into_variables(
        jax.tree.map(np.asarray, dict(variables)), graph, fc_chw=(8, hw, hw),
        module_order=oi.module_call_order(model, (1, hw, hw, 3)))

    x = rng.normal(size=(2, hw, hw, 3)).astype(np.float32)
    got = np.asarray(model.apply(imported, jnp.asarray(x)))
    want = _torch_reference(inits, x.transpose(0, 3, 1, 2), hw)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_conv_bias_plus_bn_folds_into_mean(tmp_path):
    """Unfused Conv(with bias) -> BatchNormalization loading into a
    bias-free ConvBN module: the conv bias must fold into the BN running
    mean (BN(conv+b) == BN' (conv) with mean-b), not silently drop."""
    rng = np.random.default_rng(7)
    hw = 5
    cw = rng.normal(size=(6, 3, 3, 3)).astype(np.float32)
    cb = rng.normal(size=6).astype(np.float32) * 3.0   # large: drop is loud
    bn = [rng.uniform(0.5, 1.5, 6).astype(np.float32),
          rng.normal(size=6).astype(np.float32),
          rng.normal(scale=0.3, size=6).astype(np.float32),
          rng.uniform(0.5, 1.5, 6).astype(np.float32)]
    inits = {"c_w": cw, "c_b": cb, "bn_s": bn[0], "bn_b": bn[1],
             "bn_m": bn[2], "bn_v": bn[3]}
    nodes = [
        encode_node("Conv", ["x", "c_w", "c_b"], ["t1"],
                    attrs=[encode_attr_ints("pads", [1, 1, 1, 1])]),
        encode_node("BatchNormalization",
                    ["t1", "bn_s", "bn_b", "bn_m", "bn_v"], ["y"]),
    ]
    path = _write_model(tmp_path, nodes, inits, ["x"], ["y"])
    graph = load_onnx(path)

    class ConvBNNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(6, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name="c1")(x)
            return nn.BatchNorm(use_running_average=not train,
                                epsilon=1e-5, name="b1")(x)

    model = ConvBNNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
    imported = oi.import_into_variables(
        jax.tree.map(np.asarray, dict(variables)), graph,
        module_order=oi.module_call_order(model, (1, hw, hw, 3)))

    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(2, hw, hw, 3)).astype(np.float32)
    t = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(cw),
                 bias=torch.tensor(cb), padding=1)
    t = F.batch_norm(t, torch.tensor(bn[2]), torch.tensor(bn[3]),
                     torch.tensor(bn[0]), torch.tensor(bn[1]),
                     training=False, eps=1e-5)
    want = t.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(imported, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_import_rejects_shape_mismatch(tmp_path):
    rng = np.random.default_rng(4)
    path, _ = _tiny_onnx(tmp_path, rng, hw=6)
    graph = load_onnx(path)

    class WrongNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(16, (3, 3), use_bias=False, name="c1")(x)  # 16 != 8
            return x.reshape(x.shape[0], -1)

    model = WrongNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 3)))
    with pytest.raises(oi.ImportError_):
        oi.import_into_variables(jax.tree.map(np.asarray, dict(variables)),
                                 graph)


def test_loader_entrypoints_exist():
    """API surface for when real weights are provided (README workflow)."""
    assert callable(oi.load_arcface_weights)
    assert callable(oi.load_scrfd_weights)


def test_fc_layout_inferred_from_graph(tmp_path):
    """No fc_chw hint: the flatten permutation comes from executor shape
    inference on the graph (graph-driven, replacing the old shape-guessing)."""
    rng = np.random.default_rng(7)
    hw = 6
    path, inits = _tiny_onnx(tmp_path, rng, hw)
    graph = load_onnx(path)

    model = TinyNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
    imported = oi.import_into_variables(
        jax.tree.map(np.asarray, dict(variables)), graph,
        input_shape=(1, hw, hw, 3),
        module_order=oi.module_call_order(model, (1, hw, hw, 3)))

    x = rng.normal(size=(2, hw, hw, 3)).astype(np.float32)
    got = np.asarray(model.apply(imported, jnp.asarray(x)))
    want = _torch_reference(inits, x.transpose(0, 3, 1, 2), hw)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
