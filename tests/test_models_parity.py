"""Flax models vs torch.nn.functional oracle: layout + semantics parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scrfd_arcface_facerecognition_tpu import models
from scrfd_arcface_facerecognition_tpu.models.arcface import (
    ArcFaceConfig, IResNet, MobileFaceNet)
from scrfd_arcface_facerecognition_tpu.models.scrfd import SCRFDConfig, SCRFDNet

import torch_oracle as oracle


def _init(model, shape, seed=0):
    return model.init(jax.random.PRNGKey(seed), jnp.zeros(shape))


def _randomize_stats(variables, seed=0):
    """Give batch_stats non-trivial values so BN actually gets exercised."""
    rng = np.random.default_rng(seed)

    def fn(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.3, x.shape).astype(np.float32))
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 1.5, x.shape).astype(np.float32))
        return x

    stats = jax.tree_util.tree_map_with_path(fn, variables["batch_stats"])
    return dict(variables, batch_stats=stats)


def test_iresnet_small_parity():
    cfg = ArcFaceConfig(name="tiny_r", arch="iresnet",
                        stage_blocks=(1, 1, 1, 1), stage_filters=(8, 16, 24, 32))
    m = IResNet(cfg)
    v = _randomize_stats(_init(m, (1, 112, 112, 3)))
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, size=(2, 112, 112, 3)).astype(np.float32)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    want = oracle.oracle_iresnet(v, cfg, x)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_mobilefacenet_full_parity():
    cfg = models.ARCFACE_CONFIGS["w600k_mbf"]
    m = MobileFaceNet(cfg)
    v = _randomize_stats(_init(m, (1, 112, 112, 3)))
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, size=(2, 112, 112, 3)).astype(np.float32)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    want = oracle.oracle_mobilefacenet(v, cfg, x)
    cos = np.sum(got * want, 1) / (np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert np.all(cos > 0.99999), cos
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


def test_iresnet50_full_parity():
    cfg = models.ARCFACE_CONFIGS["w600k_r50"]
    m = models.build_arcface("w600k_r50")
    v = _randomize_stats(_init(m, (1, 112, 112, 3)))
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, size=(1, 112, 112, 3)).astype(np.float32)
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    want = oracle.oracle_iresnet(v, cfg, x)
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.99999, cos


def test_scrfd_tiny_parity():
    cfg = SCRFDConfig("tiny", 8, (1, 1, 1, 1), (8, 8, 16, 24),
                      neck_filters=16, head_stacks=2, head_filters=32)
    m = SCRFDNet(cfg)
    v = _randomize_stats(_init(m, (1, 128, 128, 3)))
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, size=(2, 128, 128, 3)).astype(np.float32)
    got = jax.tree.map(np.asarray, m.apply(v, jnp.asarray(x)))
    want = oracle.oracle_scrfd(v, cfg, x)
    for key in ("scores", "bboxes", "kps"):
        for li in range(3):
            np.testing.assert_allclose(got[key][li], want[key][li],
                                       atol=2e-3, rtol=1e-2,
                                       err_msg=f"{key}[{li}]")


def test_scrfd_output_contract():
    """9-output shape/order contract of scrfd.py:89-94 at 640x640."""
    m = models.build_scrfd("det_500m")
    v = _init(m, (1, 640, 640, 3))
    out = m.apply(v, jnp.zeros((1, 640, 640, 3)))
    for li, n in enumerate([80 * 80 * 2, 40 * 40 * 2, 20 * 20 * 2]):
        assert out["scores"][li].shape == (1, n, 1)
        assert out["bboxes"][li].shape == (1, n, 4)
        assert out["kps"][li].shape == (1, n, 10)
    s = np.asarray(out["scores"][0])
    assert (s >= 0).all() and (s <= 1).all()  # post-sigmoid


@pytest.mark.parametrize("name,budget_mb", [
    ("det_500m", 2.41), ("det_2.5g", 3.14), ("det_10g", 16.1)])
def test_scrfd_param_budget(name, budget_mb):
    m = models.build_scrfd(name)
    v = _init(m, (1, 64, 64, 3))
    mb = sum(np.prod(p.shape) for p in jax.tree.leaves(v["params"])) * 4 / 1e6
    assert 0.5 * budget_mb < mb < 1.6 * budget_mb, mb


@pytest.mark.parametrize("name,budget_mb", [
    ("w600k_mbf", 12.99), ("w600k_r50", 166.0)])
def test_arcface_param_budget(name, budget_mb):
    m = models.build_arcface(name)
    v = _init(m, (1, 112, 112, 3))
    mb = sum(np.prod(p.shape) for p in jax.tree.leaves(v["params"])) * 4 / 1e6
    assert 0.5 * budget_mb < mb < 1.6 * budget_mb, mb


def test_s2d_stem_exactly_equivalent():
    """s2d stem + transformed kernel == stride-2 3x3 stem, bit-for-bit-ish."""
    from scrfd_arcface_facerecognition_tpu.models.scrfd import (
        s2d_input, stem_kernel_to_s2d)
    import jax.lax as lax

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)

    want = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=(2, 2),
        padding=[(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w2 = stem_kernel_to_s2d(w)
    got = lax.conv_general_dilated(
        s2d_input(jnp.asarray(x)), jnp.asarray(w2), window_strides=(1, 1),
        padding=[(1, 0), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_s2d_model_matches_normal_model():
    """Full det model with s2d stem == normal model with transformed stem."""
    from scrfd_arcface_facerecognition_tpu.models.scrfd import (
        stem_kernel_to_s2d)
    import copy

    m0 = models.build_scrfd("det_500m")
    m1 = models.build_scrfd("det_500m", s2d_stem=True)
    v0 = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    v1 = jax.tree.map(np.asarray, dict(v0))
    v1 = copy.deepcopy(v1)
    v1["params"]["backbone"]["stem1"]["conv"]["kernel"] = stem_kernel_to_s2d(
        np.asarray(v0["params"]["backbone"]["stem1"]["conv"]["kernel"]))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    out0 = m0.apply(v0, x)
    out1 = m1.apply(v1, x)
    for key in ("scores", "bboxes", "kps"):
        for a, b in zip(out0[key], out1[key]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)


def test_trained_plain_stem_checkpoint_loads_into_s2d_detector():
    """Train->serve stem reconciliation: a plain (3,3,3,C) stem checkpoint
    (what tools/train_scrfd.py saves — training builds s2d_stem=False)
    loads into the serving Detector, whose default is the s2d stem, and
    produces the plain-stem model's outputs."""
    from scrfd_arcface_facerecognition_tpu.models.scrfd import (
        adapt_stem_variables)
    from scrfd_arcface_facerecognition_tpu.pipeline.detector import Detector

    m0 = models.build_scrfd("det_500m")
    v0 = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # the documented recipe: Detector(variant, variables=<trained ckpt>)
    det = Detector("det_500m", variables=v0, input_size=(64, 64),
                   conf_thres=0.003, pre_nms=32, max_det=4)
    assert tuple(det.variables["params"]["backbone"]["stem1"]["conv"]
                 ["kernel"].shape[:3]) == (2, 2, 12)
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    boxes, kps = det.detect(frame)     # runs: shapes reconciled
    det_plain = Detector("det_500m", variables=v0, input_size=(64, 64),
                         conf_thres=0.003, pre_nms=32, max_det=4,
                         s2d_stem=False)
    boxes0, kps0 = det_plain.detect(frame)
    np.testing.assert_allclose(boxes, boxes0, atol=1e-3, rtol=1e-4)

    # the adapter never mutates its input (copy-on-write along the path)
    assert tuple(v0["params"]["backbone"]["stem1"]["conv"]
                 ["kernel"].shape[:3]) == (3, 3, 3)

    # reverse direction converts exactly too (the s2d scatter is
    # injective; models/scrfd.py s2d_kernel_to_stem): s2d-layout variables
    # load into a plain-stem Detector and reproduce its outputs
    v_s2d = adapt_stem_variables(v0, s2d_stem=True)
    det_back = Detector("det_500m", variables=v_s2d, input_size=(64, 64),
                        conf_thres=0.003, pre_nms=32, max_det=4,
                        s2d_stem=False)
    boxes_b, _ = det_back.detect(frame)
    np.testing.assert_allclose(boxes_b, boxes0, atol=1e-3, rtol=1e-4)


def test_phase_split_stem_equivalent():
    """conv3x3_s1_phase_s2d == direct stride-1 3x3 conv, exactly (f32)."""
    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.models.layers import (
        conv3x3_s1_phase_s2d)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 8)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_s1_phase_s2d(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_iresnet_s2d_stem_same_params_same_output():
    """The s2d_stem flag changes execution, not the parameter tree or (up
    to float reassociation) the output."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.models.arcface import (
        ArcFaceConfig, IResNet)

    cfg = ArcFaceConfig(name="t", arch="iresnet", emb_dim=16,
                        stage_blocks=(1, 1, 1, 1), stage_filters=(8, 8, 8, 8))
    m0 = IResNet(cfg)
    m1 = IResNet(dc.replace(cfg, s2d_stem=True))
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 112, 112, 3)).astype(np.float32))
    v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
    # identical param tree -> v0 loads straight into the s2d variant
    y0 = m0.apply(v0, x, train=False)
    y1 = m1.apply(v0, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)
