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
