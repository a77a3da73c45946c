"""ArcFace training: margin-loss math + sharded DP x TP train step."""
import numpy as np
import jax
import jax.numpy as jnp

from scrfd_arcface_facerecognition_tpu.models.arcface import (
    ArcFaceConfig, MobileFaceNet)
from scrfd_arcface_facerecognition_tpu.parallel import make_mesh
from scrfd_arcface_facerecognition_tpu.train import (
    ArcFaceTrainer, arcface_margin_logits, softmax_xent)


def _np_arcface_logits(emb, w, labels, s=64.0, m=0.5):
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    w_n = w / np.linalg.norm(w, axis=0, keepdims=True)
    cos = np.clip(emb_n @ w_n, -1, 1)
    theta = np.arccos(cos)
    out = cos.copy()
    for i, y in enumerate(labels):
        t = theta[i, y]
        if t + m < np.pi:
            out[i, y] = np.cos(t + m)
        else:
            out[i, y] = cos[i, y] - m * np.sin(m)
    return s * out


def test_margin_logits_match_numpy():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(6, 32)).astype(np.float32)
    w = rng.normal(size=(32, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=6)
    got = np.asarray(arcface_margin_logits(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels)))
    want = _np_arcface_logits(emb, w, labels)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_margin_increases_target_difficulty():
    """Margin logit for the target class <= plain cosine logit * s."""
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(4, 16)).astype(np.float32)
    w = rng.normal(size=(16, 5)).astype(np.float32)
    labels = np.arange(4) % 5
    with_m = np.asarray(arcface_margin_logits(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), m=0.5))
    no_m = np.asarray(arcface_margin_logits(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), m=0.0))
    for i, y in enumerate(labels):
        assert with_m[i, y] <= no_m[i, y] + 1e-5


def test_softmax_xent_matches_numpy():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(5, 9)).astype(np.float32)
    labels = rng.integers(0, 9, size=5)
    got = np.asarray(softmax_xent(jnp.asarray(logits), jnp.asarray(labels)))
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    want = -np.log(p[np.arange(5), labels])
    np.testing.assert_allclose(got, want, atol=1e-5)


def _tiny_trainer(mesh, num_classes=16):
    cfg = ArcFaceConfig(name="tiny", arch="mobilefacenet",
                        mbf_blocks=(1, 1, 1, 1), mbf_scale=1, emb_dim=64)
    model = MobileFaceNet(cfg)
    return ArcFaceTrainer(model=model, num_classes=num_classes, mesh=mesh,
                          emb_dim=64, learning_rate=0.1)


def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh((2, 4), ("data", "model"))
    trainer = _tiny_trainer(mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    images = rng.normal(size=(8, 112, 112, 3)).astype(np.float32)
    labels = rng.integers(0, 16, size=8).astype(np.int32)

    losses = []
    for _ in range(5):
        state, loss = trainer.train_step(state, jnp.asarray(images),
                                         jnp.asarray(labels))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizing a fixed batch must reduce loss
    assert int(state.step) == 5


def test_head_w_is_class_sharded():
    mesh = make_mesh((2, 4), ("data", "model"))
    trainer = _tiny_trainer(mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    from jax.sharding import PartitionSpec as P
    assert state.head_w.sharding.spec == P(None, "model")


def test_checkpoint_save_restore(tmp_path):
    mesh = make_mesh((2, 4), ("data", "model"))
    trainer = _tiny_trainer(mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(size=(8, 112, 112, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, size=8).astype(np.int32))
    state, _ = trainer.train_step(state, images, labels)

    path = str(tmp_path / "ckpt")
    trainer.save_checkpoint(state, path)
    restored = trainer.restore_checkpoint(path)
    assert int(restored.step) == 1
    np.testing.assert_allclose(np.asarray(restored.head_w),
                               np.asarray(state.head_w), atol=1e-6)
    # training continues from the restored state
    restored2, loss = trainer.train_step(restored, images, labels)
    assert np.isfinite(float(loss)) and int(restored2.step) == 2
