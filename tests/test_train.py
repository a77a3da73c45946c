"""ArcFace training: margin-loss math + sharded DP x TP train step."""
import numpy as np
import pytest
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


def test_partial_fc_sample_includes_positives_static_shape():
    from scrfd_arcface_facerecognition_tpu.train import partial_fc_sample

    rng = np.random.default_rng(4)
    labels = jnp.asarray(rng.integers(0, 1000, size=32).astype(np.int32))
    idx, new_labels, matched = jax.jit(
        lambda l, k: partial_fc_sample(l, 1000, 128, k))(
            labels, jax.random.PRNGKey(0))
    assert idx.shape == (128,) and new_labels.shape == (32,)
    idx_np, nl_np, l_np = (np.asarray(idx), np.asarray(new_labels),
                           np.asarray(labels))
    assert np.asarray(matched).all()   # 32 positives <= 128 samples
    # every positive class is in the sample, and the remap points at it
    for i, y in enumerate(l_np):
        assert y in idx_np
        assert idx_np[nl_np[i]] == y
    # sampled ids are distinct classes
    assert len(np.unique(idx_np)) == 128


def test_partial_fc_sample_flags_overflow_positives():
    """More unique positives than num_sample: the overflow rows are
    flagged unmatched (the loss masks them) instead of silently remapping
    to position 0 — training them toward another sample's identity."""
    from scrfd_arcface_facerecognition_tpu.train import partial_fc_sample

    labels = jnp.arange(12, dtype=jnp.int32)      # 12 distinct classes
    idx, new_labels, matched = partial_fc_sample(
        labels, 100, 8, jax.random.PRNGKey(3))    # only 8 slots
    m = np.asarray(matched)
    assert m.sum() == 8                           # 8 fit, 4 overflow
    idx_np, nl_np, l_np = (np.asarray(idx), np.asarray(new_labels),
                           np.asarray(labels))
    for i in range(12):
        if m[i]:
            assert idx_np[nl_np[i]] == l_np[i]    # matched rows map right


def test_partial_fc_full_rate_loss_matches_full_softmax():
    """sample_rate=1.0 via the sampled path == full softmax (permutation
    invariance of softmax): losses agree to float tolerance."""
    from scrfd_arcface_facerecognition_tpu.train import (
        arcface_margin_logits, partial_fc_sample, softmax_xent)

    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 20)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 20, size=6).astype(np.int32))

    full = softmax_xent(arcface_margin_logits(emb, w, labels), labels)
    idx, new_labels, _ = partial_fc_sample(labels, 20, 20,
                                           jax.random.PRNGKey(1))
    samp = softmax_xent(
        arcface_margin_logits(emb, w[:, idx], new_labels), new_labels)
    np.testing.assert_allclose(np.asarray(samp), np.asarray(full), atol=1e-4)


@pytest.mark.slow
def test_partial_fc_train_step_runs_and_learns():
    mesh = make_mesh((2, 4), ("data", "model"))
    cfg = ArcFaceConfig(name="tiny", arch="mobilefacenet",
                        mbf_blocks=(1, 1, 1, 1), mbf_scale=1, emb_dim=64)
    trainer = ArcFaceTrainer(model=MobileFaceNet(cfg), num_classes=64,
                             mesh=mesh, emb_dim=64, learning_rate=0.1,
                             sample_rate=0.25)
    assert trainer.num_sample == 16
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.normal(size=(8, 112, 112, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 64, size=8).astype(np.int32))
    losses = []
    for _ in range(5):
        state, loss = trainer.train_step(state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


@pytest.mark.slow
def test_class_count_not_divisible_by_model_axis():
    """num_classes that doesn't divide the 'model' axis pads the class
    matrix to a mesh multiple; pad columns are masked and never win."""
    mesh = make_mesh((2, 4), ("data", "model"))
    cfg = ArcFaceConfig(name="tiny", arch="mobilefacenet",
                        mbf_blocks=(1, 1, 1, 1), mbf_scale=1, emb_dim=64)
    trainer = ArcFaceTrainer(model=MobileFaceNet(cfg), num_classes=3,
                             mesh=mesh, emb_dim=64, learning_rate=0.1)
    assert trainer.padded_classes == 4
    state = trainer.init_state(jax.random.PRNGKey(0))
    assert state.head_w.shape == (64, 4)
    rng = np.random.default_rng(8)
    images = jnp.asarray(rng.normal(size=(8, 112, 112, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=8).astype(np.int32))
    w_before = np.asarray(state.head_w)[:, 3].copy()
    losses = []
    for _ in range(3):
        state, loss = trainer.train_step(state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # the pad column only moves by weight decay (no gradient through it):
    # decay shrinks toward zero, so direction is preserved
    w_after = np.asarray(state.head_w)[:, 3]
    cos = (w_before @ w_after /
           (np.linalg.norm(w_before) * np.linalg.norm(w_after)))
    assert cos > 0.999


@pytest.mark.slow
def test_remat_is_numerics_preserving():
    """remat=True recomputes activations instead of storing them; the
    update it produces must be identical (same loss, same head weights)."""
    mesh = make_mesh((2, 4), ("data", "model"))
    cfg = ArcFaceConfig(name="tiny", arch="mobilefacenet",
                        mbf_blocks=(1, 1, 1, 1), mbf_scale=1, emb_dim=64)
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.normal(size=(8, 112, 112, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, size=8).astype(np.int32))
    losses, heads = [], []
    for remat in (False, True):
        trainer = ArcFaceTrainer(model=MobileFaceNet(cfg), num_classes=16,
                                 mesh=mesh, emb_dim=64, learning_rate=0.1,
                                 remat=remat)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, loss = trainer.train_step(state, images, labels)
        losses.append(float(loss))
        heads.append(np.asarray(state.head_w))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(heads[0], heads[1], atol=1e-6)


def test_lr_schedule_shapes():
    from scrfd_arcface_facerecognition_tpu.train import make_lr_schedule

    # no annealing requested -> plain float passthrough
    assert make_lr_schedule(0.02) == 0.02
    # warmup ramp then constant
    s = make_lr_schedule(0.1, warmup_steps=10)
    assert float(s(0)) == 0.0
    assert abs(float(s(5)) - 0.05) < 1e-6
    assert abs(float(s(10)) - 0.1) < 1e-6
    assert abs(float(s(1000)) - 0.1) < 1e-6
    # warmup + poly decay to 0
    s = make_lr_schedule(0.1, warmup_steps=10, decay_steps=90, decay="poly")
    assert abs(float(s(10)) - 0.1) < 1e-6
    assert float(s(55)) < 0.1
    assert float(s(100)) < 1e-6
    # cosine decay without warmup
    s = make_lr_schedule(0.1, decay_steps=100, decay="cosine")
    assert abs(float(s(0)) - 0.1) < 1e-6
    assert float(s(100)) < 1e-6
    import pytest

    with pytest.raises(ValueError):
        make_lr_schedule(0.1, decay_steps=10, decay="step")


@pytest.mark.slow
def test_trainer_warmup_scales_first_update():
    """With warmup, step-1 LR is learning_rate/warmup_steps, so the head
    moves proportionally less than the constant-LR trainer's step 1."""
    mesh = make_mesh((2, 4), ("data", "model"))
    cfg = ArcFaceConfig(name="tiny", arch="mobilefacenet",
                        mbf_blocks=(1, 1, 1, 1), mbf_scale=1, emb_dim=64)
    rng = np.random.default_rng(10)
    images = jnp.asarray(rng.normal(size=(8, 112, 112, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, size=8).astype(np.int32))
    deltas = {}
    for warmup in (0, 10):
        trainer = ArcFaceTrainer(model=MobileFaceNet(cfg), num_classes=16,
                                 mesh=mesh, emb_dim=64, learning_rate=0.1,
                                 warmup_steps=warmup)
        state = trainer.init_state(jax.random.PRNGKey(0))
        w0 = np.asarray(state.head_w)
        state, _ = trainer.train_step(state, images, labels)
        deltas[warmup] = np.linalg.norm(np.asarray(state.head_w) - w0)
    # optax evaluates the schedule at count=0 for the first update, and
    # sgd(lr) scales the whole chained update (decay included) by it — so
    # the warmed-up first step moves the head by exactly zero
    assert deltas[10] < 0.2 * deltas[0]


def test_partial_fc_rejects_bad_rate():
    import pytest

    mesh = make_mesh((2, 4), ("data", "model"))
    cfg = ArcFaceConfig(name="tiny", arch="mobilefacenet",
                        mbf_blocks=(1, 1, 1, 1), mbf_scale=1, emb_dim=64)
    with pytest.raises(ValueError):
        ArcFaceTrainer(model=MobileFaceNet(cfg), num_classes=64, mesh=mesh,
                       emb_dim=64, sample_rate=0.0)


@pytest.mark.slow
def test_trained_checkpoint_loads_into_inference(tmp_path):
    """Train->serve loop: both checkpoint layouts (raw variables from
    tools/train_scrfd.py, full ArcFace TrainState) load via
    load_inference_variables and apply in inference mode."""
    import orbax.checkpoint as ocp

    from scrfd_arcface_facerecognition_tpu.models import (
        load_inference_variables)
    from scrfd_arcface_facerecognition_tpu.models.scrfd import (
        SCRFDConfig, SCRFDNet)

    # raw variables layout (SCRFD CLI)
    det = SCRFDNet(SCRFDConfig("tiny_det", 8, (1, 1, 1, 1), (8, 8, 16, 16),
                               neck_filters=8, head_stacks=1,
                               head_filters=16))
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    raw = {"params": dv["params"],
           "batch_stats": dv.get("batch_stats", {})}
    p1 = str(tmp_path / "det_ck")
    with ocp.PyTreeCheckpointer() as ckpt:
        ckpt.save(p1, jax.tree.map(np.asarray, raw))
    loaded = load_inference_variables(p1)
    out = det.apply(loaded, jnp.zeros((1, 64, 64, 3)))
    assert set(out) == {"scores", "bboxes", "kps"} and len(out["scores"]) == 3

    # TrainState layout (ArcFaceTrainer.save_checkpoint)
    mesh = make_mesh((2, 4), ("data", "model"))
    trainer = _tiny_trainer(mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    p2 = str(tmp_path / "arc_ck")
    trainer.save_checkpoint(state, p2)
    loaded2 = load_inference_variables(p2)
    emb = trainer.model.apply(loaded2, jnp.zeros((1, 112, 112, 3)),
                              train=False)
    assert emb.shape == (1, 64)

    # a non-variables tree is rejected loudly
    p3 = str(tmp_path / "junk")
    with ocp.PyTreeCheckpointer() as ckpt:
        ckpt.save(p3, {"weights": np.zeros(3)})
    with pytest.raises(ValueError):
        load_inference_variables(p3)


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
