"""ArcFace margin-softmax training step, DP x TP sharded.

Loss follows the ArcFace paper (additive angular margin m on the target
class angle, scale s): logits_y = s*cos(theta_y + m) with the standard
stability fallback s*(cos(theta_y) - m*sin(m)) when theta_y + m > pi.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import l2_normalize


def arcface_margin_logits(embeddings: jnp.ndarray, w: jnp.ndarray,
                          labels: jnp.ndarray, s: float = 64.0,
                          m: float = 0.5) -> jnp.ndarray:
    """(B, D) embeddings x (D, C) class matrix -> (B, C) margin logits."""
    emb_n = l2_normalize(embeddings.astype(jnp.float32))
    w_n = l2_normalize(w.astype(jnp.float32), axis=0)
    cos = jnp.clip(
        jnp.dot(emb_n, w_n, preferred_element_type=jnp.float32), -1.0, 1.0)
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 0.0))
    cos_m, sin_m = float(np.cos(m)), float(np.sin(m))
    phi = cos * cos_m - sin * sin_m                     # cos(theta + m)
    # fallback branch for theta + m > pi
    phi = jnp.where(cos > float(np.cos(np.pi - m)), phi, cos - m * sin_m)
    onehot = jax.nn.one_hot(labels, w.shape[1], dtype=cos.dtype)
    return s * jnp.where(onehot > 0, phi, cos)


def softmax_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def partial_fc_sample(labels: jnp.ndarray, num_classes: int,
                      num_sample: int, rng: jax.Array
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Partial-FC negative-class sampling (static-shape, jit-safe).

    The technique behind the released w600k weights (Partial FC,
    arXiv:2010.05222): with C in the 10^5..10^6 range the softmax is
    computed over the batch's positive classes plus a random subset of
    negatives, shrinking the (B, C) logits and the class-matrix gradient
    work by the sample rate. TPU formulation: every class draws a uniform
    score, positives are forced to the front by an additive bias, and ONE
    top-k over the scores yields a fixed-size class subset — no dynamic
    shapes, no host round-trip.

    Returns (idx (num_sample,) int32 — sampled class ids, positives
    guaranteed included while num_sample >= unique positives;
    new_labels (B,) int32 — each label's position within idx;
    matched (B,) bool — whether the label's class made the sample. When a
    batch carries more unique positives than num_sample the overflow rows
    CANNOT be represented in the sampled softmax; they are flagged here so
    the loss masks them out instead of silently training them toward
    new_labels' argmax-of-all-False default (position 0 = some other
    sample's identity).
    """
    scores = jax.random.uniform(rng, (num_classes,))
    scores = scores.at[labels].add(2.0)           # positives outrank all
    _, idx = jax.lax.top_k(scores, num_sample)
    idx = idx.astype(jnp.int32)
    # remap labels onto sampled positions: (B, S) match matrix is tiny
    match = idx[None, :] == labels[:, None]
    new_labels = jnp.argmax(match, axis=1).astype(jnp.int32)
    return idx, new_labels, match.any(axis=1)


class TrainState(NamedTuple):
    backbone: Any          # {'params': ..., 'batch_stats': ...}
    head_w: jnp.ndarray    # (D, padded_classes), sharded P(None, 'model');
                           # columns >= num_classes are masked dummy pads
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class ArcFaceTrainer:
    """Sharded trainer for an ArcFace embedder.

    mesh axes: ('data', 'model'). Batch shards over 'data'; the class
    matrix over 'model'; backbone params replicate.
    """
    model: Any                      # flax embedder module (train=True capable)
    num_classes: int
    mesh: Mesh
    margin: float = 0.5
    scale: float = 64.0
    learning_rate: float = 0.02
    weight_decay: float = 5e-4
    emb_dim: int = 512
    # Partial FC (arXiv:2010.05222): fraction of classes in each step's
    # softmax. 1.0 = full softmax; w600k-scale training uses 0.1-0.3.
    sample_rate: float = 1.0
    seed: int = 0
    # Rematerialize backbone activations in the backward pass
    # (jax.checkpoint): trades ~1 extra forward of FLOPs for O(depth)
    # activation memory — how r50 trains at large batch on one chip's HBM.
    remat: bool = False
    # LR annealing (arcface_torch trains w600k with linear warmup + poly
    # decay): warmup_steps ramps 0 -> learning_rate; decay_steps anneals to
    # ~0 afterwards ("poly" power 2 or "cosine"). Defaults keep a constant LR.
    warmup_steps: int = 0
    decay_steps: Optional[int] = None
    lr_decay: str = "poly"

    def __post_init__(self):
        from .schedules import make_lr_schedule

        lr = make_lr_schedule(self.learning_rate, self.warmup_steps,
                              self.decay_steps, self.lr_decay)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(5.0),
            optax.add_decayed_weights(self.weight_decay),
            optax.sgd(lr, momentum=0.9),
        )
        if not 0.0 < self.sample_rate <= 1.0:
            raise ValueError(f"sample_rate must be in (0, 1], got "
                             f"{self.sample_rate}")
        # static sampled-class count (jit requires a fixed shape)
        self.num_sample = max(1, int(round(self.sample_rate
                                           * self.num_classes)))
        # The class matrix shards over 'model', so its column count must be
        # a mesh multiple: pad with dummy classes that are masked out of the
        # full softmax and never sampled by Partial FC (labels never point
        # at them, so they take no gradient; weight decay on the frozen pad
        # columns is harmless).
        tp = self.mesh.shape.get("model", 1)
        self.padded_classes = -(-self.num_classes // tp) * tp
        self._jit_step = None

    # ------------------------------------------------------------- setup

    def init_state(self, rng: jax.Array,
                   input_hw: Tuple[int, int] = (112, 112)) -> TrainState:
        r1, r2 = jax.random.split(rng)
        variables = self.model.init(r1, jnp.zeros((1, *input_hw, 3)), train=False)
        head_w = jax.random.normal(r2, (self.emb_dim, self.padded_classes),
                                   jnp.float32) * 0.01
        params = {"backbone": variables["params"], "head_w": head_w}
        opt_state = self.optimizer.init(params)
        state = TrainState(
            backbone={"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {})},
            head_w=head_w, opt_state=opt_state,
            step=jnp.zeros((), jnp.int32))
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        """Apply the DP x TP placement: W class-sharded, rest replicated."""
        rep = NamedSharding(self.mesh, P())
        wsh = NamedSharding(self.mesh, P(None, "model"))

        def put_w(x):
            return jax.device_put(x, wsh) if (
                hasattr(x, "shape") and x.shape == (self.emb_dim, self.padded_classes)
            ) else jax.device_put(x, rep)

        return TrainState(
            backbone=jax.tree.map(lambda x: jax.device_put(x, rep), state.backbone),
            head_w=jax.device_put(state.head_w, wsh),
            opt_state=jax.tree.map(put_w, state.opt_state),
            step=jax.device_put(state.step, rep),
        )

    # -------------------------------------------------------------- step

    def _loss_fn(self, params, batch_stats, images, labels, step):
        def fwd(backbone_params, imgs):
            variables = {"params": backbone_params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
                return self.model.apply(variables, imgs, train=True,
                                        mutable=["batch_stats"])
            return self.model.apply(variables, imgs, train=True), {}

        if self.remat:
            fwd = jax.checkpoint(fwd)
        emb, mutated = fwd(params["backbone"], images)
        new_stats = (mutated["batch_stats"] if batch_stats else batch_stats)
        emb = jax.lax.with_sharding_constraint(
            emb, NamedSharding(self.mesh, P("data", None)))
        if self.num_sample < self.num_classes:
            # Partial FC: softmax over positives + sampled negatives only.
            # idx is replicated; the column gather on the 'model'-sharded W
            # lowers to an all-gather of just the sampled columns, and the
            # logits shrink from (B, C) to (B, S).
            rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
            idx, new_labels, matched = partial_fc_sample(
                labels, self.num_classes, self.num_sample, rng)
            logits = arcface_margin_logits(
                emb, params["head_w"][:, idx], new_labels,
                self.scale, self.margin)
            logits = jax.lax.with_sharding_constraint(
                logits, NamedSharding(self.mesh, P("data", None)))
            # rows whose class overflowed the sample take no gradient
            # (possible only when unique positives > num_sample)
            xent = softmax_xent(logits, new_labels) * matched
            loss = xent.sum() / jnp.maximum(matched.sum(), 1)
        else:
            logits = arcface_margin_logits(emb, params["head_w"], labels,
                                           self.scale, self.margin)
            if self.padded_classes > self.num_classes:
                col = jnp.arange(self.padded_classes)
                logits = jnp.where(col[None, :] < self.num_classes,
                                   logits, -1e9)
            logits = jax.lax.with_sharding_constraint(
                logits, NamedSharding(self.mesh, P("data", "model")))
            loss = jnp.mean(softmax_xent(logits, labels))
        return loss, new_stats

    def _step(self, state: TrainState, images, labels):
        params = {"backbone": state.backbone["params"], "head_w": state.head_w}
        (loss, new_stats), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(
                params, state.backbone.get("batch_stats", {}), images, labels,
                state.step)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = TrainState(
            backbone={"params": params["backbone"], "batch_stats": new_stats},
            head_w=params["head_w"], opt_state=opt_state,
            step=state.step + 1)
        return new_state, loss

    # ------------------------------------------------------- checkpointing

    def save_checkpoint(self, state: TrainState, path: str) -> None:
        """Orbax checkpoint of the full train state (params + opt + stats)."""
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckpt:
            ckpt.save(os.path.abspath(path),
                      jax.tree.map(np.asarray, state._asdict()))

    def restore_checkpoint(self, path: str) -> TrainState:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckpt:
            data = ckpt.restore(os.path.abspath(path))
        state = TrainState(backbone=data["backbone"], head_w=data["head_w"],
                           opt_state=jax.tree.map(
                               lambda x: x, data["opt_state"]),
                           step=jnp.asarray(data["step"]))
        # opt_state trees restore as raw dicts; rebuild against a fresh init
        fresh = self.optimizer.init({"backbone": state.backbone["params"],
                                     "head_w": state.head_w})
        flat_saved = jax.tree.leaves(data["opt_state"])
        treedef = jax.tree.structure(fresh)
        state = state._replace(
            opt_state=jax.tree.unflatten(treedef, flat_saved))
        return self.shard_state(state)

    def train_step(self, state: TrainState, images: jnp.ndarray,
                   labels: jnp.ndarray) -> Tuple[TrainState, jnp.ndarray]:
        """One sharded update. images (B, H, W, 3) f32 normalized;
        labels (B,) int32. B must divide the 'data' axis size."""
        if self._jit_step is None:
            data_sh = NamedSharding(self.mesh, P("data"))
            self._jit_step = jax.jit(
                self._step,
                in_shardings=(None,
                              NamedSharding(self.mesh, P("data", None, None, None)),
                              data_sh))
        return self._jit_step(state, images, labels)


# --------------------------------------------------------------------------
# evaluation: pairwise verification metrics (LFW-style protocol)
# --------------------------------------------------------------------------

def verification_metrics(emb1, emb2, same, far_targets=(1e-2, 1e-3)):
    """Face-verification quality of an embedder on labeled pairs.

    emb1/emb2 (N, D) embeddings of pair halves; same (N,) bool. Returns
    {accuracy, threshold, tar_at_far: {far: tar}} — accuracy is the best
    cosine-threshold accuracy (the LFW protocol's sweep), TAR@FAR reads
    the ROC at the requested false-accept rates.
    """
    e1 = np.asarray(emb1, np.float32)
    e2 = np.asarray(emb2, np.float32)
    e1 /= np.maximum(np.linalg.norm(e1, axis=1, keepdims=True), 1e-12)
    e2 /= np.maximum(np.linalg.norm(e2, axis=1, keepdims=True), 1e-12)
    sims = np.sum(e1 * e2, axis=1)
    same = np.asarray(same, bool)

    n = len(sims)
    if n == 0:
        return {"accuracy": 0.0, "threshold": 0.0,
                "tar_at_far": {far: 0.0 for far in far_targets}, "n_pairs": 0}
    order = np.argsort(-sims)
    s_sorted = sims[order]
    y_sorted = same[order]
    n_pos = int(same.sum())
    n_neg = n - n_pos
    # cuts: accept top-k for k = 0..n (k=0 is the reject-all cut, optimal
    # when every pair is negative)
    tp = np.concatenate([[0], np.cumsum(y_sorted)])
    fp = np.concatenate([[0], np.cumsum(~y_sorted)])
    acc = (tp + (n_neg - fp)) / n
    best = int(np.argmax(acc))
    # threshold sits just above the first rejected similarity
    thr = float(s_sorted[best - 1]) if best > 0 else float(s_sorted[0] + 1e-6)
    tar_at_far = {}
    for far in far_targets:
        if n_neg == 0:
            tar_at_far[far] = float(tp[-1] / n_pos) if n_pos else 0.0
            continue
        k = int(np.searchsorted(fp / n_neg, far, side="right")) - 1
        tar_at_far[far] = float(tp[k] / n_pos) if (k >= 0 and n_pos) else 0.0
    return {"accuracy": float(acc[best]), "threshold": thr,
            "tar_at_far": tar_at_far, "n_pairs": n}


def evaluate_embedder(apply_fn, variables, pairs, batch: int = 64):
    """Run (img1, img2, same) pairs through an embedder apply fn and score
    with verification_metrics. pairs: iterable of (a, b, same) with images
    already normalized (B, 112, 112, 3)-compatible."""
    import jax.numpy as jnp

    e1s, e2s, labels = [], [], []
    buf_a, buf_b = [], []
    for a, b, s in pairs:
        buf_a.append(a)
        buf_b.append(b)
        labels.append(bool(s))
        if len(buf_a) == batch:
            e1s.append(np.asarray(apply_fn(variables, jnp.stack(buf_a))))
            e2s.append(np.asarray(apply_fn(variables, jnp.stack(buf_b))))
            buf_a, buf_b = [], []
    if buf_a:
        e1s.append(np.asarray(apply_fn(variables, jnp.stack(buf_a))))
        e2s.append(np.asarray(apply_fn(variables, jnp.stack(buf_b))))
    if not e1s:
        return verification_metrics(np.zeros((0, 1)), np.zeros((0, 1)),
                                    np.zeros((0,), bool))
    return verification_metrics(np.concatenate(e1s), np.concatenate(e2s),
                                np.asarray(labels))
