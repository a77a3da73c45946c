"""SCRFD detector training: ATSS-style assignment + QFL / DIoU / kps losses.

The reference ships inference-only ONNX graphs (it never trains anything);
this trainer makes the framework self-trainable, following the SCRFD
paper's recipe (arXiv:2105.04714, as configured in the public insightface
scrfd configs): Quality Focal Loss on classification (target = assigned
IoU), DIoU loss on decoded boxes, smooth-L1 on the 5 landmark offsets, and
an ATSS assigner (top-k center-distance candidates per level, IoU
threshold = mean + std of the candidate IoUs, centers constrained inside
the gt box).

Everything is static-shape and batched: ground truth arrives as
(B, M, ...) padded arrays with a validity mask, assignment is a dense
(B, M, N) computation (N = anchors at the training resolution), and the
whole step runs under one jit sharded over the 'data' mesh axis.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import ops
from ..ops.anchors import (SCRFD_STRIDES, SCRFD_NUM_ANCHORS,
                           _anchor_centers_np)


# --------------------------------------------------------------------------
# geometry helpers
# --------------------------------------------------------------------------

def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(..., M, 4) x (..., N, 4) -> (..., M, N) IoU (x1y1x2y2, no +1)."""
    x1 = jnp.maximum(boxes1[..., :, None, 0], boxes2[..., None, :, 0])
    y1 = jnp.maximum(boxes1[..., :, None, 1], boxes2[..., None, :, 1])
    x2 = jnp.minimum(boxes1[..., :, None, 2], boxes2[..., None, :, 2])
    y2 = jnp.minimum(boxes1[..., :, None, 3], boxes2[..., None, :, 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    a1 = ((boxes1[..., 2] - boxes1[..., 0])
          * (boxes1[..., 3] - boxes1[..., 1]))[..., :, None]
    a2 = ((boxes2[..., 2] - boxes2[..., 0])
          * (boxes2[..., 3] - boxes2[..., 1]))[..., None, :]
    return inter / jnp.maximum(a1 + a2 - inter, 1e-9)


def diou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distance-IoU loss per box pair (..., 4) -> (...)."""
    x1 = jnp.maximum(pred[..., 0], target[..., 0])
    y1 = jnp.maximum(pred[..., 1], target[..., 1])
    x2 = jnp.minimum(pred[..., 2], target[..., 2])
    y2 = jnp.minimum(pred[..., 3], target[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    at = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    iou = inter / jnp.maximum(ap + at - inter, 1e-9)
    # squared center distance over squared enclosing-box diagonal
    pcx = (pred[..., 0] + pred[..., 2]) * 0.5
    pcy = (pred[..., 1] + pred[..., 3]) * 0.5
    tcx = (target[..., 0] + target[..., 2]) * 0.5
    tcy = (target[..., 1] + target[..., 3]) * 0.5
    rho2 = (pcx - tcx) ** 2 + (pcy - tcy) ** 2
    ex1 = jnp.minimum(pred[..., 0], target[..., 0])
    ey1 = jnp.minimum(pred[..., 1], target[..., 1])
    ex2 = jnp.maximum(pred[..., 2], target[..., 2])
    ey2 = jnp.maximum(pred[..., 3], target[..., 3])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    return 1.0 - iou + rho2 / jnp.maximum(c2, 1e-9)


def quality_focal_loss(p: jnp.ndarray, q: jnp.ndarray,
                       beta: float = 2.0) -> jnp.ndarray:
    """QFL in probability space: |q - p|^beta * BCE(p, q).

    q is the quality target (assigned IoU at positives, 0 elsewhere). The
    SCRFD head emits post-sigmoid scores, so the loss clips p instead of
    working on logits; the gradient is well-behaved for p in (eps, 1-eps).
    """
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    bce = -(q * jnp.log(p) + (1.0 - q) * jnp.log(1.0 - p))
    return jnp.abs(q - p) ** beta * bce


def smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


# --------------------------------------------------------------------------
# ATSS-style assignment (static shapes, batched)
# --------------------------------------------------------------------------

def atss_assign(gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                centers: jnp.ndarray, anchor_boxes: jnp.ndarray,
                level_sizes: Sequence[int], topk: int = 9
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign anchors to ground-truth boxes, one image.

    gt_boxes (M, 4); gt_valid (M,); centers (N, 2); anchor_boxes (N, 4);
    level_sizes: anchors per FPN level (sums to N). Returns
    (assigned_gt (N,) int32 index or -1, assigned_iou (N,) f32).

    ATSS (arXiv:1912.02424): per gt and per level take the top-k anchors by
    center distance, pool their IoUs, threshold at mean + std, keep
    candidates above threshold whose center lies inside the gt box; each
    anchor goes to the gt of highest IoU among its claimants.
    """
    m = gt_boxes.shape[0]
    iou = pairwise_iou(gt_boxes, anchor_boxes)                  # (M, N)
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    dist = jnp.sqrt((centers[None, :, 0] - gcx[:, None]) ** 2
                    + (centers[None, :, 1] - gcy[:, None]) ** 2)  # (M, N)

    # top-k closest per level -> candidate mask (M, N)
    cand = jnp.zeros((m, 0), bool)
    start = 0
    for n_l in level_sizes:
        d_l = dist[:, start:start + n_l]
        k = min(topk, n_l)
        _, idx = jax.lax.top_k(-d_l, k)                          # (M, k)
        mask_l = jnp.zeros((m, n_l), bool)
        mask_l = mask_l.at[jnp.arange(m)[:, None], idx].set(True)
        cand = jnp.concatenate([cand, mask_l], axis=1)
        start += n_l
    n_cand = jnp.sum(cand, axis=1)                               # (M,)

    # adaptive IoU threshold = mean + std over each gt's candidates
    iou_c = jnp.where(cand, iou, 0.0)
    mean = jnp.sum(iou_c, axis=1) / jnp.maximum(n_cand, 1)
    var = (jnp.sum(jnp.where(cand, (iou - mean[:, None]) ** 2, 0.0), axis=1)
           / jnp.maximum(n_cand, 1))
    thr = mean + jnp.sqrt(var)                                   # (M,)

    # center-inside-gt constraint
    inside = ((centers[None, :, 0] >= gt_boxes[:, None, 0])
              & (centers[None, :, 0] <= gt_boxes[:, None, 2])
              & (centers[None, :, 1] >= gt_boxes[:, None, 1])
              & (centers[None, :, 1] <= gt_boxes[:, None, 3]))
    pos = (cand & inside & (iou >= thr[:, None])
           & gt_valid[:, None])                                  # (M, N)

    # conflicts: anchor claims the gt with the highest IoU among claimants
    claim_iou = jnp.where(pos, iou, -1.0)                        # (M, N)
    best_gt = jnp.argmax(claim_iou, axis=0)                      # (N,)
    best_iou = jnp.max(claim_iou, axis=0)                        # (N,)
    assigned = jnp.where(best_iou > 0.0, best_gt, -1).astype(jnp.int32)
    return assigned, jnp.maximum(best_iou, 0.0)


# --------------------------------------------------------------------------
# loss over head outputs
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SCRFDLossConfig:
    input_size: Tuple[int, int] = (640, 640)
    strides: Tuple[int, ...] = tuple(SCRFD_STRIDES)
    num_anchors: int = SCRFD_NUM_ANCHORS
    num_kps: int = 5
    topk: int = 9
    anchor_scales: Tuple[float, ...] = (4.0, 8.0)  # side = stride * scale
    cls_weight: float = 1.0
    box_weight: float = 2.0
    kps_weight: float = 0.1


def _anchor_boxes(cfg: SCRFDLossConfig) -> Tuple[np.ndarray, np.ndarray, list]:
    """(centers (N,2), boxes (N,4), per-level sizes) as numpy constants."""
    h, w = cfg.input_size
    centers = np.concatenate([
        _anchor_centers_np(h // s, w // s, s, cfg.num_anchors)
        for s in cfg.strides])
    sides = np.concatenate([
        np.tile(np.asarray(cfg.anchor_scales[:cfg.num_anchors],
                           np.float32) * s,
                (h // s) * (w // s))
        for s in cfg.strides
    ])
    boxes = np.stack([centers[:, 0] - sides / 2, centers[:, 1] - sides / 2,
                      centers[:, 0] + sides / 2, centers[:, 1] + sides / 2],
                     axis=1)
    level_sizes = [(h // s) * (w // s) * cfg.num_anchors for s in cfg.strides]
    return centers, boxes, level_sizes


def scrfd_loss(outputs, gt_boxes: jnp.ndarray, gt_kps: jnp.ndarray,
               gt_valid: jnp.ndarray, cfg: SCRFDLossConfig,
               gt_kps_valid: Optional[jnp.ndarray] = None):
    """Total detection loss for a batch.

    outputs: the SCRFDNet head dict (per-stride lists; scores post-sigmoid,
    bbox/kps predictions in stride units). gt_boxes (B, M, 4) pixels;
    gt_kps (B, M, 5, 2); gt_valid (B, M); gt_kps_valid (B, M) — faces with
    unlabeled landmarks (WIDER flag -1) contribute cls+box loss but are
    masked out of the kps term (None = all labeled). Returns
    (loss, metrics dict).
    """
    if gt_kps_valid is None:
        gt_kps_valid = gt_valid
    centers_np, aboxes_np, level_sizes = _anchor_boxes(cfg)
    centers = jnp.asarray(centers_np)
    aboxes = jnp.asarray(aboxes_np)

    # flatten head outputs to (B, N, ...) and decode boxes to pixels
    scores = jnp.concatenate(outputs["scores"], axis=1)[..., 0]   # (B, N)
    stride_rep = jnp.asarray(np.concatenate([
        np.full(n_l, s, np.float32)
        for n_l, s in zip(level_sizes, cfg.strides)]))            # (N,)
    dist_pred = jnp.concatenate(outputs["bboxes"], axis=1)        # (B, N, 4)
    kps_pred = jnp.concatenate(outputs["kps"], axis=1)            # (B, N, 10)
    boxes_pred = ops.distance2bbox(centers,
                                   dist_pred * stride_rep[None, :, None])

    assigned, aiou = jax.vmap(
        lambda b, v: atss_assign(b, v, centers, aboxes, level_sizes,
                                 cfg.topk))(gt_boxes, gt_valid)   # (B, N) x2
    pos = assigned >= 0
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)

    # --- classification: QFL with IoU-of-pred as the quality target -----
    gt_for_anchor = jnp.take_along_axis(
        gt_boxes, jnp.maximum(assigned, 0)[..., None], axis=1)    # (B, N, 4)
    # quality = IoU(pred, gt) at positives (detached from the box branch
    # only through the box loss; QFL trains cls toward localization quality)
    pred_iou = 1.0 - jnp.clip(diou_loss(boxes_pred, gt_for_anchor), 0.0, 1.0)
    q = jnp.where(pos, jax.lax.stop_gradient(pred_iou), 0.0)
    cls_loss = jnp.sum(quality_focal_loss(scores, q)) / n_pos

    # --- boxes: DIoU at positives ----------------------------------------
    box_l = diou_loss(boxes_pred, gt_for_anchor)
    box_loss = jnp.sum(jnp.where(pos, box_l, 0.0)) / n_pos

    # --- keypoints: smooth-L1 on stride-normalized offsets ---------------
    gt_kps_a = jnp.take_along_axis(
        gt_kps.reshape(gt_kps.shape[0], gt_kps.shape[1], -1),
        jnp.maximum(assigned, 0)[..., None], axis=1)              # (B, N, 10)
    tgt_off = ((gt_kps_a.reshape(*gt_kps_a.shape[:2], cfg.num_kps, 2)
                - centers[None, :, None, :])
               / stride_rep[None, :, None, None])
    kps_off = kps_pred.reshape(*kps_pred.shape[:2], cfg.num_kps, 2)
    kps_l = jnp.sum(smooth_l1(kps_off - tgt_off), axis=(-1, -2))
    # mask anchors whose assigned face has no landmark labels
    anchor_kps_ok = jnp.take_along_axis(
        gt_kps_valid, jnp.maximum(assigned, 0), axis=1)
    kps_pos = pos & anchor_kps_ok
    n_kps = jnp.maximum(jnp.sum(kps_pos), 1.0)
    kps_loss = jnp.sum(jnp.where(kps_pos, kps_l, 0.0)) / n_kps

    loss = (cfg.cls_weight * cls_loss + cfg.box_weight * box_loss
            + cfg.kps_weight * kps_loss)
    return loss, {"cls": cls_loss, "box": box_loss, "kps": kps_loss,
                  "n_pos": jnp.sum(pos)}


# --------------------------------------------------------------------------
# sharded trainer
# --------------------------------------------------------------------------

class SCRFDTrainState(NamedTuple):
    variables: Any            # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class SCRFDTrainer:
    """DP-sharded trainer for the SCRFD detector.

    Batch shards over the mesh's 'data' axis; parameters replicate (conv
    nets have no natural TP axis here — the ArcFace class head is the
    model-parallel component of the training stack, train/arcface_train.py).
    """
    model: Any                       # SCRFDNet
    mesh: Mesh
    loss_cfg: SCRFDLossConfig = dataclasses.field(
        default_factory=SCRFDLossConfig)
    learning_rate: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # LR annealing (the SCRFD/mmdetection recipe warms up then decays):
    # warmup_steps ramps 0 -> learning_rate; decay_steps anneals to ~0
    # afterwards ("poly" or "cosine"). Defaults keep a constant LR.
    warmup_steps: int = 0
    decay_steps: Optional[int] = None
    lr_decay: str = "cosine"

    def __post_init__(self):
        from .schedules import make_lr_schedule

        lr = make_lr_schedule(self.learning_rate, self.warmup_steps,
                              self.decay_steps, self.lr_decay)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(5.0),
            optax.add_decayed_weights(self.weight_decay),
            optax.sgd(lr, momentum=self.momentum),
        )
        self._jit_step = None

    def init_state(self, rng: jax.Array) -> SCRFDTrainState:
        h, w = self.loss_cfg.input_size
        variables = self.model.init(rng, jnp.zeros((1, h, w, 3)), train=False)
        opt_state = self.optimizer.init(variables["params"])
        rep = NamedSharding(self.mesh, P())
        state = SCRFDTrainState(
            variables={"params": variables["params"],
                       "batch_stats": variables.get("batch_stats", {})},
            opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        return jax.tree.map(lambda x: jax.device_put(x, rep), state,
                            is_leaf=lambda x: hasattr(x, "shape"))

    def _loss_fn(self, params, batch_stats, images, gt_boxes, gt_kps,
                 gt_valid, gt_kps_valid):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            outputs, mutated = self.model.apply(
                variables, images, train=True, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            outputs = self.model.apply(variables, images, train=True)
            new_stats = batch_stats
        loss, metrics = scrfd_loss(outputs, gt_boxes, gt_kps, gt_valid,
                                   self.loss_cfg, gt_kps_valid=gt_kps_valid)
        return loss, (new_stats, metrics)

    def _step(self, state: SCRFDTrainState, images, gt_boxes, gt_kps,
              gt_valid, gt_kps_valid):
        images = jax.lax.with_sharding_constraint(
            images, NamedSharding(self.mesh, P("data")))
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(
                state.variables["params"],
                state.variables.get("batch_stats", {}),
                images, gt_boxes, gt_kps, gt_valid, gt_kps_valid)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        new_state = SCRFDTrainState(
            variables={"params": params, "batch_stats": new_stats},
            opt_state=opt_state, step=state.step + 1)
        return new_state, loss, metrics

    def train_step(self, state: SCRFDTrainState, images, gt_boxes, gt_kps,
                   gt_valid, gt_kps_valid=None):
        """One sharded update. images (B, H, W, 3) f32 normalized;
        gt_boxes (B, M, 4); gt_kps (B, M, 5, 2); gt_valid (B, M) bool;
        gt_kps_valid (B, M) bool (None = every valid face has landmarks).
        B must divide the 'data' axis size."""
        if self._jit_step is None:
            data = NamedSharding(self.mesh, P("data"))
            self._jit_step = jax.jit(
                self._step,
                in_shardings=(None,
                              NamedSharding(self.mesh, P("data", None, None, None)),
                              data, data, data, data))
        gt_valid = jnp.asarray(gt_valid)
        kv = (gt_valid if gt_kps_valid is None
              else jnp.asarray(gt_kps_valid))
        return self._jit_step(state, jnp.asarray(images),
                              jnp.asarray(gt_boxes), jnp.asarray(gt_kps),
                              gt_valid, kv)


def synthetic_detection_batch(rng: np.random.Generator, batch: int,
                              input_size: Tuple[int, int] = (640, 640),
                              max_gt: int = 8):
    """Random-but-plausible training batch for tests/dryruns: each image
    gets 1..max_gt boxes with 5 landmarks laid out like faces."""
    h, w = input_size
    images = rng.normal(size=(batch, h, w, 3)).astype(np.float32)
    gt_boxes = np.zeros((batch, max_gt, 4), np.float32)
    gt_kps = np.zeros((batch, max_gt, 5, 2), np.float32)
    gt_valid = np.zeros((batch, max_gt), bool)
    for b in range(batch):
        n = int(rng.integers(1, max_gt + 1))
        for m in range(n):
            side = float(rng.uniform(min(h, w) * 0.1, min(h, w) * 0.5))
            x1 = float(rng.uniform(0, w - side))
            y1 = float(rng.uniform(0, h - side))
            gt_boxes[b, m] = [x1, y1, x1 + side, y1 + side]
            # canonical-ish landmark layout inside the box
            rel = np.asarray([[0.3, 0.4], [0.7, 0.4], [0.5, 0.6],
                              [0.35, 0.8], [0.65, 0.8]], np.float32)
            gt_kps[b, m] = np.stack([x1 + rel[:, 0] * side,
                                     y1 + rel[:, 1] * side], axis=1)
            gt_valid[b, m] = True
    return images, gt_boxes, gt_kps, gt_valid
