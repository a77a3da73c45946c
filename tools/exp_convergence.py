"""Overfit-to-memorization convergence proof for both trainers.

VERDICT r3 item 8: the suites prove one green step (loss decreases); this
experiment evidences end-to-end LEARNING DYNAMICS with metric curves:

- ArcFace: a 50-identity synthetic dataset (structured per-identity base
  patterns + jitter). Verification accuracy on HELD-OUT pairs must climb
  from chance toward 1.0 as the embedder memorizes the identities.
- SCRFD: a fixed 16-image synthetic "WIDER-like" set (face-shaped bright
  patterns with eye/mouth marks on textured backgrounds). AP@0.5 on the
  training images must climb from 0 as the detector overfits.

    python tools/exp_convergence.py [--arc-steps 300] [--det-steps 300]

Prints one JSON line per curve point; the resulting tables live in
docs/TRAINING.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


# ------------------------------------------------------------------ arcface


def identity_image(base, rng, shift=4, noise=2.5):
    """One 112x112 sample of an identity: its base pattern, randomly
    shifted a few pixels and heavily noised (normalized-space images).

    noise=2.5 (2.5x the base pattern's own std) is calibrated so a
    RANDOM-INIT embedder scores near chance on the verification pairs —
    at the original 0.25 the identity pattern dominated pixel space and
    even untrained random features separated the pairs (step-0 accuracy
    0.985), which evidenced nothing about learning."""
    dx, dy = rng.integers(-shift, shift + 1, size=2)
    img = np.roll(base, (int(dy), int(dx)), axis=(0, 1))
    return img + noise * rng.normal(size=img.shape).astype(np.float32)


def make_identity_bases(rng, n_ident):
    """Low-frequency per-identity patterns (14x14 random field x8)."""
    small = rng.normal(size=(n_ident, 14, 14, 3)).astype(np.float32)
    return np.repeat(np.repeat(small, 8, axis=1), 8, axis=2)


def run_arcface(steps, eval_every, batch, n_ident=50, seed=0):
    import jax
    import jax.numpy as jnp

    from scrfd_arcface_facerecognition_tpu.models import build_arcface
    from scrfd_arcface_facerecognition_tpu.parallel import make_mesh
    from scrfd_arcface_facerecognition_tpu.train import (
        ArcFaceTrainer, evaluate_embedder)

    rng = np.random.default_rng(seed)
    bases = make_identity_bases(rng, n_ident)
    mesh = make_mesh((len(jax.devices()), 1), ("data", "model"))
    model = build_arcface("w600k_mbf")
    trainer = ArcFaceTrainer(model=model, num_classes=n_ident, mesh=mesh,
                             learning_rate=0.05, warmup_steps=20,
                             decay_steps=steps)
    state = trainer.init_state(jax.random.PRNGKey(seed))

    # held-out verification pairs (fresh jitters the trainer never sees)
    eval_rng = np.random.default_rng(seed + 1)
    pairs = []
    for i in range(100):
        a, b = eval_rng.choice(n_ident, size=2, replace=False)
        pairs.append((identity_image(bases[a], eval_rng),
                      identity_image(bases[a], eval_rng), True))
        pairs.append((identity_image(bases[a], eval_rng),
                      identity_image(bases[b], eval_rng), False))

    def accuracy():
        m = evaluate_embedder(
            lambda v, x: model.apply(v, x), state.backbone, pairs)
        return m["accuracy"]

    curve = [(0, float(accuracy()))]
    print(json.dumps({"curve": "arcface_verification_accuracy", "step": 0,
                      "value": curve[0][1]}), flush=True)
    t0 = time.time()
    for step in range(1, steps + 1):
        ids = rng.integers(0, n_ident, size=batch)
        images = np.stack([identity_image(bases[i], rng) for i in ids])
        state, loss = trainer.train_step(state, jnp.asarray(images),
                                         jnp.asarray(ids.astype(np.int32)))
        if step % eval_every == 0 or step == steps:
            acc = float(accuracy())
            curve.append((step, acc))
            print(json.dumps({"curve": "arcface_verification_accuracy",
                              "step": step, "value": round(acc, 4),
                              "loss": round(float(loss), 3),
                              "elapsed_s": round(time.time() - t0, 1)}),
                  flush=True)
    return curve


# -------------------------------------------------------------------- scrfd


def paint_face(img, x1, y1, side):
    """A face-shaped pattern: bright oval + dark eyes + mouth."""
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy, r = x1 + side / 2, y1 + side / 2, side / 2
    oval = ((xx - cx) / r) ** 2 + ((yy - cy) / (1.1 * r)) ** 2 <= 1.0
    img[oval] = 215
    for ex in (x1 + 0.3 * side, x1 + 0.7 * side):
        eye = ((xx - ex) ** 2 + (yy - (y1 + 0.4 * side)) ** 2
               <= (0.08 * side) ** 2)
        img[eye] = 30
    mouth = ((np.abs(xx - cx) <= 0.22 * side)
             & (np.abs(yy - (y1 + 0.78 * side)) <= 0.05 * side))
    img[mouth] = 50


def make_detection_set(rng, n_images=16, size=320, max_faces=3):
    from scrfd_arcface_facerecognition_tpu.train.detection_data import (
        Annotation)

    images, anns = [], []
    rel = np.asarray([[0.3, 0.4], [0.7, 0.4], [0.5, 0.6],
                      [0.35, 0.8], [0.65, 0.8]], np.float32)
    for i in range(n_images):
        img = (rng.uniform(60, 120) * np.ones((size, size, 3))
               + rng.normal(scale=8, size=(size, size, 3))).clip(0, 255)
        n = int(rng.integers(1, max_faces + 1))
        boxes, kps = [], []
        for _ in range(n):
            side = float(rng.uniform(48, 120))
            x1 = float(rng.uniform(0, size - side))
            y1 = float(rng.uniform(0, size - side))
            paint_face(img, x1, y1, side)
            boxes.append([x1, y1, x1 + side, y1 + side])
            kps.append(np.stack([x1 + rel[:, 0] * side,
                                 y1 + rel[:, 1] * side], axis=1))
        images.append(img.astype(np.uint8))
        anns.append(Annotation(
            path=str(i), boxes=np.asarray(boxes, np.float32),
            kps=np.asarray(kps, np.float32),
            kps_valid=np.ones(len(boxes), bool)))
    return images, anns


def run_scrfd(steps, eval_every, batch, seed=0, size=320):
    import jax
    import jax.numpy as jnp

    from scrfd_arcface_facerecognition_tpu.models import build_scrfd
    from scrfd_arcface_facerecognition_tpu.parallel import make_mesh
    from scrfd_arcface_facerecognition_tpu.pipeline import Detector
    from scrfd_arcface_facerecognition_tpu.train import (
        SCRFDLossConfig, SCRFDTrainer, evaluate_detector)
    from scrfd_arcface_facerecognition_tpu.train.detection_data import (
        letterbox_example)

    rng = np.random.default_rng(seed)
    images, anns = make_detection_set(rng, size=size)
    mesh = make_mesh((len(jax.devices()),), ("data",))
    model = build_scrfd("det_500m")
    trainer = SCRFDTrainer(model=model, mesh=mesh,
                           loss_cfg=SCRFDLossConfig(input_size=(size, size)),
                           learning_rate=0.01, warmup_steps=20,
                           decay_steps=steps)
    state = trainer.init_state(jax.random.PRNGKey(seed))

    # pre-letterboxed training tensors (fixed set: the overfit target)
    max_gt = 4
    exs = [letterbox_example((img[..., ::-1] - 127.5) / 128.0, ann,
                             (size, size), max_gt)
           for img, ann in zip(images, anns)]

    def eval_ap():
        det = Detector(variant="det_500m", variables=state.variables,
                       input_size=(size, size))
        m = evaluate_detector(
            det, anns, image_loader=lambda p: images[int(p)])
        return m["ap"]

    curve = [(0, float(eval_ap()))]
    print(json.dumps({"curve": "scrfd_ap50", "step": 0,
                      "value": round(curve[0][1], 4)}), flush=True)
    t0 = time.time()
    for step in range(1, steps + 1):
        pick = rng.integers(0, len(exs), size=batch)
        imgs = np.stack([exs[i][0] for i in pick])
        gtb = np.stack([exs[i][1] for i in pick])
        gtk = np.stack([exs[i][2] for i in pick])
        gtv = np.stack([exs[i][3] for i in pick])
        gkv = np.stack([exs[i][4] for i in pick])
        state, loss, _ = trainer.train_step(
            state, jnp.asarray(imgs), jnp.asarray(gtb), jnp.asarray(gtk),
            jnp.asarray(gtv), jnp.asarray(gkv))
        if step % eval_every == 0 or step == steps:
            ap = float(eval_ap())
            curve.append((step, ap))
            print(json.dumps({"curve": "scrfd_ap50", "step": step,
                              "value": round(ap, 4),
                              "loss": round(float(loss), 3),
                              "elapsed_s": round(time.time() - t0, 1)}),
                  flush=True)
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arc-steps", type=int, default=300)
    ap.add_argument("--det-steps", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--only", choices=["arc", "det", "both"], default="both")
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"],
                    help="force a JAX backend (cpu = local; the env var "
                         "alone is too late on this machine — sitecustomize "
                         "registers the TPU tunnel at startup)")
    args = ap.parse_args()
    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)
    if args.only in ("arc", "both"):
        run_arcface(args.arc_steps, args.eval_every, args.batch)
    if args.only in ("det", "both"):
        run_scrfd(args.det_steps, args.eval_every,
                  max(8, args.batch // 4))
    return 0


if __name__ == "__main__":
    sys.exit(main())
