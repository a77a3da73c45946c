"""ArcFace embedder training driver.

Ties the recognition training stack together (train/arcface_train.py
margin-softmax + Partial FC, verification eval) into a CLI:

    python tools/train_arcface.py --data /data/faces --variant w600k_mbf \
        --batch 64 --epochs 2 --sample-rate 0.2 --out ckpt/

--data expects the standard identity-folder layout (<root>/<id>/*.jpg) —
images are letterboxed/resized to 112x112 and normalized (x-127.5)/127.5,
matching the inference contract (/root/reference/models/arcface.py:13-14).
The batch shards over the 'data' mesh axis; the classifier matrix
W [512, num_classes] shards over 'model' (for 600k identities W must not
replicate). --sample-rate < 1 enables Partial FC (arXiv:2010.05222), the
technique behind the released w600k weights.

For a machinery check without a dataset, `--synthetic N` trains N steps
on random images over --num-classes fake identities.
"""
import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def iter_dataset_batches(root: str, batch: int, seed: int):
    """(images (B,112,112,3) f32 normalized, labels (B,) int32) batches from
    an identity-folder dataset; partial tail batches are dropped (static
    shapes keep one compiled step)."""
    import cv2

    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    if not classes:
        raise SystemExit(f"no identity folders under {root}")
    samples = []
    for li, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                samples.append((os.path.join(cdir, f), li))
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(samples))
    imgs, labels = [], []
    for i in order:
        path, li = samples[i]
        img = cv2.imread(path)
        if img is None:
            continue
        if img.shape[:2] != (112, 112):
            img = cv2.resize(img, (112, 112), interpolation=cv2.INTER_LINEAR)
        imgs.append((img.astype(np.float32) - 127.5) / 127.5)
        labels.append(li)
        if len(imgs) == batch:
            yield np.stack(imgs), np.asarray(labels, np.int32)
            imgs, labels = [], []


def count_classes(root: str) -> int:
    return len([d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, default=None,
                    help="identity-folder dataset root (<root>/<id>/*.jpg)")
    ap.add_argument("--variant", type=str, default="w600k_mbf",
                    choices=["w600k_mbf", "w600k_r50"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--margin", type=float, default=0.5)
    ap.add_argument("--scale", type=float, default=64.0)
    ap.add_argument("--sample-rate", type=float, default=1.0,
                    help="Partial FC class-sampling rate (1.0 = full softmax)")
    ap.add_argument("--warmup-steps", type=int, default=0)
    ap.add_argument("--decay-steps", type=int, default=None,
                    help="anneal LR to ~0 over this many post-warmup steps")
    ap.add_argument("--lr-decay", type=str, default="poly",
                    choices=["poly", "cosine"])
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize backbone activations (less HBM)")
    ap.add_argument("--model-shards", type=int, default=1,
                    help="'model' mesh-axis size for the class matrix; "
                         "devices/model-shards becomes the 'data' axis")
    ap.add_argument("--out", type=str, default="arcface_ckpt")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic batches instead of a dataset")
    ap.add_argument("--num-classes", type=int, default=64,
                    help="class count for --synthetic")
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.models import build_arcface
    from scrfd_arcface_facerecognition_tpu.parallel import make_mesh
    from scrfd_arcface_facerecognition_tpu.train import ArcFaceTrainer

    n_dev = len(jax.devices())
    tp = max(1, args.model_shards)
    if n_dev % tp:
        ap.error(f"--model-shards {tp} does not divide device count {n_dev}")
    dp = n_dev // tp
    mesh = make_mesh((dp, tp), ("data", "model"))

    if args.synthetic:
        num_classes = args.num_classes
    else:
        if not args.data:
            ap.error("--data or --synthetic required")
        num_classes = count_classes(args.data)
    model = build_arcface(args.variant)
    trainer = ArcFaceTrainer(model=model, num_classes=num_classes, mesh=mesh,
                             margin=args.margin, scale=args.scale,
                             learning_rate=args.lr,
                             sample_rate=args.sample_rate,
                             warmup_steps=args.warmup_steps,
                             decay_steps=args.decay_steps,
                             lr_decay=args.lr_decay, remat=args.remat)
    state = trainer.init_state(jax.random.PRNGKey(0))
    print(f"devices={n_dev} mesh=data:{dp}xmodel:{tp} variant={args.variant} "
          f"classes={num_classes} sample={trainer.num_sample}"
          f"{'' if args.sample_rate >= 1 else ' (partial FC)'}", flush=True)

    step, t0 = 0, time.time()

    def run(images, labels):
        nonlocal state, step
        state, loss = trainer.train_step(state, jnp.asarray(images),
                                         jnp.asarray(labels))
        step += 1
        if step % args.log_every == 0 or step == 1:
            print(f"step {step:6d}  loss {float(loss):8.4f}  "
                  f"{time.time() - t0:.1f}s", flush=True)

    if args.synthetic:
        rng = np.random.default_rng(0)
        for _ in range(args.synthetic):
            images = rng.normal(size=(args.batch, 112, 112, 3)
                                ).astype(np.float32)
            labels = rng.integers(0, num_classes,
                                  size=args.batch).astype(np.int32)
            run(images, labels)
    else:
        for epoch in range(args.epochs):
            for images, labels in iter_dataset_batches(
                    args.data, args.batch, seed=epoch):
                run(images, labels)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"step_{step}")
    trainer.save_checkpoint(state, path)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
