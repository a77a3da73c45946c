"""SCRFD detector training driver.

Ties the training stack together (train/scrfd_train.py losses + assignment,
train/detection_data.py annotations + batching + AP eval) into a CLI:

    python tools/train_scrfd.py --labels /data/wider/train/label.txt \
        --val-labels /data/wider/val/label.txt \
        --variant det_500m --batch 32 --epochs 3 --out ckpt/

Shards the batch over all visible devices ('data' mesh axis). For a quick
machinery check without a dataset, `--synthetic N` trains on N synthetic
batches (random images, plausible face boxes) and reports the loss curve.
"""
import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--labels", type=str, default=None,
                    help="retinaface-format label.txt (WIDER FACE)")
    ap.add_argument("--val-labels", type=str, default=None)
    ap.add_argument("--images-root", type=str, default=None)
    ap.add_argument("--variant", type=str, default="det_500m")
    ap.add_argument("--input-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--warmup-steps", type=int, default=0)
    ap.add_argument("--decay-steps", type=int, default=None,
                    help="anneal LR to ~0 over this many post-warmup steps")
    ap.add_argument("--lr-decay", type=str, default="cosine",
                    choices=["poly", "cosine"])
    ap.add_argument("--max-gt", type=int, default=32)
    ap.add_argument("--out", type=str, default="scrfd_ckpt")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic batches instead of a dataset")
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args()

    import jax
    from scrfd_arcface_facerecognition_tpu.models import build_scrfd
    from scrfd_arcface_facerecognition_tpu.parallel import make_mesh
    from scrfd_arcface_facerecognition_tpu.train import (
        SCRFDTrainer, SCRFDLossConfig, parse_wider_annotations,
        batches_from_annotations, synthetic_detection_batch)

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,), ("data",))
    size = (args.input_size, args.input_size)
    model = build_scrfd(args.variant)
    trainer = SCRFDTrainer(model=model, mesh=mesh,
                           loss_cfg=SCRFDLossConfig(input_size=size),
                           learning_rate=args.lr,
                           warmup_steps=args.warmup_steps,
                           decay_steps=args.decay_steps,
                           lr_decay=args.lr_decay)
    state = trainer.init_state(jax.random.PRNGKey(0))
    print(f"devices={n_dev} variant={args.variant} input={size}")

    def log(step, loss, metrics, t0):
        print(f"step {step:6d}  loss {float(loss):8.4f}  "
              f"cls {float(metrics['cls']):.4f} box {float(metrics['box']):.4f} "
              f"kps {float(metrics['kps']):.4f}  n_pos {int(metrics['n_pos'])}  "
              f"{time.time() - t0:.1f}s", flush=True)

    step = 0
    t0 = time.time()
    if args.synthetic:
        rng = np.random.default_rng(0)
        for i in range(args.synthetic):
            batch = synthetic_detection_batch(rng, args.batch, size,
                                              max_gt=args.max_gt)
            state, loss, metrics = trainer.train_step(state, *batch)
            step += 1
            if step % args.log_every == 0 or step == 1:
                log(step, loss, metrics, t0)
    else:
        if not args.labels:
            ap.error("--labels or --synthetic required")
        anns = parse_wider_annotations(args.labels, args.images_root)
        print(f"{len(anns)} annotated images")
        for epoch in range(args.epochs):
            for batch in batches_from_annotations(
                    anns, args.batch, size, args.max_gt, seed=epoch):
                state, loss, metrics = trainer.train_step(state, *batch)
                step += 1
                if step % args.log_every == 0 or step == 1:
                    log(step, loss, metrics, t0)

    os.makedirs(args.out, exist_ok=True)
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckpt:
        ckpt.save(os.path.abspath(os.path.join(args.out, f"step_{step}")),
                  jax.tree.map(np.asarray, state.variables))
    print(f"saved {args.out}/step_{step}")

    if args.val_labels:
        from scrfd_arcface_facerecognition_tpu.pipeline import Detector
        from scrfd_arcface_facerecognition_tpu.train import evaluate_detector

        det = Detector(args.variant, variables=state.variables,
                       input_size=size)
        val = parse_wider_annotations(args.val_labels, args.images_root)
        out = evaluate_detector(det, val)
        print(f"val AP@0.5 = {out['ap']:.4f} over {out['images']} images")


if __name__ == "__main__":
    main()
