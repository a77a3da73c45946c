"""Export a (trained) model to ONNX — the deploy end of train -> serve.

    python tools/export_onnx.py --variant w600k_mbf \
        --checkpoint ckpt/final --out weights/w600k_mbf.onnx

Writes a `.onnx` file with the released files' I/O contract
(/root/reference/models/scrfd.py:38-47 nine-output detector layout;
models/arcface.py:13-14 single 512-d embedder output), runnable by the
reference's onnxruntime stack, by this framework's own graph executor
(models/onnx_exec.py), or by any ONNX runtime. Without --checkpoint the
model exports at random initialization (graph-structure smoke check).

--verify re-loads the written file through the graph executor and checks
it against the Flax forward on a random input before exiting.
"""
import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np

DETECTORS = ("det_500m", "det_2.5g", "det_10g")
EMBEDDERS = ("w600k_r50", "w600k_mbf")


def main():
    ap = argparse.ArgumentParser(
        description="Export a Flax model to the reference's ONNX format")
    ap.add_argument("--variant", required=True,
                    choices=DETECTORS + EMBEDDERS)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="orbax checkpoint dir (tools/train_*.py output); "
                         "omit to export at random init")
    ap.add_argument("--out", type=str, default=None,
                    help="output path (default <variant>.onnx)")
    ap.add_argument("--verify", action="store_true",
                    help="re-run the written file through the graph "
                         "executor and compare against the Flax forward")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    # this machine's sitecustomize imports jax at interpreter startup, so a
    # JAX_PLATFORMS env var alone is too late — apply it explicitly (same
    # pitfall documented in tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from scrfd_arcface_facerecognition_tpu.models.arcface import build_arcface
    from scrfd_arcface_facerecognition_tpu.models.scrfd import build_scrfd
    from scrfd_arcface_facerecognition_tpu.models.checkpoints import (
        load_inference_variables)
    from scrfd_arcface_facerecognition_tpu.models.init_utils import cpu_init
    from scrfd_arcface_facerecognition_tpu.models.onnx_export import (
        export_model)

    is_det = args.variant in DETECTORS
    sample = (1, 224, 224, 3) if is_det else (1, 112, 112, 3)

    variables = (load_inference_variables(args.checkpoint)
                 if args.checkpoint else None)
    if is_det:
        # s2d-layout stems (the serving Detector's default) export as the
        # equivalent plain stride-2 conv — export_scrfd converts the
        # kernel; build the in-process model to match the stored layout so
        # --verify's Flax forward runs too
        s2d = False
        if variables is not None:
            k = variables["params"]["backbone"]["stem1"]["conv"]["kernel"]
            s2d = tuple(k.shape[:3]) == (2, 2, 12)
        model = build_scrfd(args.variant, s2d_stem=s2d)
    else:
        model = build_arcface(args.variant)
    if variables is None:
        variables = cpu_init(model, args.seed, sample)
        print(f"note: no --checkpoint; exporting {args.variant} at random "
              "initialization")

    out_path = args.out or f"{args.variant}.onnx"
    data = export_model(model, variables, out_path)
    print(f"wrote {out_path} ({len(data) / 1e6:.2f} MB)")

    if args.verify:
        from scrfd_arcface_facerecognition_tpu.models.onnx_exec import (
            OnnxModel)
        from scrfd_arcface_facerecognition_tpu.models.onnx_proto import (
            load_onnx)

        rng = np.random.default_rng(args.seed)
        x = rng.normal(size=sample).astype(np.float32)
        om = OnnxModel(load_onnx(out_path))
        # pin exact-f32 MXU passes: TPU's default conv/matmul precision is
        # bf16-grade and would cost ~1e-2 on deep CNNs (the executor
        # already pins Precision.HIGHEST for f32 graphs)
        with jax.default_matmul_precision("float32"):
            got = [np.asarray(o)
                   for o in om.apply(om.variables, jnp.asarray(x))]
            ref = model.apply(variables, jnp.asarray(x))
        if is_det:
            # relative budget: random-init activations are unbounded, so a
            # fixed absolute threshold would flag conditioning, not export
            # bugs (same rationale as tests/test_onnx_export.py r50 case)
            ref = [np.asarray(o)
                   for o in ref["scores"] + ref["bboxes"] + ref["kps"]]
            worst = max(
                float(np.abs(g - r).max()) / max(1.0, float(np.abs(r).max()))
                for g, r in zip(got, ref))
            print(f"verify: {len(got)} outputs, worst relative "
                  f"|flax - onnx| = {worst:.2e}")
            if worst > 1e-3:
                raise SystemExit(
                    "verification FAILED (relative diff above 1e-3)")
        else:
            g = got[0].reshape(-1)
            r = np.asarray(ref).reshape(-1)
            cos = float(np.dot(g, r)
                        / max(np.linalg.norm(g) * np.linalg.norm(r), 1e-30))
            print(f"verify: embedding cosine(flax, onnx) = {cos:.7f}")
            if cos < 1 - 1e-4:   # the framework's 1e-3 budget, with margin
                raise SystemExit("verification FAILED (cosine below "
                                 "1 - 1e-4)")


if __name__ == "__main__":
    main()
