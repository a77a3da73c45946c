"""Per-stage device timings for the e2e pipeline (run on the real chip).

Times each jitted stage with many dispatches in flight and one sync, so the
~30 ms remote-PJRT RTT amortizes away. Usage:
    python tools/profile_stages.py [--batch 32] [--iters 20]
"""
import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np


def timeit(name, fn, args, iters, sync):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<42s} {dt * 1e3:8.2f} ms")
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bucket", type=int, default=0, help="0 = auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu import ops
    from scrfd_arcface_facerecognition_tpu.ops import pallas_warp as pw
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline
    from scrfd_arcface_facerecognition_tpu.pipeline.detector import (
        decode_outputs, detect_batch)
    from scrfd_arcface_facerecognition_tpu.pipeline.face_pipeline import (
        embed_and_match_bucketed)

    B = args.batch
    pipe = FacePipeline(det_variant="det_10g", rec_variant="w600k_r50",
                        conf_thres=0.5, max_det=16, pre_nms=256,
                        gallery_capacity=128, dtype=jnp.bfloat16, seed=0,
                        use_pallas_warp="force")
    rng = np.random.default_rng(0)
    pipe.set_gallery(rng.normal(size=(128, 512)).astype(np.float32),
                     [f"p{i}" for i in range(128)])
    frames = jnp.asarray(
        rng.integers(0, 255, size=(B, 1080, 1920, 3), dtype=np.uint8))

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])

    # production plan: FacePipeline trims the contentless pad band
    # (tight_canvas=True), so profile the same (384, 640) canvas — the
    # square plan overstates detect by ~40% conv work and OOMs the
    # sub-stage section at B>=96 (full f32 square canvases + frames).
    plan = ops.tight_letterbox_plan((1080, 1920), (640, 640))
    det_apply = pipe.detector.model.apply
    det_vars = pipe.detector.variables
    emb_apply = pipe.embedder.model.apply
    emb_vars = pipe.embedder.variables

    # ---- full stages -----------------------------------------------------
    detect_fn = jax.jit(lambda v, f: detect_batch(
        det_apply, v, f, plan=plan, conf_thres=0.5, iou_thres=0.4,
        pre_nms=256, max_det=16, max_num=10, metric="max",
        compute_dtype=jnp.bfloat16))
    det, t_det = timeit("detect (full stage 1)", detect_fn,
                        (det_vars, frames), args.iters, sync)
    nfaces = int(np.asarray(det.valid).sum())
    cap = det.valid.shape[0] * det.valid.shape[1]
    bucket = args.bucket or FacePipeline._round_bucket(nfaces, cap)
    print(f"  faces={nfaces} bucket={bucket}")

    em_fn = jax.jit(lambda v, f, d, g, gv: embed_and_match_bucketed(
        emb_apply, v, f, d, g, gv, similarity_thresh=0.4, bucket=bucket,
        use_pallas=True))
    _, t_em = timeit("embed+match (full stage 2)", em_fn,
                     (emb_vars, frames, det, pipe._gallery,
                      pipe._gallery_valid), args.iters, sync)
    print(f"  => e2e {1e3 * (t_det + t_em):.1f} ms/batch, "
          f"{B / (t_det + t_em):.1f} fps")

    # ---- detect sub-stages ----------------------------------------------
    lb_fn = jax.jit(lambda f: ops.letterbox(f, plan, dtype=jnp.bfloat16))
    canvas, _ = timeit("  letterbox", lb_fn, (frames,), args.iters, sync)
    norm_fn = jax.jit(lambda c: ops.normalize_image(
        c, ops.SCRFD_MEAN, ops.SCRFD_STD))
    net_in, _ = timeit("  normalize", norm_fn, (canvas,), args.iters, sync)
    fwd_fn = jax.jit(lambda v, x: det_apply(v, x))
    outputs, _ = timeit("  scrfd forward", fwd_fn, (det_vars, net_in),
                        args.iters, sync)
    dec_fn = jax.jit(lambda o: decode_outputs(o, plan.model_hw))
    decoded, _ = timeit("  decode", dec_fn, (outputs,), args.iters, sync)

    def topk_nms(scores, boxes, kps):
        top_scores, top_idx = jax.lax.top_k(scores, 256)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        top_kps = jnp.take_along_axis(kps, top_idx[..., None, None], axis=1)
        valid = top_scores >= 0.5

        def per_frame(boxes_f, scores_f, kps_f, valid_f):
            keep = ops.nms_mask_blocked(boxes_f, 0.4, valid_f)
            detf = jnp.concatenate([boxes_f, scores_f[:, None]], axis=1)
            return ops.nms.compact_by_mask(keep, detf, kps_f, max_out=16)

        return jax.vmap(per_frame)(top_boxes, top_scores, top_kps, valid)

    timeit("  topk+nms+compact", jax.jit(topk_nms), decoded, args.iters, sync)

    u8_fn = jax.jit(lambda c: jnp.clip(jnp.round(c), 0, 255).astype(jnp.uint8))
    canvas_u8, _ = timeit("  canvas->u8", u8_fn, (canvas,), args.iters, sync)

    # ---- embed sub-stages -------------------------------------------------
    b, k = det.valid.shape
    flat_valid = det.valid.reshape(-1)
    order = jnp.argsort(jnp.logical_not(flat_valid), stable=True)
    sel = order[:bucket]
    kps_sel = det.kps.reshape(b * k, 5, 2)[sel]
    frame_idx = (sel // k).astype(jnp.int32)

    def warp_stage(fr, cv, kpsf, fidx):
        matrices = ops.estimate_norm(kpsf, 112)
        params = pw.prepare_warp_params(matrices, fidx,
                                        tuple(fr.shape[1:3]), plan.det_scale)
        return pw.warp_crops_pallas(pw.planarize(fr), pw.planarize(cv), params)

    crops, _ = timeit("  pallas warp", jax.jit(warp_stage),
                      (frames, det.canvas, kps_sel, frame_idx),
                      args.iters, sync)
    r50_in_fn = jax.jit(lambda c: ops.normalize_image(
        c, ops.ARCFACE_MEAN, ops.ARCFACE_STD))
    net_in2, _ = timeit("  arcface normalize", r50_in_fn, (crops,),
                        args.iters, sync)
    r50_fn = jax.jit(lambda v, x: emb_apply(v, x))
    emb, _ = timeit("  r50 forward", r50_fn, (emb_vars, net_in2),
                    args.iters, sync)
    match_fn = jax.jit(lambda e, g: jnp.dot(
        ops.l2_normalize(e), g.T, precision=jax.lax.Precision.HIGHEST))
    timeit("  l2+match", match_fn, (emb, pipe._gallery), args.iters, sync)


if __name__ == "__main__":
    main()
