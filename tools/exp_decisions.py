"""End-to-end DECISION-QUALITY proof: does the system re-identify people?

Every prior e2e artifact ran random or stand-in weights — machinery, not
accuracy (tests/test_replay_real_visits.py). This experiment closes that
hole inside the zero-egress environment:

1.  Identities = the 360 real CCTV person crops the reference committed in
    /root/reference/image_cache (the de-facto golden data, SURVEY.md §4).
2.  Train a det_500m detector IN-ENV on composites: augmented crops pasted
    at known positions onto textured backgrounds, so detection ground
    truth (box + 5 canonical landmarks) is exact by construction.
3.  Train a w600k_mbf ArcFace embedder IN-ENV on 112x112 crops aligned by
    the TRAINED detector (identity = source crop), with held-out-identity
    model selection — the embedder must generalize to people it never saw.
4.  Run the FULL clustering decide-path (SmartFaceEngine: gates ->
    batched search -> thresholds -> SQLite/gallery persistence,
    mirroring /root/reference/smart_face_recognition.py:1854-1922) over
    UNSEEN test identities and measure grouping precision/recall against
    ground truth, verification accuracy
    (compare_face_images, reference :878-1144), the 0.95 duplicate gates
    (:2618-2652), and the 0.8 merge threshold (:2726-2797).

Scope note (honest limits): the "identity" here is a whole person crop
(face + clothing) and the scenes are composites, because the environment
ships neither labeled faces nor the released weights. What this proves is
that the MODELS TRAIN to real discriminative power in this framework and
that every decision the application exists to make fires correctly on
ground-truth data through the production code path. Released-weight
accuracy is covered by tools/verify_release.py on real-weight day.

Usage:
    python tools/exp_decisions.py all            # train + eval (TPU, ~30 min)
    python tools/exp_decisions.py train [--det-steps N --emb-steps N]
    python tools/exp_decisions.py eval           # reuse committed checkpoints

Checkpoints + metrics land in checkpoints/decisions/ (committed, ~6 MB)
so tests/test_decision_quality.py can assert the protocol without
retraining. Results table: docs/DECISIONS.md.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np

CACHE_DIR = "/root/reference/image_cache"
CKPT_DIR = os.path.join(_REPO_ROOT, "checkpoints", "decisions")
SCENE = 320
# insightface's canonical 112x112 ArcFace landmark template, as fractions
# of the face box (helpers.py:6-15 /112): gt landmarks sit at these
# positions inside each pasted box, so a perfect detection aligns the box
# onto the canonical 112x112 frame.
REL_KPS = np.array([[38.2946, 51.6963], [73.5318, 51.5014],
                    [56.0252, 71.7366], [41.5493, 92.3655],
                    [70.7299, 92.2041]], np.float32) / 112.0
N_VAL_IDS = 20    # embedder model selection (unseen during training)
N_TEST_IDS = 40   # decision eval (unseen during training AND selection)


# --------------------------------------------------------------- identities


def load_sources(cache_dir: str = CACHE_DIR, max_side: int = 288):
    """Square person crops, one per cached CCTV image (identity = file).

    Tall CCTV crops are square-cropped with a slight upward bias (heads sit
    in the upper portion); large images downscale to bound compositing cost.
    Returns (crops, names) in deterministic filename order.
    """
    import cv2

    crops, names = [], []
    for path in sorted(glob.glob(os.path.join(cache_dir, "*.jpg"))):
        img = cv2.imread(path)
        if img is None:
            continue
        h, w = img.shape[:2]
        side = min(h, w)
        y0 = min(int(0.06 * h), h - side)
        x0 = (w - side) // 2
        sq = img[y0:y0 + side, x0:x0 + side]
        if side > max_side:
            sq = cv2.resize(sq, (max_side, max_side),
                            interpolation=cv2.INTER_AREA)
        crops.append(np.ascontiguousarray(sq))
        names.append(os.path.basename(path))
    return crops, names


def split_identities(n: int, seed: int = 0):
    """Deterministic train / val / test identity split."""
    perm = np.random.default_rng(seed).permutation(n)
    test = perm[:N_TEST_IDS]
    val = perm[N_TEST_IDS:N_TEST_IDS + N_VAL_IDS]
    train = perm[N_TEST_IDS + N_VAL_IDS:]
    return train, val, test


# -------------------------------------------------------------- compositing


def augment(rng, crop: np.ndarray) -> np.ndarray:
    """Visit-to-visit appearance jitter: sub-crop, flip, photometric."""
    import cv2

    h, w = crop.shape[:2]
    s = rng.uniform(0.85, 1.0)
    ch, cw = int(h * s), int(w * s)
    y0 = int(rng.integers(0, h - ch + 1))
    x0 = int(rng.integers(0, w - cw + 1))
    out = crop[y0:y0 + ch, x0:x0 + cw]
    if rng.random() < 0.5:
        out = out[:, ::-1]
    a = rng.uniform(0.7, 1.3)
    b = rng.uniform(-25, 25)
    out = np.clip(out.astype(np.float32) * a + b, 0, 255).astype(np.uint8)
    if out.shape[0] != h:  # restore a stable size for the paste resize
        out = cv2.resize(out, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.ascontiguousarray(out)


def make_scene(rng, crop: np.ndarray, scene: int = SCENE,
               min_box: int = 112, max_box: int = 208):
    """Paste one augmented crop onto a textured background.

    Returns (scene u8 BGR, box [x1,y1,x2,y2] f32, kps (5,2) f32) — exact
    ground truth by construction.
    """
    import cv2

    base = rng.uniform(50, 150)
    lowfreq = rng.normal(size=(scene // 16, scene // 16, 3)) * 22
    bg = base + cv2.resize(lowfreq.astype(np.float32), (scene, scene),
                           interpolation=cv2.INTER_LINEAR)
    bg += rng.normal(scale=7, size=(scene, scene, 3))
    img = np.clip(bg, 0, 255).astype(np.uint8)

    side = int(rng.integers(min_box, max_box + 1))
    patch = cv2.resize(augment(rng, crop), (side, side),
                       interpolation=cv2.INTER_AREA)
    x1 = int(rng.integers(0, scene - side + 1))
    y1 = int(rng.integers(0, scene - side + 1))
    img[y1:y1 + side, x1:x1 + side] = patch
    box = np.array([x1, y1, x1 + side, y1 + side], np.float32)
    kps = REL_KPS * side + np.array([x1, y1], np.float32)
    return img, box, kps


def scene_annotation(i, box, kps):
    from scrfd_arcface_facerecognition_tpu.train.detection_data import (
        Annotation)

    return Annotation(path=str(i), boxes=box[None],
                      kps=kps[None].astype(np.float32),
                      kps_valid=np.ones(1, bool))


# --------------------------------------------------------- detector training


def train_detector(crops, train_ids, steps, batch=16, seed=0, eval_every=250,
                   log=print):
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
    mesh = make_mesh((len(jax.devices()),), ("data",))
    model = build_scrfd("det_500m")
    trainer = SCRFDTrainer(model=model, mesh=mesh,
                           loss_cfg=SCRFDLossConfig(input_size=(SCENE, SCENE)),
                           learning_rate=0.01, warmup_steps=50,
                           decay_steps=steps)
    state = trainer.init_state(jax.random.PRNGKey(seed))

    # held-out eval scenes (fresh augmentations of train identities)
    erng = np.random.default_rng(seed + 99)
    eval_imgs, eval_anns = [], []
    for i in range(48):
        img, box, kps = make_scene(erng, crops[train_ids[i % len(train_ids)]])
        eval_imgs.append(img)
        eval_anns.append(scene_annotation(i, box, kps))

    def eval_ap(variables):
        det = Detector(variant="det_500m", variables=variables,
                       input_size=(SCENE, SCENE))
        m = evaluate_detector(det, eval_anns,
                              image_loader=lambda p: eval_imgs[int(p)])
        return m["ap"]

    def batch_arrays():
        ids = rng.choice(train_ids, size=batch)
        exs = []
        for pid in ids:
            img, box, kps = make_scene(rng, crops[pid])
            exs.append(letterbox_example((img[..., ::-1] - 127.5) / 128.0,
                                         scene_annotation(0, box, kps),
                                         (SCENE, SCENE), 2))
        return [jnp.asarray(np.stack([e[j] for e in exs]))
                for j in range(5)]

    curve = []
    t0 = time.time()
    for step in range(1, steps + 1):
        imgs, gtb, gtk, gtv, gkv = batch_arrays()
        state, loss, _ = trainer.train_step(state, imgs, gtb, gtk, gtv, gkv)
        if step % eval_every == 0 or step == steps:
            ap = float(eval_ap(state.variables))
            curve.append((step, ap))
            log(json.dumps({"curve": "decisions_det_ap50", "step": step,
                            "value": round(ap, 4),
                            "loss": round(float(loss), 3),
                            "elapsed_s": round(time.time() - t0, 1)}))
    return state.variables, curve


# --------------------------------------------------------- embedder training


def extract_aligned(det, crops, ids, per_id, seed, log=print,
                    min_iou=0.5, chunk=16):
    """Run the TRAINED detector over fresh composites and align the top
    detection to 112x112 (exactly the pipeline's crop path). Returns
    (net_in crops (N,112,112,3) f32 normalized, labels (N,) — positions
    into `ids`), plus the detection hit-rate."""
    import jax
    import jax.numpy as jnp

    from scrfd_arcface_facerecognition_tpu import ops

    @jax.jit
    def warp_batch(frames, kps):
        m = ops.estimate_norm(kps, 112)
        idx = jnp.arange(frames.shape[0], dtype=jnp.int32)
        crops112 = ops.warp.warp_affine_flat(frames, m, idx, (112, 112))
        return ops.normalize_image(crops112, ops.ARCFACE_MEAN,
                                   ops.ARCFACE_STD)

    rng = np.random.default_rng(seed)
    scenes, labels, gt_boxes = [], [], []
    for pos, pid in enumerate(ids):
        for _ in range(per_id):
            img, box, _ = make_scene(rng, crops[pid])
            scenes.append(img)
            labels.append(pos)
            gt_boxes.append(box)

    out_crops, out_labels, hits = [], [], 0
    for c in range(0, len(scenes), chunk):
        part = np.stack(scenes[c:c + chunk])
        d = det.detect_batched(jnp.asarray(part))
        boxes = np.asarray(d.boxes)[:, 0]
        kps = np.asarray(d.kps)[:, 0]
        count = np.asarray(d.count)
        keep, keep_kps = [], []
        for bi in range(len(part)):
            if count[bi] < 1:
                continue
            gt = gt_boxes[c + bi]
            bx = boxes[bi]
            ix1, iy1 = max(gt[0], bx[0]), max(gt[1], bx[1])
            ix2, iy2 = min(gt[2], bx[2]), min(gt[3], bx[3])
            inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
            union = ((gt[2] - gt[0]) * (gt[3] - gt[1])
                     + (bx[2] - bx[0]) * (bx[3] - bx[1]) - inter)
            if union <= 0 or inter / union < min_iou:
                continue
            keep.append(bi)
            keep_kps.append(kps[bi])
            out_labels.append(labels[c + bi])
        if keep:
            net_in = warp_batch(jnp.asarray(part[keep]),
                                jnp.asarray(np.stack(keep_kps)))
            out_crops.append(np.asarray(net_in))
            hits += len(keep)
    hit_rate = hits / max(1, len(scenes))
    log(json.dumps({"stage": "extract_aligned", "scenes": len(scenes),
                    "detector_hit_rate": round(hit_rate, 4)}))
    if not out_crops:
        raise RuntimeError("detector found no faces — train it longer")
    return (np.concatenate(out_crops), np.asarray(out_labels, np.int32),
            hit_rate)


def make_pairs(crop_arr, labels, n_pairs, seed):
    """Balanced same/different verification pairs from aligned crops."""
    rng = np.random.default_rng(seed)
    by_label = {}
    for i, l in enumerate(labels):
        by_label.setdefault(int(l), []).append(i)
    usable = [l for l, v in by_label.items() if len(v) >= 2]
    pairs = []
    for _ in range(n_pairs):
        l = int(rng.choice(usable))
        i, j = rng.choice(by_label[l], size=2, replace=False)
        pairs.append((crop_arr[i], crop_arr[j], True))
        la, lb = rng.choice(usable, size=2, replace=False)
        i = int(rng.choice(by_label[int(la)]))
        j = int(rng.choice(by_label[int(lb)]))
        pairs.append((crop_arr[i], crop_arr[j], False))
    return pairs


def train_embedder(det_vars, crops, train_ids, val_ids, steps, batch=64,
                   per_id=16, seed=0, eval_every=100, log=print):
    """ArcFace-train w600k_mbf on detector-aligned crops; keep the state
    with the best UNSEEN-identity verification accuracy (val_ids)."""
    import jax
    import jax.numpy as jnp

    from scrfd_arcface_facerecognition_tpu.models import build_arcface
    from scrfd_arcface_facerecognition_tpu.parallel import make_mesh
    from scrfd_arcface_facerecognition_tpu.pipeline import Detector
    from scrfd_arcface_facerecognition_tpu.train import (
        ArcFaceTrainer, evaluate_embedder)

    det = Detector(variant="det_500m", variables=det_vars,
                   input_size=(SCENE, SCENE))
    data, labels, _ = extract_aligned(det, crops, train_ids, per_id, seed,
                                      log=log)
    val_data, val_labels, _ = extract_aligned(det, crops, val_ids, 6,
                                              seed + 1, log=log)
    val_pairs = make_pairs(val_data, val_labels, 80, seed + 2)
    # seen-identity pairs: fresh scenes of training identities
    seen_data, seen_labels, _ = extract_aligned(
        det, crops, train_ids[:N_VAL_IDS], 6, seed + 3, log=log)
    seen_pairs = make_pairs(seen_data, seen_labels, 80, seed + 4)

    rng = np.random.default_rng(seed)
    mesh = make_mesh((len(jax.devices()), 1), ("data", "model"))
    model = build_arcface("w600k_mbf")
    trainer = ArcFaceTrainer(model=model, num_classes=len(train_ids),
                             mesh=mesh, learning_rate=0.05, warmup_steps=50,
                             decay_steps=steps)
    state = trainer.init_state(jax.random.PRNGKey(seed))

    def acc(variables, pairs):
        return float(evaluate_embedder(
            lambda v, x: model.apply(v, x), variables, pairs)["accuracy"])

    best = {"step": 0, "val": acc(state.backbone, val_pairs),
            "vars": jax.device_get(state.backbone)}
    curve = [(0, best["val"], acc(state.backbone, seen_pairs))]
    log(json.dumps({"curve": "decisions_verification", "step": 0,
                    "unseen_val": round(best["val"], 4),
                    "seen": round(curve[0][2], 4)}))
    t0 = time.time()
    for step in range(1, steps + 1):
        pick = rng.integers(0, len(data), size=batch)
        state, loss = trainer.train_step(
            state, jnp.asarray(data[pick]),
            jnp.asarray(labels[pick]))
        if step % eval_every == 0 or step == steps:
            va = acc(state.backbone, val_pairs)
            sa = acc(state.backbone, seen_pairs)
            curve.append((step, va, sa))
            if va > best["val"]:
                best = {"step": step, "val": va,
                        "vars": jax.device_get(state.backbone)}
            log(json.dumps({"curve": "decisions_verification", "step": step,
                            "unseen_val": round(va, 4),
                            "seen": round(sa, 4),
                            "loss": round(float(loss), 3),
                            "elapsed_s": round(time.time() - t0, 1)}))
    log(json.dumps({"stage": "model_selection", "best_step": best["step"],
                    "best_unseen_val": round(best["val"], 4)}))
    return best["vars"], curve, best


# -------------------------------------------------------------- persistence


def save_checkpoints(det_vars, emb_vars, meta, ckpt_dir=CKPT_DIR):
    import jax
    from flax import serialization

    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "det_500m.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(det_vars)))
    with open(os.path.join(ckpt_dir, "w600k_mbf.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(emb_vars)))
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoints(ckpt_dir=CKPT_DIR):
    """Rebuild (det_vars, emb_vars, meta) from the committed files."""
    import jax
    from flax import serialization

    from scrfd_arcface_facerecognition_tpu.models import (
        build_arcface, build_scrfd)
    from scrfd_arcface_facerecognition_tpu.models.init_utils import cpu_init

    det_t = cpu_init(build_scrfd("det_500m"), 0, (1, SCENE, SCENE, 3))
    emb_t = cpu_init(build_arcface("w600k_mbf"), 0, (1, 112, 112, 3))
    with open(os.path.join(ckpt_dir, "det_500m.msgpack"), "rb") as f:
        det_vars = serialization.from_bytes(jax.device_get(det_t), f.read())
    with open(os.path.join(ckpt_dir, "w600k_mbf.msgpack"), "rb") as f:
        emb_vars = serialization.from_bytes(jax.device_get(emb_t), f.read())
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    return det_vars, emb_vars, meta


def build_app(det_vars, emb_vars, det_thresh=0.5):
    from scrfd_arcface_facerecognition_tpu.apps.face_analysis import (
        FaceAnalysis)

    app = FaceAnalysis(det_variant="det_500m", rec_variant="w600k_mbf",
                       det_variables=det_vars, rec_variables=emb_vars,
                       max_det=8)
    app.prepare(det_size=(SCENE, SCENE), det_thresh=det_thresh)
    return app


# ----------------------------------------------------------- decision eval


def pairwise_prf(assign, truth):
    """Pairwise precision/recall/F1 of a clustering vs ground truth.

    assign/truth: {key: cluster_id}; unassigned keys count as singletons.
    """
    keys = sorted(truth)
    tp = fp = fn = 0
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = keys[i], keys[j]
            same_t = truth[a] == truth[b]
            sa, sb = assign.get(a), assign.get(b)
            same_a = sa is not None and sa == sb
            tp += same_t and same_a
            fp += same_a and not same_t
            fn += same_t and not same_a
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": round(prec, 4), "recall": round(rec, 4),
            "f1": round(f1, 4), "tp": tp, "fp": fp, "fn": fn}


def run_decision_eval(det_vars, emb_vars, crops, test_ids, workdir,
                      visits_per_id=6, n_verif_pairs=40, seed=0,
                      entry="json", log=print, app=None,
                      grouping_thr=None):
    """The deliverable: the full clustering decide-path on ground-truth
    data. Returns a metrics dict (see docs/DECISIONS.md)."""
    import cv2

    from scrfd_arcface_facerecognition_tpu.apps.clustering import (
        SmartFaceEngine)

    if app is None:
        app = build_app(det_vars, emb_vars)

    rng = np.random.default_rng(seed + 7)
    url_of = {}
    scenes = {}
    truth = {}
    visits = []
    for pos, pid in enumerate(test_ids):
        for k in range(visits_per_id):
            img, _, _ = make_scene(rng, crops[pid])
            url = f"http://decisions/id{pos:03d}/visit{k}.jpg"
            scenes[url] = img
            truth[url] = pos
            visits.append({"id": f"v_{pos:03d}_{k}",
                           "customerId": f"cust_{pos:03d}_{k}",
                           "entryTime": "2026-08-19T12:00:00",
                           "image": url})
    # threshold-firing probes appended at the END so the genuine visits
    # cluster first:
    # (a) exact URL repeat -> url-seen duplicate gate (reference :2625)
    dup_url = visits[0]["image"]
    visits.append({"id": "v_dup_url", "customerId": "cust_dup_url",
                   "entryTime": "2026-08-19T12:00:01", "image": dup_url})
    # (b) same pixels under a fresh URL -> the >=0.95 embedding duplicate
    #     gate (reference :2636-2645). Must duplicate a visit that CREATES
    #     a person (the first visit, on an empty gallery): stored person
    #     embeddings are the creator's, so copying a later visit's pixels
    #     would score ~0.7 against its person and JOIN instead of firing
    #     the gate.
    emb_dup_url = "http://decisions/dup-pixels.jpg"
    scenes[emb_dup_url] = scenes[visits[0]["image"]]
    visits.append({"id": "v_dup_emb", "customerId": "cust_dup_emb",
                   "entryTime": "2026-08-19T12:00:02", "image": emb_dup_url})

    def loader(src, save_path=None, timeout=30):
        img = scenes.get(src)
        if img is not None and save_path:
            cv2.imwrite(save_path, img)
        return img

    from scrfd_arcface_facerecognition_tpu.utils.config import load_config

    os.makedirs(workdir, exist_ok=True)
    cfg = load_config("config.json")
    if grouping_thr is not None:   # threshold sweep (--sweep-thresholds)
        cfg["face_recognition"]["grouping_threshold_json"] = grouping_thr
        cfg["face_recognition"]["grouping_threshold_file"] = grouping_thr
    # the ctor consumes image_cache_dir (and mkdirs it) — override BEFORE
    cfg["system"]["image_cache_dir"] = os.path.join(workdir, "cache")
    engine = SmartFaceEngine(
        database_path=os.path.join(workdir, "decisions.db"),
        app=app, image_loader=loader, config=cfg,
        results_dir=os.path.join(workdir, "results"))

    payload = {"visits": visits}
    t0 = time.time()
    if entry == "json":
        counters = engine.process_visit_data_from_json(payload,
                                                       save_images=False)
        grouping_thr = engine.config["face_recognition"][
            "grouping_threshold_json"]
    else:
        path = os.path.join(workdir, "visits.json")
        with open(path, "w") as f:
            json.dump(payload, f)
        counters = engine.process_visit_data(path, save_images=False)
        grouping_thr = engine.config["face_recognition"][
            "grouping_threshold_file"]
    elapsed = time.time() - t0

    # clustering assignment: url -> person_id from the persistence layer
    # (restricted to ground-truth visits: probe URLs carry no truth label)
    assign = {}
    for pid, _name in engine.db.list_persons():
        for v in engine.db.visits_for_person(pid):
            if v["image_url"] in truth:
                assign[v["image_url"]] = pid
    prf = pairwise_prf(assign, truth)
    n_ids_detected = len({truth[u] for u in assign})
    id_clusters = {}
    for u, p in assign.items():
        id_clusters.setdefault(truth[u], set()).add(p)

    # Duplicate-absorbed visits: the >=0.95 gate skips near-identical
    # re-sightings WITHOUT recording which person they matched (faithful
    # to reference :2636-2645, which stores nothing for duplicates), so
    # they count as unassigned in the raw pairwise recall even when the
    # skip was the right call. For ground-truth scoring we attribute each
    # absorbed visit post-hoc to the person whose stored embedding it
    # matched; a skip is CORRECT iff that person is the same identity.
    # `grouping_attributed` is therefore the meaningful recall; the raw
    # `grouping` number stays reported for transparency.
    pid_truth = {}
    for u, p in assign.items():
        pid_truth.setdefault(p, []).append(truth[u])
    pid_truth = {p: max(set(v), key=v.count) for p, v in pid_truth.items()}
    attributed = dict(assign)
    n_absorbed = n_attr = n_attr_correct = 0
    for url in sorted(truth):
        if url in attributed:
            continue
        n_absorbed += 1
        faces = app.get(scenes[url])
        data, _reason = engine._gate_face(engine._best_face(faces), url)
        if data is None:
            if n_absorbed <= 3 or os.environ.get("DECISIONS_DEBUG"):
                log(json.dumps({"debug": "attr_gate_reject", "url": url,
                                "reason": _reason,
                                "n_faces": len(faces or [])}))
            continue
        hits = engine.vector_db.search_similar(data["embedding"], k=1,
                                               threshold=None)
        if not hits:
            if n_absorbed <= 3 or os.environ.get("DECISIONS_DEBUG"):
                q = np.asarray(data["embedding"], np.float32)
                log(json.dumps({
                    "debug": "attr_no_hits", "url": url,
                    "gallery_count": engine.vector_db.get_embedding_count(),
                    "qnorm": round(float(np.linalg.norm(q)), 4),
                    "q_finite": bool(np.all(np.isfinite(q))),
                    "k3": repr(engine.vector_db.search_similar(
                        q, k=3, threshold=None))[:160]}))
            continue
        attributed[url] = hits[0].id
        n_attr += 1
        n_attr_correct += pid_truth.get(hits[0].id) == truth[url]
    prf_attr = pairwise_prf(attributed, truth)

    # verification through the reference-shaped compare path
    vrng = np.random.default_rng(seed + 13)
    same_sims, diff_sims, correct = [], [], 0
    for _ in range(n_verif_pairs):
        a = int(vrng.choice(len(test_ids)))
        b = int(vrng.choice([x for x in range(len(test_ids)) if x != a]))
        s1, _, _ = make_scene(vrng, crops[test_ids[a]])
        s2, _, _ = make_scene(vrng, crops[test_ids[a]])
        d1, _, _ = make_scene(vrng, crops[test_ids[b]])
        r_same = engine.compare_face_images(s1, s2)
        r_diff = engine.compare_face_images(s1, d1)
        if r_same.get("success"):
            same_sims.append(r_same["similarity"])
            correct += bool(r_same["same_person"])
        if r_diff.get("success"):
            diff_sims.append(r_diff["similarity"])
            correct += not r_diff["same_person"]
    n_verif = len(same_sims) + len(diff_sims)
    verif = {
        "pairs": n_verif,
        "accuracy_at_0.2": round(correct / max(1, n_verif), 4),
        "same_sim_mean": round(float(np.mean(same_sims)), 4) if same_sims
        else None,
        "diff_sim_mean": round(float(np.mean(diff_sims)), 4) if diff_sims
        else None,
    }

    # merge threshold: split one test identity into two persons by hand,
    # then find_and_merge_duplicates(0.8) must reunite them — and must
    # NOT merge across identities.
    mrng = np.random.default_rng(seed + 17)
    pre_pairs = []
    split_ids = []
    for pos in (0, 1):
        img, _, _ = make_scene(mrng, crops[test_ids[pos]])
        faces = engine.app.get(img)
        data, reason = engine._gate_face(engine._best_face(faces),
                                         f"merge-probe-{pos}")
        if data is None:
            continue
        pid = engine.add_person(f"split_probe_{pos}",
                                f"http://decisions/merge{pos}.jpg", data)
        if pid > 0:
            split_ids.append((pos, pid))
    n_persons_before = engine.db.stats()["total_persons"]
    merged, pairs = engine.find_and_merge_duplicates(return_pairs=True)
    cross_id_merges = 0
    same_id_merges = 0
    for p in pairs:
        kept_urls = [v["image_url"]
                     for v in engine.db.visits_for_person(p["kept"])]
        kept_ids = {truth[u] for u in kept_urls if u in truth}
        # merged person's identity from the probe bookkeeping
        probe = [pos for pos, pid in split_ids if pid == p["merged"]]
        if probe and kept_ids == {probe[0]}:
            same_id_merges += 1
        elif probe:
            cross_id_merges += 1
    merge = {"persons_before": n_persons_before, "merged": merged,
             "same_id_merges": same_id_merges,
             "cross_id_merges": cross_id_merges,
             "split_probes_added": len(split_ids)}

    metrics = {
        "entry": entry, "grouping_threshold": grouping_thr,
        "n_test_identities": len(test_ids),
        "n_visits": len(visits), "elapsed_s": round(elapsed, 1),
        "counters": counters,
        "grouping": prf,
        "grouping_attributed": prf_attr,
        "duplicate_attribution": {
            "absorbed": n_absorbed, "attributed": n_attr,
            "correct": n_attr_correct,
            "accuracy": round(n_attr_correct / n_attr, 4) if n_attr
            else None,
        },
        "n_identities_with_cluster": n_ids_detected,
        "mean_clusters_per_identity": round(
            float(np.mean([len(s) for s in id_clusters.values()])), 3)
        if id_clusters else None,
        "duplicate_gate": {
            "expected_min": 2,          # probes (a) + (b)
            "duplicate_faces_counter": counters["duplicate_faces"],
        },
        "verification": verif,
        "merge": merge,
    }
    log(json.dumps({"stage": "decision_eval", **metrics}))
    return metrics


# --------------------------------------------------------------------- main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["train", "eval", "all"])
    ap.add_argument("--det-steps", type=int, default=1500)
    ap.add_argument("--emb-steps", type=int, default=1500)
    ap.add_argument("--per-id", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/decisions_eval")
    ap.add_argument("--visits-per-id", type=int, default=6)
    ap.add_argument("--entry", choices=["json", "file"], default="json")
    ap.add_argument("--sweep-thresholds", type=float, nargs="*",
                    default=None,
                    help="eval once per grouping threshold (one process, "
                         "shared compile cache); writes "
                         "metrics_sweep.json instead of metrics_<entry>")
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"],
                    help="force a JAX backend (cpu = local; the env var "
                         "alone is too late on this machine — sitecustomize "
                         "registers the TPU tunnel at startup)")
    args = ap.parse_args()
    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

    crops, names = load_sources()
    train_ids, val_ids, test_ids = split_identities(len(crops), args.seed)
    print(json.dumps({"stage": "data", "identities": len(crops),
                      "train": len(train_ids), "val": len(val_ids),
                      "test": len(test_ids)}), flush=True)

    log = lambda s: print(s, flush=True)  # noqa: E731
    if args.cmd in ("train", "all"):
        det_vars, det_curve = train_detector(crops, train_ids,
                                             args.det_steps, seed=args.seed,
                                             log=log)
        emb_vars, emb_curve, best = train_embedder(
            det_vars, crops, train_ids, val_ids, args.emb_steps,
            per_id=args.per_id, seed=args.seed, log=log)
        meta = {
            "seed": args.seed, "scene": SCENE,
            "split": {"train": len(train_ids), "val": len(val_ids),
                      "test": len(test_ids)},
            "det_steps": args.det_steps, "emb_steps": args.emb_steps,
            "det_ap_curve": det_curve,
            "emb_curve": [list(c) for c in emb_curve],
            "best_unseen_val_accuracy": best["val"],
            "best_step": best["step"],
            "trained_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        save_checkpoints(det_vars, emb_vars, meta)
        print(json.dumps({"stage": "checkpoints_saved", "dir": CKPT_DIR}),
              flush=True)
    if args.cmd in ("eval", "all"):
        if args.cmd == "eval":
            det_vars, emb_vars, meta = load_checkpoints()
        if args.sweep_thresholds:
            app = build_app(det_vars, emb_vars)   # shared compile cache
            sweep = []
            for thr in args.sweep_thresholds:
                m = run_decision_eval(
                    det_vars, emb_vars, crops, test_ids,
                    os.path.join(args.workdir, f"thr_{thr:g}"),
                    visits_per_id=args.visits_per_id, seed=args.seed,
                    entry=args.entry, log=log, app=app, grouping_thr=thr)
                sweep.append(m)
            out = os.path.join(CKPT_DIR, "metrics_sweep.json")
            with open(out, "w") as f:
                json.dump(sweep, f, indent=2)
        else:
            metrics = run_decision_eval(det_vars, emb_vars, crops, test_ids,
                                        args.workdir,
                                        visits_per_id=args.visits_per_id,
                                        seed=args.seed, entry=args.entry,
                                        log=log)
            out = os.path.join(CKPT_DIR, f"metrics_{args.entry}.json")
            with open(out, "w") as f:
                json.dump(metrics, f, indent=2)
        print(json.dumps({"stage": "done", "metrics_file": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
