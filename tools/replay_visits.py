"""Replay the reference's committed 149-visit sample offline.

The reference repo ships its real workload: `visit-cluster.json` (149
visits with CDN image URLs) and `image_cache/` (the downloaded crops,
named md5(url).jpg — 115/149 resolve). This driver runs that exact batch
through the real TPU clustering engine with a loader that serves the
cached files instead of the network, exercising detect -> gates -> embed
-> batched gallery search -> SQLite/JSON persistence end-to-end with zero
egress.

    python tools/replay_visits.py [--max-visits N] [--det det_10g]
        [--rec w600k_r50] [--workdir DIR]
"""
import argparse
import hashlib
import json
import os
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

REF = "/root/reference"


def cached_loader(cache_dir: str):
    import cv2

    def load(source: str, save_path=None):
        path = os.path.join(cache_dir,
                            hashlib.md5(source.encode()).hexdigest() + ".jpg")
        if not os.path.exists(path):
            return None
        img = cv2.imread(path)
        if img is not None and save_path:
            cv2.imwrite(save_path, img)
        return img

    return load


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-visits", type=int, default=149)
    ap.add_argument("--det", type=str, default="det_10g")
    ap.add_argument("--rec", type=str, default="w600k_r50")
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--visits-json", type=str,
                    default=os.path.join(REF, "visit-cluster.json"))
    ap.add_argument("--image-cache", type=str,
                    default=os.path.join(REF, "image_cache"))
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="replay_")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    from scrfd_arcface_facerecognition_tpu.apps.clustering import (
        SmartFaceEngine)
    from scrfd_arcface_facerecognition_tpu.apps.face_analysis import (
        FaceAnalysis)
    from scrfd_arcface_facerecognition_tpu.utils.compile_cache import (
        enable_compile_cache)

    enable_compile_cache(_REPO_ROOT)
    app = FaceAnalysis(det_variant=args.det, rec_variant=args.rec)
    app.prepare(det_size=(640, 640))
    engine = SmartFaceEngine(database_path=os.path.join(workdir, "replay.db"),
                             app=app,
                             image_loader=cached_loader(args.image_cache),
                             results_dir=os.path.join(workdir, "results"))

    data = json.load(open(args.visits_json))
    t0 = time.time()
    results = engine.process_visit_data_from_json(
        data, max_visits=args.max_visits, save_images=False)
    dt = time.time() - t0
    n = sum(results[k] for k in ("processed", "no_faces", "low_quality",
                                 "download_failed", "duplicate_faces"))
    print(json.dumps({"results": results, "visits_handled": n,
                      "seconds": round(dt, 1),
                      "visits_per_sec": round(n / max(dt, 1e-9), 2),
                      "workdir": workdir}))
    return results


if __name__ == "__main__":
    main()
