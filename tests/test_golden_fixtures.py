"""Golden-fixture tests against the reference repo's committed artifacts.

The reference ships real data that serves as fixtures (SURVEY.md §4):
image_cache/*.jpg (360 downloaded face crops), visit-cluster.json (149-visit
input sample), clustering_results/*.json (output schema examples), and
face_database.db (covered in test_apps_db.py).
"""
import glob
import json
import os

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

REF = "/root/reference"
CACHE = sorted(glob.glob(os.path.join(REF, "image_cache", "*.jpg")))


@pytest.mark.skipif(not CACHE, reason="reference image_cache unavailable")
def test_real_images_through_detector_pipeline():
    """Real JPEGs run through decode -> letterbox -> detect -> embed without
    shape/numeric blowups (random weights: detections arbitrary but finite)."""
    from scrfd_arcface_facerecognition_tpu.apps.face_analysis import FaceAnalysis

    app = FaceAnalysis(det_variant="det_500m", rec_variant="w600k_mbf")
    app.prepare(ctx_id=0, det_size=(640, 640), det_thresh=0.01)
    images = [cv2.imread(p) for p in CACHE[:4]]
    assert all(im is not None for im in images)
    face_lists = app.get_batch(images)
    assert len(face_lists) == 4
    for faces in face_lists:
        for f in faces:
            assert np.isfinite(f.bbox).all()
            assert np.isfinite(f.embedding).all()
            assert abs(np.linalg.norm(f.normed_embedding) - 1.0) < 1e-4


@pytest.mark.skipif(not CACHE, reason="reference image_cache unavailable")
def test_engine_extract_from_local_files(tmp_path):
    """extract_face_embedding on local paths (the reference's cv2.imread
    branch, smart_face_recognition.py:1465-1470)."""
    from scrfd_arcface_facerecognition_tpu.apps.clustering import SmartFaceEngine
    from scrfd_arcface_facerecognition_tpu.utils.config import (
        DEFAULT_CONFIG, deep_update)
    from fake_stack import FakeFaceAnalysis

    cfg = deep_update(DEFAULT_CONFIG, {
        "system": {"database_path": str(tmp_path / "f.db"),
                   "image_cache_dir": str(tmp_path / "cache")}})
    engine = SmartFaceEngine(config=cfg, app=FakeFaceAnalysis(),
                             results_dir=str(tmp_path))
    data = engine.extract_face_embedding(CACHE[0])
    assert data is not None
    assert data["embedding"].shape == (512,)
    assert len(data["face_hash"]) == 32
    assert engine.extract_face_embedding(str(tmp_path / "missing.jpg")) is None


def test_reference_clustering_results_schema_compat(tmp_path):
    """Our exporter's payload covers every key the committed results use."""
    ref_files = sorted(glob.glob(os.path.join(REF, "clustering_results",
                                              "*.json")))
    if not ref_files:
        pytest.skip("no committed clustering results")
    ref = json.load(open(ref_files[-1]))

    from scrfd_arcface_facerecognition_tpu.apps.json_storage import (
        JSONStorageManager)
    mgr = JSONStorageManager(output_dir=str(tmp_path))
    groups = [{"person_id": 1, "person_name": "P",
               "visits": [{"visit_id": 1, "customerId": "c",
                           "image": "http://x", "entryTime": "t",
                           "similarity": 0.9,
                           "entryEventIds": [{"event": "entry",
                                              "fileName": "f.jpg",
                                              "camera": "cam"}]}]}]
    ours = mgr.format_groups_for_json(groups)[0]
    ours_payload_keys = {"job_id", "status", "timestamp", "total_processed",
                         "total_groups", "results", "message", "groups"}
    assert set(ref.keys()) <= ours_payload_keys
    ref_group_keys = set(ref["groups"][0].keys()) if ref.get("groups") else set()
    assert ref_group_keys <= set(ours.keys())
    if ref.get("groups") and ref["groups"][0].get("visits"):
        assert set(ref["groups"][0]["visits"][0].keys()) <= set(
            ours["visits"][0].keys())


def test_reference_visit_sample_clusters_with_fake_stack(tmp_path):
    """Replay the committed 149-visit input through the engine (fake models,
    local image substitution) — structural integration of the full flow."""
    from scrfd_arcface_facerecognition_tpu.apps.clustering import SmartFaceEngine
    from scrfd_arcface_facerecognition_tpu.utils.config import (
        DEFAULT_CONFIG, deep_update)
    from fake_stack import FakeFaceAnalysis, FakeImageStore

    visits = json.load(open(os.path.join(REF, "visit-cluster.json")))["visits"]
    visits = [v for v in visits if v.get("image", "").startswith("http")][:24]
    store = FakeImageStore()
    # map each URL to one of 6 synthetic identities
    for i, v in enumerate(visits):
        store.add(v["image"], identity=i % 6, jitter=i // 6)

    cfg = deep_update(DEFAULT_CONFIG, {
        "system": {"database_path": str(tmp_path / "f.db"),
                   "image_cache_dir": str(tmp_path / "cache")}})
    engine = SmartFaceEngine(config=cfg, app=FakeFaceAnalysis(),
                             image_loader=store.loader,
                             results_dir=str(tmp_path / "results"))
    src = tmp_path / "visits.json"
    src.write_text(json.dumps({"visits": visits}))
    results = engine.process_visit_data(str(src), save_images=False)
    assert results["processed"] > 0
    assert results["new_persons"] >= 1
    total = engine.get_web_stats()
    assert total["total_persons"] == results["new_persons"]
    out_files = glob.glob(str(tmp_path / "results" / "clustering_results_*"))
    assert len(out_files) == 1
