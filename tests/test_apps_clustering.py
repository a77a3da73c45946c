"""Clustering engine behavior vs the reference's visit-processing semantics."""
import glob
import json
import os

import numpy as np
import pytest

from scrfd_arcface_facerecognition_tpu.apps.clustering import SmartFaceEngine
from scrfd_arcface_facerecognition_tpu.utils.config import DEFAULT_CONFIG, deep_update
from fake_stack import FakeFaceAnalysis, FakeImageStore, visit


@pytest.fixture(params=["dense", "pq"])
def engine(tmp_path, request):
    """The whole suite runs on BOTH gallery tiers: dense (the default
    below the HBM threshold) and forced-PQ (gallery/auto.py migrates after
    2 rows) — proving the reference workloads are tier-blind
    (VERDICT r3 item 4)."""
    store = FakeImageStore()
    cfg = deep_update(DEFAULT_CONFIG, {
        "system": {"database_path": str(tmp_path / "face.db"),
                   "image_cache_dir": str(tmp_path / "cache")},
        "vector_database": {"tier": request.param,
                            "pq_min_train_rows": 2}})
    eng = SmartFaceEngine(config=cfg, app=FakeFaceAnalysis(),
                          image_loader=store.loader,
                          results_dir=str(tmp_path / "results"))
    eng._store = store
    eng._tmp = tmp_path
    return eng


def _urls(engine, spec):
    """spec: list of (url, identity, jitter)."""
    return [engine._store.add(u, i, j) for (u, i, j) in spec]


def test_same_person_groups_different_creates(engine):
    _urls(engine, [("http://x/a1.jpg", 1, 0), ("http://x/a2.jpg", 1, 1),
                   ("http://x/b1.jpg", 2, 0)])
    visits = [visit(0, "http://x/a1.jpg"), visit(1, "http://x/a2.jpg"),
              visit(2, "http://x/b1.jpg")]
    data = {"visits": visits}
    p = engine._tmp / "visits.json"
    p.write_text(json.dumps(data))
    results = engine.process_visit_data(str(p), save_images=False)
    assert results["new_persons"] == 2        # identities 1 and 2
    assert results["recognized"] == 1         # a2 joins a1's person
    assert results["processed"] == 3
    assert engine.vector_db.get_embedding_count() == 2
    assert engine.get_web_stats()["total_persons"] == 2


def test_non_http_visits_filtered(engine):
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": [
        {"id": 1, "image": "/local/path.jpg"},
        {"id": 2, "image": None}, {"id": 3}]}))
    results = engine.process_visit_data(str(p))
    assert results["processed"] == 0


def test_duplicate_url_skipped(engine):
    _urls(engine, [("http://x/a.jpg", 1, 0)])
    visits = [visit(0, "http://x/a.jpg"), visit(1, "http://x/a.jpg")]
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": visits}))
    results = engine.process_visit_data(str(p), save_images=False)
    assert results["duplicate_faces"] == 1
    assert results["processed"] == 1


def test_near_duplicate_embedding_skipped(engine):
    # jitter=0 twice with different URLs -> identical embedding -> >=0.95 dup
    _urls(engine, [("http://x/a.jpg", 1, 0), ("http://x/acopy.jpg", 1, 0)])
    visits = [visit(0, "http://x/a.jpg"), visit(1, "http://x/acopy.jpg")]
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": visits}))
    results = engine.process_visit_data(str(p), save_images=False)
    assert results["duplicate_faces"] == 1


def test_no_face_goes_to_low_similarity(engine):
    engine.app.no_face_identities = {7}
    _urls(engine, [("http://x/n.jpg", 7, 0)])
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": [visit(0, "http://x/n.jpg")]}))
    results = engine.process_visit_data(str(p), save_images=False)
    assert results["no_faces"] == 1
    rows = engine.get_low_similarity_images()
    assert len(rows) == 1
    assert "No face detected" in rows[0]["reason"]


def test_clustering_results_json_schema(engine):
    _urls(engine, [("http://x/a1.jpg", 1, 0), ("http://x/a2.jpg", 1, 1)])
    visits = [visit(0, "http://x/a1.jpg", box={"width": 90, "height": 120,
                                               "top": 100, "left": 100}),
              visit(1, "http://x/a2.jpg")]
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": visits}))
    engine.process_visit_data(str(p), save_images=False)
    files = glob.glob(str(engine._tmp / "results" / "clustering_results_*.json"))
    assert len(files) == 1
    payload = json.loads(open(files[0]).read())
    for key in ("job_id", "status", "timestamp", "total_processed",
                "total_groups", "results", "message", "groups"):
        assert key in payload, key
    assert payload["status"] == "finished"
    g = payload["groups"][0]
    for key in ("group_id", "person_id", "person_name", "timestamp",
                "group_score", "camera", "event", "branchId", "fileName",
                "age", "gender", "visit_count", "visits"):
        assert key in g, key
    v = g["visits"][0]
    assert set(v) == {"visit_id", "customer_id", "image_url", "entry_time",
                      "similarity"}


def test_json_entry_point_bbox_side_gate(engine):
    _urls(engine, [("http://x/side.jpg", 1, 0), ("http://x/ok.jpg", 2, 0)])
    side_box = {"width": 15, "height": 100, "top": 300, "left": 300}
    ok_box = {"width": 90, "height": 120, "top": 300, "left": 300}
    data = {"visits": [visit(0, "http://x/side.jpg", box=side_box),
                       visit(1, "http://x/ok.jpg", box=ok_box)]}
    results = engine.process_visit_data_from_json(data, save_images=False)
    assert results["low_quality"] == 1        # rejected before download
    assert results["processed"] == 1


def test_low_confidence_rejected(engine):
    engine.app.det_score = 0.3  # below confidence_threshold 0.6
    _urls(engine, [("http://x/a.jpg", 1, 0)])
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": [visit(0, "http://x/a.jpg")]}))
    results = engine.process_visit_data(str(p), save_images=False)
    assert results["no_faces"] == 1


def test_find_and_merge_duplicates(engine):
    # two persons created above merge threshold 0.8: force via add_person
    e1 = {"embedding": np.ones(512, np.float32) / np.sqrt(512),
          "quality": {"overall": .8, "blur": .8, "pose": .8, "lighting": .8},
          "face_hash": "h1", "bbox": [0, 0, 1, 1], "det_score": .9,
          "face_confidence": .9, "image_source": "u1"}
    e2 = dict(e1, face_hash="h2", image_source="u2")
    e3 = dict(e1, face_hash="h3", image_source="u3",
              embedding=np.concatenate([np.ones(256), -np.ones(256)])
              .astype(np.float32) / np.sqrt(512))
    p1 = engine.add_person("a", "u1", e1)
    p2 = engine.add_person("b", "u2", e2)
    p3 = engine.add_person("c", "u3", e3)
    engine.db.store_visit(p2, "v1", "c", "t", "u", None, 0.9)
    merged = engine.find_and_merge_duplicates()
    assert merged == 1
    assert engine.db.get_person(p2) is None
    assert engine.db.get_person(p1) is not None
    assert engine.db.get_person(p3) is not None
    assert engine.vector_db.get_embedding_count() == 2
    # visits repointed
    assert engine.db.visits_for_person(p1)[0]["visit_id"] == "v1"


def test_add_person_hash_dedup_and_rollback(engine):
    e1 = {"embedding": np.ones(512, np.float32),
          "quality": {"overall": .8, "blur": .8, "pose": .8, "lighting": .8},
          "face_hash": "same", "bbox": [0, 0, 1, 1], "det_score": .9,
          "face_confidence": .9, "image_source": "u1"}
    assert engine.add_person("a", "u1", e1) > 0
    assert engine.add_person("b", "u2", dict(e1)) == -1  # duplicate hash
    # the rejected add must leave NO stale vector or person row behind
    assert engine.vector_db.get_embedding_count() == 1
    assert engine.get_web_stats()["total_persons"] == 1


def test_clear_all_data(engine):
    _urls(engine, [("http://x/a.jpg", 1, 0)])
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": [visit(0, "http://x/a.jpg")]}))
    engine.process_visit_data(str(p), save_images=False)
    engine.clear_all_data()
    assert engine.get_web_stats()["total_persons"] == 0
    assert engine.vector_db.get_embedding_count() == 0


def test_process_from_json_clear_existing(engine):
    _urls(engine, [("http://x/a.jpg", 1, 0), ("http://x/b.jpg", 2, 0)])
    ok_box = {"width": 90, "height": 120, "top": 300, "left": 300}
    engine.process_visit_data_from_json(
        {"visits": [visit(0, "http://x/a.jpg", box=ok_box)]}, save_images=False)
    assert engine.get_web_stats()["total_persons"] == 1
    engine.process_visit_data_from_json(
        {"visits": [visit(1, "http://x/b.jpg", box=ok_box)]},
        save_images=False, clear_existing=True)
    assert engine.get_web_stats()["total_persons"] == 1  # cleared then 1 new


def test_reference_visit_cluster_json_parses(engine):
    """The committed 149-visit input sample must load through our filter."""
    visits = engine.load_visit_data("/root/reference/visit-cluster.json")
    assert len(visits) > 100
    assert all(v["image"].startswith("http") for v in visits)
    # pre-bbox side gate runs over real records without crashing
    from scrfd_arcface_facerecognition_tpu.apps import quality as Q
    for v in visits[:20]:
        Q.check_side_face_from_json_bbox(v, engine.config)


def test_extract_batch_passes_original_shapes(engine):
    """Ingest hands ORIGINAL shapes to FaceAnalysis — shape bucketing (and
    its exact-numerics guarantee) lives inside get_batch now
    (tests/test_bucket_parity.py covers the dynamic bucket path)."""
    calls = []
    orig = engine.app.get_batch

    def spy(images, max_num=0):
        calls.append([im.shape for im in images])
        return orig(images, max_num=max_num)

    engine.app.get_batch = spy
    from fake_stack import make_image
    engine._store.images["http://x/odd1.jpg"] = make_image(1, h=231, w=317)
    engine._store.images["http://x/odd2.jpg"] = make_image(2, h=199, w=305)
    results = engine.extract_batch(["http://x/odd1.jpg", "http://x/odd2.jpg"])
    assert all(r is not None for r in results)
    shapes = {s for call in calls for s in call}
    assert shapes == {(231, 317, 3), (199, 305, 3)}


def test_download_failure_counted_separately(engine):
    """A failed download increments download_failed (not no_faces) and
    lands in low_similarity with a download reason; the rest of the batch
    still processes (reference folds this into no_faces,
    smart_face_recognition.py:2117 — split intentionally)."""
    _urls(engine, [("http://x/ok.jpg", 1, 0)])
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": [
        visit(0, "http://x/missing.jpg"),   # not in the store -> loader None
        visit(1, "http://x/ok.jpg")]}))
    results = engine.process_visit_data(str(p), save_images=False)
    assert results["download_failed"] == 1
    assert results["no_faces"] == 0
    assert results["new_persons"] == 1
    rows = engine.get_low_similarity_images()
    assert any("download" in r["reason"].lower() for r in rows)


def test_mid_batch_exception_isolated(engine):
    """A per-visit DB exception must not kill the batch: the failed visit
    counts as no_faces (reference :1973-1977) and later visits complete."""
    _urls(engine, [("http://x/a.jpg", 1, 0), ("http://x/b.jpg", 2, 0),
                   ("http://x/c.jpg", 3, 0)])
    orig = engine.db.store_visit
    boom = {"n": 0}

    def flaky(pid, visit_id, *a, **k):
        boom["n"] += 1
        if visit_id == "1":
            raise RuntimeError("injected DB failure")
        return orig(pid, visit_id, *a, **k)

    engine.db.store_visit = flaky
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": [
        visit(0, "http://x/a.jpg"), visit(1, "http://x/b.jpg"),
        visit(2, "http://x/c.jpg")]}))
    results = engine.process_visit_data(str(p), save_images=False)
    assert results["no_faces"] == 1          # the injected failure
    assert results["new_persons"] == 2       # visits 0 and 2 completed
    assert boom["n"] == 3                    # all three visits attempted


def test_quality_gate_counts_low_quality(engine):
    """Quality-gate rejections increment low_quality, not no_faces."""
    cfg = engine.config
    cfg["face_detection"]["min_quality_threshold"] = 2.0  # impossible bar
    _urls(engine, [("http://x/a.jpg", 1, 0)])
    p = engine._tmp / "v.json"
    p.write_text(json.dumps({"visits": [visit(0, "http://x/a.jpg")]}))
    results = engine.process_visit_data(str(p), save_images=False)
    assert results["low_quality"] == 1
    assert results["no_faces"] == 0


def test_api_transform_isolates_malformed_records():
    """One malformed API record (scalar where a dict is expected, or a
    non-dict record) must not abort the whole fetch; scalar age/gender
    fields are accepted as-is."""
    raw = [
        {"id": "v1", "image": "http://x/1.jpg",
         "faceResponse": {"imageUrl": "http://x/1.jpg",
                          "age": 25, "gender": "male"}},   # bare scalars
        "not-a-dict-record",                               # malformed
        {"id": "v2", "imageUrl": "http://x/2.jpg",
         "faceResponse": None},
        {"id": "v3", "image": "http://x/3.jpg",
         "faceResponse": {"age": {"low": 30},
                          "gender": {"value": "female"},
                          "boxData": {"imageUrl": "http://x/3.jpg"}}},
    ]
    visits = SmartFaceEngine._transform_api_visits(raw)
    assert [v["id"] for v in visits] == ["v1", "v2", "v3"]
    assert visits[0]["age"] == 25 and visits[0]["gender"] == "male"
    assert visits[2]["age"] == 30 and visits[2]["gender"] == "female"


def test_compare_face_images_rich_payload(engine):
    """Reference payload parity (smart_face_recognition.py:878-980):
    same_person/confidence/threshold_used/image urls/error, plus the
    per-face diagnostic block (det score, bbox, quality components,
    side-face verdict)."""
    _urls(engine, [("http://x/p1.jpg", 1, 0), ("http://x/p2.jpg", 1, 1),
                   ("http://x/q.jpg", 2, 0)])
    out = engine.compare_face_images("http://x/p1.jpg", "http://x/p2.jpg")
    assert out["success"] and out["error"] is None
    assert out["same_person"] is True
    assert out["confidence"] == out["similarity"] > \
        engine.config["face_comparison"]["similarity_threshold"]
    assert out["threshold_used"] == out["threshold"]
    assert out["image1_url"] == "http://x/p1.jpg"
    assert out["image2_url"] == "http://x/p2.jpg"
    for fk in ("face1", "face2"):
        d = out[fk]
        assert 0.0 <= d["det_score"] <= 1.0
        assert len(d["bbox"]) == 4
        assert d["n_faces_in_image"] >= 1
        assert isinstance(d["is_side_face"], bool)
        assert set(d["quality"]) >= {"overall"} or len(d["quality"]) > 0
    # different identities fall below the threshold
    neg = engine.compare_face_images("http://x/p1.jpg", "http://x/q.jpg")
    assert neg["success"] and neg["same_person"] is False
    # reference error shape: download failure
    err = engine.compare_face_images("http://x/missing.jpg",
                                     "http://x/p1.jpg")
    assert not err["success"] and err["same_person"] is False
    assert err["confidence"] == 0.0 and "download" in err["error"].lower()
    assert err["image1_url"] == "http://x/missing.jpg"
