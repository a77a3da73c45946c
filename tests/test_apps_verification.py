"""Verification engine: record transform, comparison loop, accuracy-vs-API."""
import numpy as np

from scrfd_arcface_facerecognition_tpu.apps.verification import FaceComparison
from scrfd_arcface_facerecognition_tpu.utils.config import DEFAULT_CONFIG
from fake_stack import FakeFaceAnalysis, FakeImageStore


def _fc():
    store = FakeImageStore()
    fc = FaceComparison(config=DEFAULT_CONFIG, app=FakeFaceAnalysis(),
                        image_loader=store.loader)
    return fc, store


def test_compare_same_and_different():
    fc, store = _fc()
    store.add("http://x/a1.jpg", 1, 0)
    store.add("http://x/a2.jpg", 1, 1)
    store.add("http://x/b.jpg", 2, 0)
    same = fc.compare_face_images("http://x/a1.jpg", "http://x/a2.jpg")
    assert same["same_person"] and same["confidence"] > 0.2
    assert same["error"] is None
    diff = fc.compare_face_images("http://x/a1.jpg", "http://x/b.jpg")
    assert not diff["same_person"]


def test_compare_download_failure():
    fc, _ = _fc()
    out = fc.compare_face_images("http://x/missing.jpg", "http://x/m2.jpg")
    assert not out["same_person"] and out["error"]


def test_compare_no_face():
    fc, store = _fc()
    fc.app.no_face_identities = {9}
    store.add("http://x/n.jpg", 9, 0)
    store.add("http://x/a.jpg", 1, 0)
    out = fc.compare_face_images("http://x/n.jpg", "http://x/a.jpg")
    assert "detect faces" in out["error"]


def test_transform_records():
    raw = [
        {"id": "v1", "image": "http://i1", "refImage": "http://r1",
         "isConverted": True, "branchId": "b1", "entryTime": "t1",
         "customerId": "c1",
         "entryEventIds": [{"eventId": "e1", "fileName": "f1.jpg",
                            "event": "entry", "camera": "cam1"}]},
        {"id": "v2", "image": "http://i2"},                   # no refImage
        {"id": "v3", "image": "http://i3", "refImage": "http://r3"},
    ]
    records = FaceComparison.transform_records(raw)
    assert len(records) == 2
    r = records[0]
    assert r["comparison_id"] == "v1" and r["approve"] is True
    assert r["event_id"] == "e1" and r["fileName"] == "f1.jpg"
    assert r["camera"] == "cam1" and r["customer_info"] == ["c1"]
    assert records[1]["approve"] is False


def test_process_face_comparisons_accuracy():
    fc, store = _fc()
    store.add("http://x/a1.jpg", 1, 0)
    store.add("http://x/a2.jpg", 1, 1)
    store.add("http://x/b.jpg", 2, 0)
    records = FaceComparison.transform_records([
        {"id": "r1", "image": "http://x/a1.jpg", "refImage": "http://x/a2.jpg",
         "isConverted": True},    # same person, API agrees
        {"id": "r2", "image": "http://x/a1.jpg", "refImage": "http://x/b.jpg",
         "isConverted": True},    # different, API says same -> mismatch
    ])
    out = fc.process_face_comparisons(records)
    assert out["processed"] == 2
    assert out["same_person"] == 1
    assert out["different_person"] == 1
    assert out["api_matches"] == 1
    assert abs(out["accuracy_vs_api"] - 50.0) < 1e-9
    statuses = [r["match_status"] for r in out["results"]]
    assert statuses == ["SAME", "DIFFERENT"]


def test_max_comparisons_limit():
    fc, store = _fc()
    store.add("http://x/a.jpg", 1, 0)
    records = FaceComparison.transform_records([
        {"id": f"r{i}", "image": "http://x/a.jpg",
         "refImage": "http://x/a.jpg"} for i in range(5)])
    out = fc.process_face_comparisons(records, max_comparisons=2)
    assert out["processed"] == 2


def test_empty_records():
    fc, _ = _fc()
    out = fc.process_face_comparisons([])
    assert out["total_comparisons"] == 0 and out["results"] == []


def test_comparison_results_json_schema():
    """face_comparison_results_<ts>.json payload matches the reference
    field-for-field (smart_face_recognition.py:3164-3232): metadata keys,
    the per-comparison 7-field set, and the eventId fallback rules."""
    from scrfd_arcface_facerecognition_tpu.apps.verification import (
        build_comparison_results_json)

    fc, store = _fc()
    store.add("http://x/p1.jpg", 1, 0)
    store.add("http://x/p2.jpg", 1, 1)
    raw_with_events = {"entryEventIds": [{"fileName": "f.jpg",
                                          "event": "entry", "camera": "c1",
                                          "eventId": "ev-7"}]}
    records = [
        {"comparison_id": "c1", "event_id": "ev-7", "branch_id": "b1",
         "created_at": "t", "customer_info": [], "matched_info": [],
         "approve": True, "image1_url": "http://x/p1.jpg",
         "image2_url": "http://x/p2.jpg", "raw_data": raw_with_events},
        {"comparison_id": "c2", "event_id": "ev-str-fallback",
         "branch_id": "b2", "created_at": "t", "customer_info": [],
         "matched_info": [], "approve": False,
         "image1_url": "http://x/p1.jpg", "image2_url": "http://x/p2.jpg",
         "raw_data": {}},
    ]
    results = fc.process_face_comparisons(records)
    payload = build_comparison_results_json(results)

    assert set(payload) == {"metadata", "comparisons"}
    assert set(payload["metadata"]) == {
        "generated_at", "total_comparisons", "same_person",
        "different_person", "errors", "accuracy_vs_api"}
    assert payload["metadata"]["total_comparisons"] == 2
    assert len(payload["comparisons"]) == 2
    for c in payload["comparisons"]:
        assert set(c) == {"fileName", "event", "camera", "eventId",
                          "approve", "match_status", "branch_id"}
    first, second = payload["comparisons"]
    # entryEventIds[0] populates the event fields
    assert first == {"fileName": "f.jpg", "event": "entry", "camera": "c1",
                     "eventId": "ev-7", "approve": True,
                     "match_status": "SAME", "branch_id": "b1"}
    # no entry events: eventId falls back to the string event_id
    assert second["eventId"] == "ev-str-fallback"
    assert second["fileName"] == "" and second["camera"] == ""


def test_comparison_log_file(tmp_path):
    """The dedicated face_comparison.log handler writes comparison lines
    (compare_face_from_api.py:58-61)."""
    import logging as _logging
    from scrfd_arcface_facerecognition_tpu.apps import verification as v

    log_path = tmp_path / "face_comparison.log"
    store = FakeImageStore()
    store.add("http://x/p1.jpg", 1, 0)
    store.add("http://x/p2.jpg", 1, 1)
    fc = FaceComparison(config=DEFAULT_CONFIG, app=FakeFaceAnalysis(),
                        image_loader=store.loader, log_file=str(log_path))
    try:
        fc.process_face_comparisons([
            {"comparison_id": "c1", "event_id": None, "branch_id": None,
             "created_at": None, "customer_info": [], "matched_info": [],
             "approve": True, "image1_url": "http://x/p1.jpg",
             "image2_url": "http://x/p2.jpg", "raw_data": {}}])
        assert log_path.exists()
        text = log_path.read_text()
        assert "Comparison c1" in text and "Processed 1 comparisons" in text
    finally:
        for h in list(v.logger.handlers):
            if isinstance(h, _logging.FileHandler):
                v.logger.removeHandler(h)
                h.close()


def test_comparison_log_single_handler(tmp_path):
    """Re-enabling with a different path REPLACES the handler — instances
    with different log_file values must not duplicate lines into stale
    files."""
    import logging as _logging
    from scrfd_arcface_facerecognition_tpu.apps import verification as v

    a, b = tmp_path / "a.log", tmp_path / "b.log"
    try:
        v.enable_comparison_log(str(a))
        v.enable_comparison_log(str(b))
        ours = [h for h in v.logger.handlers
                if getattr(h, "name", None) == v._COMPARISON_HANDLER]
        assert len(ours) == 1
        assert ours[0].baseFilename.endswith("b.log")
        v.logger.info("only-into-b")
        assert "only-into-b" in b.read_text()
        assert not a.exists() or "only-into-b" not in a.read_text()
        # same path again: handler is kept, not re-added
        v.enable_comparison_log(str(b))
        assert len([h for h in v.logger.handlers
                    if getattr(h, "name", None) == v._COMPARISON_HANDLER]) == 1
    finally:
        for h in list(v.logger.handlers):
            if isinstance(h, _logging.FileHandler):
                v.logger.removeHandler(h)
                h.close()

def test_transform_records_tolerates_non_dict_entry_events():
    from scrfd_arcface_facerecognition_tpu.apps.verification import (
        build_comparison_results_json)

    records = FaceComparison.transform_records([
        {"id": "v1", "image": "http://i1", "refImage": "http://r1",
         "entryEventIds": ["bare-string-event"]}])
    assert len(records) == 1 and records[0]["event_id"] is None
    payload = build_comparison_results_json({
        "results": [{"comparison_id": "v1", "event_id": "fallback-id",
                     "raw_data": {"entryEventIds": ["bare-string-event"]}}]})
    assert payload["comparisons"][0]["eventId"] == "fallback-id"
