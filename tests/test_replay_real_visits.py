"""Replay the reference's committed real workload through the real stack:
visit-cluster.json visits resolved against the repo's image_cache (md5(url)
naming), real SCRFD+ArcFace models (random weights — machinery, not
accuracy), full decide/persist path. tools/replay_visits.py is the
full-scale driver; this test runs a small slice."""
import json
import os

import numpy as np
import pytest

REF = "/root/reference"


@pytest.mark.skipif(not os.path.exists(os.path.join(REF, "visit-cluster.json")),
                    reason="reference sample not mounted")
def test_replay_reference_visits(tmp_path, monkeypatch):
    monkeypatch.syspath_prepend(
        os.path.join(os.path.dirname(__file__), "..", "tools"))
    from replay_visits import cached_loader
    from scrfd_arcface_facerecognition_tpu.apps.clustering import (
        SmartFaceEngine)
    from scrfd_arcface_facerecognition_tpu.apps.face_analysis import (
        FaceAnalysis)

    monkeypatch.chdir(tmp_path)
    app = FaceAnalysis(det_variant="det_500m", rec_variant="w600k_mbf",
                       seed=0, max_det=8)
    app.prepare(det_thresh=0.3)
    engine = SmartFaceEngine(
        database_path=str(tmp_path / "replay.db"), app=app,
        image_loader=cached_loader(os.path.join(REF, "image_cache")),
        results_dir=str(tmp_path / "results"))

    data = json.load(open(os.path.join(REF, "visit-cluster.json")))
    results = engine.process_visit_data_from_json(data, max_visits=12,
                                                  save_images=False)

    handled = sum(results[k] for k in
                  ("processed", "no_faces", "low_quality", "download_failed",
                   "duplicate_faces"))
    assert handled == 12, results
    # cache coverage is ~77%: some visits must resolve, some must miss
    assert results["download_failed"] >= 1
    assert results["processed"] + results["no_faces"] \
        + results["low_quality"] >= 1
    # persistence side effects: every processed visit landed in SQLite,
    # decisions split between recognized and new persons
    assert results["processed"] == (results["recognized"]
                                    + results["new_persons"])
    stats = engine.get_web_stats()
    assert stats["total_persons"] == results["new_persons"]
    if results["processed"]:
        out = list((tmp_path / "results").glob("clustering_results_*.json"))
        assert out, "clustering_results JSON must be written"
        payload = json.loads(out[0].read_text())
        assert payload["total_processed"] == results["processed"]
