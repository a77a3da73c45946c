"""Quality gates, side-face analysis, config system."""
import json
import types

import numpy as np

from scrfd_arcface_facerecognition_tpu.utils.config import (
    DEFAULT_CONFIG, load_config, load_api_config, deep_update)
from scrfd_arcface_facerecognition_tpu.apps import quality as Q


def _face(det_score=0.9, bbox=(100, 100, 200, 230), kps_spread=60.0):
    f = types.SimpleNamespace()
    f.det_score = det_score
    f.bbox = np.asarray(bbox, np.float32)
    cx, cy = (bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2
    s = kps_spread / 2
    f.kps = np.asarray([[cx - s, cy - s], [cx + s, cy - s], [cx, cy],
                        [cx - s, cy + s], [cx + s, cy + s]], np.float32)
    return f


def test_assess_face_quality_formula():
    cfg = DEFAULT_CONFIG
    f = _face(det_score=0.8, bbox=(0, 0, 100, 100), kps_spread=60)
    got = Q.assess_face_quality(f, cfg)
    det = 0.8
    size = min(1.0, 100 * 100 / cfg["face_quality"]["size_normalization"])
    blur = min(1.0, det * 1.2)
    pose = min(1.0, (60 + 60) / 100)
    light = min(1.0, det * 1.1)
    w = cfg["face_quality"]["weights"]
    want = (det * w["detection_score"] + size * w["size_score"]
            + blur * w["blur_score"] + pose * w["pose_score"]
            + light * w["lighting_score"])
    assert abs(got["overall"] - want) < 1e-6
    assert abs(got["size"] - size) < 1e-6
    assert abs(got["pose"] - pose) < 1e-6


def test_side_face_scoring_extreme_profile():
    cfg = DEFAULT_CONFIG
    # Tall narrow bbox (ratio 0.15 -> +4) + small area -> side face
    is_side, reason, score = Q.analyze_bbox_for_side_face(
        {"width": 15, "height": 100, "top": 200, "left": 200}, 0.9, cfg)
    assert is_side
    assert score >= cfg["side_face_detection"]["decision_threshold"]
    assert "Extreme profile" in reason


def test_side_face_normal_face_passes():
    cfg = DEFAULT_CONFIG
    is_side, reason, score = Q.analyze_bbox_for_side_face(
        {"width": 100, "height": 130, "top": 200, "left": 200}, 0.9, cfg)
    assert not is_side


def test_side_face_accumulates_scores():
    cfg = DEFAULT_CONFIG
    # wide (+2), small area 40*18=720 extremely small (+3) -> >= 4
    is_side, _, score = Q.analyze_bbox_for_side_face(
        {"width": 40, "height": 18, "top": 100, "left": 100}, 0.9, cfg)
    assert is_side and score >= 5


def test_is_side_face_uses_bbox_when_no_pose():
    cfg = DEFAULT_CONFIG
    f = _face(bbox=(200, 200, 215, 300))  # narrow profile
    assert Q.is_side_face(f, cfg)
    f2 = _face(bbox=(200, 200, 300, 330))
    assert not Q.is_side_face(f2, cfg)


def test_check_side_face_from_json_bbox():
    cfg = DEFAULT_CONFIG
    visit = {"entryEventIds": [{"box": {"width": 15, "height": 100,
                                        "top": 300, "left": 300}}]}
    is_side, reason, bbox = Q.check_side_face_from_json_bbox(visit, cfg)
    assert is_side and bbox is not None
    assert Q.check_side_face_from_json_bbox({}, cfg)[0] is False


def test_load_config_defaults_and_merge(tmp_path):
    assert load_config(str(tmp_path / "missing.json")) == DEFAULT_CONFIG
    p = tmp_path / "config.json"
    p.write_text(json.dumps({
        "face_recognition": {"similarity_threshold": 0.77},
        "extra_section": {"x": 1}}))
    cfg = load_config(str(p))
    assert cfg["face_recognition"]["similarity_threshold"] == 0.77
    assert cfg["face_recognition"]["grouping_threshold_file"] == 0.45
    assert cfg["extra_section"] == {"x": 1}


def test_reference_config_json_loads_cleanly():
    """Every key in the reference's config.json is representable."""
    cfg = load_config("/root/reference/config.json")
    assert cfg["face_detection"]["confidence_threshold"] == 0.6
    assert cfg["face_recognition"]["grouping_threshold_json"] == 0.55
    assert cfg["side_face_detection"]["decision_threshold"] == 4
    assert cfg["image_processing"]["max_workers"] == 4


def test_load_api_config(tmp_path):
    p = tmp_path / "api_config.txt"
    p.write_text("# comment\nAPI_URL=https://x.example/api?a=b=c\n\n"
                 "API_KEY = secret \nBADLINE\n")
    cfg = load_api_config(str(p))
    assert cfg == {"API_URL": "https://x.example/api?a=b=c",
                   "API_KEY": "secret"}
    assert load_api_config(str(tmp_path / "nope.txt")) == {}


def test_deep_update_no_mutation():
    base = {"a": {"b": 1, "c": 2}}
    out = deep_update(base, {"a": {"b": 9}})
    assert out == {"a": {"b": 9, "c": 2}}
    assert base["a"]["b"] == 1
