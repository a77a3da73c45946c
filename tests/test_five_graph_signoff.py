"""All-five-graph release sign-off machinery (tools/verify_release.py).

Full-scale stand-ins of every released file (SURVEY.md §2.4) are exported
to real ONNX bytes and pushed through BOTH load paths — the graph executor
(models/onnx_exec.py) and the ordered Flax importer (models/onnx_import.py)
— against the torch oracle; plus the full end-to-end pipeline comparison
against the reference-replica oracle (tests/e2e_oracle.py) on real JPEGs.
This is the zero-egress proxy for the real-weight sign-off: with released
files present, `python tools/verify_release.py --weights ./weights` runs
the same checks on the real bytes.
"""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _vr():
    if _TOOLS not in sys.path:
        sys.path.insert(0, _TOOLS)
    import verify_release as vr

    return vr


def _images(n):
    vr = _vr()
    imgs = vr.load_images("/root/reference/image_cache", n)
    if not imgs:
        pytest.skip("reference image_cache not available")
    return imgs


@pytest.mark.parametrize("name", ["det_500m", "det_2.5g", "det_10g",
                                  "w600k_mbf", "w600k_r50"])
def test_graph_parity_both_paths(name, tmp_path):
    """Executor and importer each reproduce the torch stand-in's forward
    at full scale (the det raw-output / embedding-cosine budgets of
    BASELINE.json)."""
    vr = _vr()
    imgs = _images(2)
    path, tm, mode = vr.resolve_graph(name, None, str(tmp_path))
    assert mode == "standin"
    oracle_fwd = vr.torch_forward(tm, name.startswith("det"))
    w = vr.graph_parity(name, path, oracle_fwd, imgs)
    if name.startswith("det"):
        assert w["exec_diff"] < vr.DET_RAW_BUDGET, w
        assert w["imp_diff"] < vr.DET_RAW_BUDGET, w
    else:
        assert w["exec_cos"] > 1 - vr.COS_BUDGET, w
        assert w["imp_cos"] > 1 - vr.COS_BUDGET, w


def test_e2e_pipeline_matches_reference_replica(tmp_path):
    """detect -> decode -> NMS -> max_num -> umeyama -> warp -> embed -> L2
    -> cosine, FacePipeline vs the numpy/cv2/torch replica, on real JPEGs
    (det_500m + w600k_mbf pairing keeps the CPU run affordable)."""
    vr = _vr()
    imgs = _images(3)
    det_path, det_tm, _ = vr.resolve_graph("det_500m", None, str(tmp_path))
    rec_path, rec_tm, _ = vr.resolve_graph("w600k_mbf", None, str(tmp_path))
    w = vr.e2e_parity(
        "det_500m", "w600k_mbf", det_path, rec_path,
        vr.torch_forward(det_tm, True), vr.torch_forward(rec_tm, False),
        imgs)
    assert w["count_mismatch"] == 0, w
    assert w["n_faces"] > 0, w
    assert w["box"] < vr.BOX_BUDGET, w
    assert w["kps"] < vr.KPS_BUDGET, w
    assert w["score"] < vr.SCORE_BUDGET, w
    assert w["cos"] > 1 - vr.COS_BUDGET, w
    assert w["simdiff"] < vr.COS_BUDGET, w
