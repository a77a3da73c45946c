"""Detector pipeline vs a numpy oracle of the reference detect() semantics.

Uses a fake head (fixed per-stride output tensors) so the test isolates the
pipeline's letterbox-geometry/decode/NMS/ordering/scaling logic from model
weights: both our detect_batch and the numpy oracle consume the exact same
raw outputs, so results must agree exactly (modulo padding).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from scrfd_arcface_facerecognition_tpu import ops
from scrfd_arcface_facerecognition_tpu.pipeline import detector as det_mod
from oracles import np_distance2bbox, np_distance2kps, np_anchor_centers, \
    np_nms_keep, np_letterbox_geometry

INPUT = (640, 640)
STRIDES = (8, 16, 32)


def _fake_outputs(rng, n_hot=30, seed_boxes=None):
    """Random per-stride outputs with a handful of confident anchors."""
    outs = {"scores": [], "bboxes": [], "kps": []}
    for s in STRIDES:
        n = (INPUT[0] // s) * (INPUT[1] // s) * 2
        scores = rng.uniform(0.0, 0.2, size=(1, n, 1)).astype(np.float32)
        outs["scores"].append(scores)
        outs["bboxes"].append(rng.uniform(0.5, 4.0, size=(1, n, 4)).astype(np.float32))
        outs["kps"].append(rng.uniform(-2.0, 2.0, size=(1, n, 10)).astype(np.float32))
    # promote n_hot anchors on stride 8 to confident detections
    hot = rng.choice(80 * 80 * 2, size=n_hot, replace=False)
    outs["scores"][0][0, hot, 0] = rng.uniform(0.55, 0.99, size=n_hot)
    return outs


def _oracle_detect(outputs, frame_hw, conf_thres, iou_thres, max_num=0,
                   metric="max"):
    """Reference SCRFD.detect semantics (scrfd.py:70-178) from raw outputs."""
    new_h, new_w, det_scale = np_letterbox_geometry(frame_hw, INPUT)
    scores_list, bboxes_list, kpss_list = [], [], []
    for idx, stride in enumerate(STRIDES):
        scores = outputs["scores"][idx][0]
        bbox_preds = outputs["bboxes"][idx][0] * stride
        kps_preds = outputs["kps"][idx][0] * stride
        centers = np_anchor_centers(INPUT[0] // stride, INPUT[1] // stride, stride, 2)
        pos = np.where(scores[:, 0] >= conf_thres)[0]
        boxes = np_distance2bbox(centers, bbox_preds)
        kps = np_distance2kps(centers, kps_preds).reshape(-1, 5, 2)
        scores_list.append(scores[pos])
        bboxes_list.append(boxes[pos])
        kpss_list.append(kps[pos])
    scores = np.vstack(scores_list)
    order = scores.ravel().argsort()[::-1]
    bboxes = np.vstack(bboxes_list) / det_scale
    kpss = np.vstack(kpss_list) / det_scale
    pre_det = np.hstack([bboxes, scores]).astype(np.float32)[order]
    kpss = kpss[order]
    keep = np_nms_keep(pre_det, iou_thres)
    det, kpss = pre_det[keep], kpss[keep]
    if 0 < max_num < det.shape[0]:
        area = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
        cy, cx = frame_hw[0] // 2, frame_hw[1] // 2
        off = np.vstack([(det[:, 0] + det[:, 2]) / 2 - cx,
                         (det[:, 1] + det[:, 3]) / 2 - cy])
        dist2 = (off ** 2).sum(0)
        values = area if metric == "max" else area - dist2 * 2.0
        bindex = np.argsort(values)[::-1][:max_num]
        det, kpss = det[bindex], kpss[bindex]
    return det, kpss


def _run_detect_batch(outputs, frame_hw, conf, iou, max_num=0, metric="max"):
    plan = ops.letterbox_plan(frame_hw, INPUT)
    fake_apply = lambda variables, x: {
        k: [jnp.asarray(o) for o in v] for k, v in outputs.items()}
    frames = jnp.zeros((1, *frame_hw, 3), jnp.uint8)
    return det_mod.detect_batch(
        fake_apply, None, frames, plan=plan, conf_thres=conf, iou_thres=iou,
        pre_nms=256, max_det=64, max_num=max_num, metric=metric)


@pytest.mark.parametrize("frame_hw", [(1080, 1920), (640, 640), (720, 480)])
def test_detect_matches_oracle(frame_hw):
    rng = np.random.default_rng(0)
    outputs = _fake_outputs(rng)
    want_det, want_kps = _oracle_detect(outputs, frame_hw, 0.5, 0.4)
    got = _run_detect_batch(outputs, frame_hw, 0.5, 0.4)
    n = int(got.count[0])
    assert n == len(want_det)
    np.testing.assert_allclose(np.asarray(got.boxes[0][:n]), want_det[:, :4],
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got.scores[0][:n]), want_det[:, 4],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.kps[0][:n]), want_kps,
                               rtol=1e-4, atol=1e-2)
    assert not np.asarray(got.valid[0][n:]).any()


def test_detect_max_num_selection():
    rng = np.random.default_rng(1)
    outputs = _fake_outputs(rng, n_hot=40)
    for metric in ("max", "default"):
        want_det, want_kps = _oracle_detect(outputs, (1080, 1920), 0.5, 0.4,
                                            max_num=5, metric=metric)
        got = _run_detect_batch(outputs, (1080, 1920), 0.5, 0.4,
                                max_num=5, metric=metric)
        n = int(got.count[0])
        got_det = np.asarray(got.boxes[0])[np.asarray(got.valid[0])]
        # selection metric ordering can differ; compare as sets of rows
        assert got_det.shape[0] == want_det.shape[0] <= 5
        got_sorted = got_det[np.lexsort(got_det.T)]
        want_sorted = want_det[:, :4][np.lexsort(want_det[:, :4].T)]
        np.testing.assert_allclose(got_sorted, want_sorted, rtol=1e-4, atol=1e-2)


def test_max_num_above_count_preserves_score_order():
    """Reference semantics (scrfd.py:159): the max_num area-reordering
    applies only when MORE than max_num faces survive NMS; with fewer,
    rows stay score-descending. The static path used to reorder always."""
    rng = np.random.default_rng(7)
    outputs = _fake_outputs(rng, n_hot=30)
    survivors = len(_oracle_detect(outputs, (1080, 1920), 0.5, 0.4)[0])
    # a max_num the survivors do NOT exceed: selection must be skipped
    max_num = survivors + 3
    assert max_num < 64                       # stays on the selection path
    want_det, _ = _oracle_detect(outputs, (1080, 1920), 0.5, 0.4,
                                 max_num=max_num)
    got = _run_detect_batch(outputs, (1080, 1920), 0.5, 0.4,
                            max_num=max_num)
    n = int(got.count[0])
    assert n == survivors == len(want_det)
    # ORDER must match the oracle exactly (score-descending, no reorder)
    np.testing.assert_allclose(np.asarray(got.boxes[0][:n]),
                               want_det[:, :4], rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got.scores[0][:n]),
                               want_det[:, 4], rtol=1e-5, atol=1e-6)
    assert np.all(np.diff(np.asarray(got.scores[0][:n])) <= 1e-6)


def test_detect_batch_carries_plan_det_scale():
    """Detections.det_scale is populated on the static path too — the
    Pallas embed stage must reuse detect's EXACT scale, not re-derive it
    (tight-trimmed canvases can flip the letterbox binding dimension)."""
    rng = np.random.default_rng(8)
    outputs = _fake_outputs(rng, n_hot=5)
    plan = ops.letterbox_plan((1080, 1920), INPUT)
    got = _run_detect_batch(outputs, (1080, 1920), 0.5, 0.4)
    assert got.det_scale is not None
    np.testing.assert_allclose(np.asarray(got.det_scale),
                               np.full(1, plan.det_scale, np.float32))


def test_detect_no_faces():
    rng = np.random.default_rng(2)
    outputs = _fake_outputs(rng, n_hot=0)
    got = _run_detect_batch(outputs, (480, 640), 0.5, 0.4)
    assert int(got.count[0]) == 0
    assert not np.asarray(got.valid).any()


def test_detector_end_to_end_smoke():
    """Real (random-weight) det_500m over a real frame: shape + determinism."""
    d = det_mod.Detector("det_500m", conf_thres=0.003, pre_nms=64, max_det=8)
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    det1, kps1 = d.detect(frame)
    det2, kps2 = d.detect(frame)
    np.testing.assert_array_equal(det1, det2)
    assert det1.shape[1] == 5
    if len(det1):
        assert kps1.shape == (len(det1), 5, 2)
        # scores sorted descending, reference ordering contract
        assert np.all(np.diff(det1[:, 4]) <= 1e-6)


def test_tight_canvas_agrees_with_square():
    """Tight-trimmed letterbox: same det_scale/geometry as the square
    canvas; content-region outputs agree within a bounded drift.

    Exactness is impossible: the reference normalizes the zero-pixel pad
    band to the CONSTANT (0-127.5)/128 = -0.996, so trimming it swaps a
    -0.996 band for conv zero-padding and a halo propagates inward at the
    coarse strides. This test bounds that drift (scores <= 2e-3 raw,
    boxes/kps <= 0.5 stride-units) — negligible at detection level; runs
    needing exactness pass tight_canvas=False (see
    ops.tight_letterbox_plan)."""
    import jax
    from scrfd_arcface_facerecognition_tpu.models.scrfd import (
        SCRFDConfig, SCRFDNet)

    cfg = SCRFDConfig("tiny", 8, (1, 1, 1, 1), (8, 8, 16, 16),
                      neck_filters=8, head_stacks=0, head_filters=16)
    model = SCRFDNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (1, 270, 480, 3),
                                      dtype=np.uint8))

    full = ops.letterbox_plan((270, 480), (128, 128))
    tight = ops.tight_letterbox_plan((270, 480), (128, 128), multiple=32)
    assert tight.det_scale == full.det_scale
    assert tight.model_hw == (96, 128)     # 270/480 * 128 = 72 -> pad to 96
    cf = np.asarray(ops.letterbox(frames, full))
    ct = np.asarray(ops.letterbox(frames, tight))
    np.testing.assert_array_equal(ct, cf[:, :96])   # same canvas content

    of = model.apply(variables, ops.normalize_image(
        jnp.asarray(cf), ops.SCRFD_MEAN, ops.SCRFD_STD))
    ot = model.apply(variables, ops.normalize_image(
        jnp.asarray(ct), ops.SCRFD_MEAN, ops.SCRFD_STD))

    for li, s in enumerate((8, 16, 32)):
        rows_c = 72 // s
        # score tolerance reflects the pad-boundary halo: the ResNetV1e
        # deep stem + maxpool widened the receptive field, so content rows
        # near the trimmed pad band see slightly different zero context
        # (measured drift ~6e-3 at stride 32 with random weights)
        for kind, c, tol in (("scores", 1, 1e-2), ("bboxes", 4, 1.0),
                             ("kps", 10, 1.0)):
            f = np.asarray(of[kind][li]).reshape(1, 128 // s, 128 // s,
                                                 2 * c)[:, :rows_c]
            t = np.asarray(ot[kind][li]).reshape(1, 96 // s, 128 // s,
                                                 2 * c)[:, :rows_c]
            assert np.abs(f - t).max() <= tol, (kind, s, np.abs(f - t).max())


def test_pipeline_inherits_supplied_detector_config():
    """A user-supplied detector is the single source of its config: the
    pipeline must take pre_nms/max_det from it (it already takes
    conf/iou), or crowd frames get silently truncated to the pipeline
    defaults."""
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline

    d = det_mod.Detector("det_500m", pre_nms=512, max_det=64)
    pipe = FacePipeline(detector=d, rec_variant="w600k_mbf")
    assert pipe.max_det == 64 and pipe.pre_nms == 512


def test_detector_rejects_variables_plus_onnx_path():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not both"):
        det_mod.Detector("det_500m", variables={"params": {}},
                         onnx_path="/nonexistent.onnx")
