"""SCRFD detector training: assignment correctness, loss behavior, and the
sharded train step on the virtual mesh (framework-completeness item — the
reference ships inference-only graphs and has no training at all)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scrfd_arcface_facerecognition_tpu.models.scrfd import SCRFDConfig, SCRFDNet
from scrfd_arcface_facerecognition_tpu.parallel import make_mesh
from scrfd_arcface_facerecognition_tpu.train import (
    SCRFDTrainer, SCRFDLossConfig, scrfd_loss, atss_assign, diou_loss,
    quality_focal_loss, pairwise_iou, synthetic_detection_batch)
from scrfd_arcface_facerecognition_tpu.train.scrfd_train import _anchor_boxes


TINY = SCRFDConfig("tiny", 8, (1, 1, 1, 1), (8, 8, 16, 16),
                   neck_filters=8, head_stacks=1, head_filters=16)
CFG64 = SCRFDLossConfig(input_size=(64, 64))


def test_pairwise_iou_basics():
    a = jnp.asarray([[0., 0., 10., 10.]])
    b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.],
                     [20., 20., 30., 30.]])
    iou = np.asarray(pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25. / 175., 0.0], atol=1e-6)


def test_diou_loss_zero_for_identical_boxes():
    b = jnp.asarray([[2., 3., 20., 30.]])
    assert float(diou_loss(b, b)[0]) < 1e-6
    # disjoint boxes: loss > 1 (negative DIoU term)
    far = jnp.asarray([[100., 100., 120., 120.]])
    assert float(diou_loss(b, far)[0]) > 1.0


def test_qfl_zero_when_perfect():
    p = jnp.asarray([0.999999, 1e-6])
    q = jnp.asarray([1.0, 0.0])
    assert float(jnp.sum(quality_focal_loss(p, q))) < 1e-4
    # confident wrong prediction is heavily penalized
    assert float(quality_focal_loss(jnp.asarray([0.9]),
                                    jnp.asarray([0.0]))[0]) > 1.0


def test_atss_assigns_anchors_inside_gt():
    centers_np, aboxes_np, level_sizes = _anchor_boxes(CFG64)
    gt = jnp.asarray([[8., 8., 40., 40.], [0., 0., 0., 0.]])
    valid = jnp.asarray([True, False])
    assigned, aiou = atss_assign(gt, valid, jnp.asarray(centers_np),
                                 jnp.asarray(aboxes_np), level_sizes)
    assigned = np.asarray(assigned)
    pos = assigned >= 0
    assert pos.sum() > 0, "gt must attract at least one anchor"
    assert set(np.unique(assigned[pos])) == {0}, "invalid gt must get none"
    # every positive anchor's center lies inside the gt box
    c = centers_np[pos]
    assert ((c[:, 0] >= 8) & (c[:, 0] <= 40)
            & (c[:, 1] >= 8) & (c[:, 1] <= 40)).all()
    assert (np.asarray(aiou)[pos] > 0).all()


def test_atss_no_valid_gt_assigns_nothing():
    centers_np, aboxes_np, level_sizes = _anchor_boxes(CFG64)
    gt = jnp.zeros((3, 4))
    valid = jnp.zeros((3,), bool)
    assigned, _ = atss_assign(gt, valid, jnp.asarray(centers_np),
                              jnp.asarray(aboxes_np), level_sizes)
    assert (np.asarray(assigned) == -1).all()


def test_loss_decreases_on_overfit():
    """A few SGD steps on one tiny batch must reduce the loss (the whole
    assignment/loss/grad chain is differentiable and sane)."""
    mesh = make_mesh((1,), ("data",))
    model = SCRFDNet(TINY)
    trainer = SCRFDTrainer(model=model, mesh=mesh, loss_cfg=CFG64,
                           learning_rate=0.01)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images, gt_boxes, gt_kps, gt_valid = synthetic_detection_batch(
        rng, batch=2, input_size=(64, 64), max_gt=3)
    losses = []
    for _ in range(8):
        state, loss, metrics = trainer.train_step(
            state, images, gt_boxes, gt_kps, gt_valid)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert int(metrics["n_pos"]) > 0
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_sharded_train_step_on_virtual_mesh():
    """DP over the full 8-device mesh: one step, finite loss, sharded batch."""
    mesh = make_mesh((8,), ("data",))
    model = SCRFDNet(TINY)
    trainer = SCRFDTrainer(model=model, mesh=mesh, loss_cfg=CFG64)
    state = trainer.init_state(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    images, gt_boxes, gt_kps, gt_valid = synthetic_detection_batch(
        rng, batch=8, input_size=(64, 64), max_gt=2)
    state, loss, _ = trainer.train_step(state, images, gt_boxes, gt_kps,
                                        gt_valid)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


def test_parse_wider_annotations(tmp_path):
    from scrfd_arcface_facerecognition_tpu.train import (
        parse_wider_annotations)

    label = tmp_path / "label.txt"
    label.write_text(
        "# img/a.jpg\n"
        "10 20 30 40 11.0 21.0 0.0 15.0 21.0 0.0 13.0 25.0 0.0 "
        "11.5 30.0 0.0 14.5 30.0 0.0 0.8\n"
        "50 60 10 10 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 "
        "-1.0 -1.0 -1.0 -1.0 -1.0 -1.0 0.2\n"
        "# img/b.jpg\n"
        "5 5 20 20\n")
    anns = parse_wider_annotations(str(label), images_root=str(tmp_path))
    assert len(anns) == 2
    a = anns[0]
    np.testing.assert_allclose(a.boxes[0], [10, 20, 40, 60])
    assert a.kps_valid.tolist() == [True, False]
    np.testing.assert_allclose(a.kps[0, 0], [11.0, 21.0])
    assert np.isnan(anns[0].kps[1]).all()
    assert anns[1].boxes.shape == (1, 4) and len(anns[1].kps_valid) == 1


def test_batches_and_letterbox_gt_transform(tmp_path):
    from scrfd_arcface_facerecognition_tpu.train import (
        Annotation, batches_from_annotations)

    rng = np.random.default_rng(0)
    anns = [Annotation(path=f"mem://{i}",
                       boxes=np.asarray([[64., 64., 192., 192.]], np.float32),
                       kps=np.full((1, 5, 2), 100.0, np.float32),
                       kps_valid=np.ones((1,), bool))
            for i in range(4)]
    imgs = {f"mem://{i}": rng.integers(0, 255, (320, 320, 3), np.uint8)
            for i in range(4)}
    batches = list(batches_from_annotations(
        anns, batch=2, input_size=(64, 64), max_gt=3,
        image_loader=lambda p: imgs[p]))
    assert len(batches) == 2
    images, gb, gk, gv, gkv = batches[0]
    assert images.shape == (2, 64, 64, 3)
    # scale 64/320 = 0.2: the 64..192 box lands at 12.8..38.4
    np.testing.assert_allclose(gb[0, 0], [12.8, 12.8, 38.4, 38.4], atol=1e-4)
    np.testing.assert_allclose(gk[0, 0, 0], [20.0, 20.0], atol=1e-4)
    assert gv[0].tolist() == [True, False, False]
    assert gkv[0].tolist() == [True, False, False]


def test_kps_loss_masked_for_unlabeled_faces():
    """A face with kps_valid False must contribute zero landmark loss."""
    from scrfd_arcface_facerecognition_tpu.train.scrfd_train import (
        scrfd_loss, _anchor_boxes)
    import jax

    # fake head outputs: zeros everywhere
    h, w = CFG64.input_size
    outs = {"scores": [], "bboxes": [], "kps": []}
    for s in CFG64.strides:
        n = (h // s) * (w // s) * CFG64.num_anchors
        outs["scores"].append(jnp.full((1, n, 1), 0.01))
        outs["bboxes"].append(jnp.ones((1, n, 4)))
        outs["kps"].append(jnp.full((1, n, 10), 5.0))  # way-off landmarks
    gt_b = jnp.asarray([[[8., 8., 40., 40.]]])
    gt_k = jnp.asarray(np.zeros((1, 1, 5, 2), np.float32))
    gt_v = jnp.asarray([[True]])
    _, m_on = scrfd_loss(outs, gt_b, gt_k, gt_v, CFG64,
                         gt_kps_valid=jnp.asarray([[True]]))
    _, m_off = scrfd_loss(outs, gt_b, gt_k, gt_v, CFG64,
                          gt_kps_valid=jnp.asarray([[False]]))
    assert float(m_on["kps"]) > 0.0
    assert float(m_off["kps"]) == 0.0
    # cls/box supervision unaffected by the kps mask
    assert float(m_on["box"]) == float(m_off["box"])


def test_average_precision_perfect_and_misses():
    from scrfd_arcface_facerecognition_tpu.train import average_precision

    gt = [np.asarray([[0., 0., 10., 10.], [20., 20., 30., 30.]])]
    perfect = average_precision([gt[0]], [np.asarray([0.9, 0.8])], gt)
    assert abs(perfect - 1.0) < 1e-6
    # one hit one miss + a false positive
    pb = [np.asarray([[0., 0., 10., 10.], [50., 50., 60., 60.]])]
    ps = [np.asarray([0.9, 0.8])]
    ap = average_precision(pb, ps, gt)
    assert 0.2 < ap < 0.8


def test_evaluate_detector_runs_end_to_end(tmp_path):
    """Whole loop: tiny detector over synthetic annotated images -> finite
    AP (random weights: value is meaningless, machinery must work)."""
    import cv2
    from scrfd_arcface_facerecognition_tpu.pipeline import Detector
    from scrfd_arcface_facerecognition_tpu.train import (
        Annotation, evaluate_detector)

    rng = np.random.default_rng(0)
    anns = []
    for i in range(2):
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (96, 96, 3), np.uint8))
        anns.append(Annotation(path=p,
                               boxes=np.asarray([[10., 10., 50., 50.]],
                                                np.float32),
                               kps=np.zeros((1, 5, 2), np.float32),
                               kps_valid=np.ones((1,), bool)))
    det = Detector("det_500m", input_size=(64, 64), pre_nms=32, max_det=8,
                   seed=0)
    out = evaluate_detector(det, anns, conf_thres=0.01)
    assert out["images"] == 2 and 0.0 <= out["ap"] <= 1.0
