"""Static-shape NMS vs the greedy numpy oracle."""
import numpy as np
import jax.numpy as jnp

from scrfd_arcface_facerecognition_tpu import ops
from oracles import np_nms_keep


def _random_dets(rng, n, wh=640):
    x1 = rng.uniform(0, wh - 60, size=n)
    y1 = rng.uniform(0, wh - 60, size=n)
    w = rng.uniform(10, 120, size=n)
    h = rng.uniform(10, 120, size=n)
    scores = rng.uniform(0.3, 1.0, size=n)
    dets = np.stack([x1, y1, x1 + w, y1 + h, scores], axis=1).astype(np.float32)
    # sort score-desc, as the pipeline does before NMS
    return dets[np.argsort(-dets[:, 4])]


def test_nms_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(10):
        dets = _random_dets(rng, 64)
        keep_oracle = sorted(np_nms_keep(dets, 0.4))
        mask = np.asarray(ops.nms_mask(jnp.asarray(dets[:, :4]), 0.4))
        keep_got = sorted(np.nonzero(mask)[0].tolist())
        assert keep_got == keep_oracle, f"trial {trial}"


def test_nms_overlapping_cluster():
    # Heavily overlapping boxes: only the top-scoring survives.
    base = np.array([100.0, 100.0, 200.0, 200.0])
    dets = np.stack([
        np.concatenate([base + i, [1.0 - 0.1 * i]]) for i in range(5)
    ]).astype(np.float32)
    mask = np.asarray(ops.nms_mask(jnp.asarray(dets[:, :4]), 0.4))
    assert mask.tolist() == [True, False, False, False, False]


def test_nms_respects_valid_mask():
    rng = np.random.default_rng(1)
    dets = _random_dets(rng, 32)
    valid = np.ones(32, dtype=bool)
    valid[20:] = False
    mask = np.asarray(ops.nms_mask(jnp.asarray(dets[:, :4]), 0.4, jnp.asarray(valid)))
    assert not mask[20:].any()
    # invalid boxes must not suppress valid ones
    keep_oracle = sorted(np_nms_keep(dets[:20], 0.4))
    assert sorted(np.nonzero(mask[:20])[0].tolist()) == keep_oracle


def test_compact_by_mask():
    mask = jnp.asarray([False, True, False, True, True, False])
    vals = jnp.arange(6.0)[:, None] * jnp.ones((1, 5))
    count, out_mask, out_vals = ops.nms.compact_by_mask(mask, vals, max_out=4)
    assert int(count) == 3
    assert np.asarray(out_mask).tolist() == [True, True, True, False]
    np.testing.assert_array_equal(np.asarray(out_vals)[:3, 0], [1.0, 3.0, 4.0])


def test_select_top_faces_by_area():
    dets = np.array([
        [0, 0, 10, 10, 0.9],      # area 100
        [0, 0, 50, 50, 0.8],      # area 2500
        [0, 0, 30, 30, 0.7],      # area 900
        [0, 0, 100, 100, 0.6],    # area 10000 (largest)
    ], dtype=np.float32)
    kps = np.zeros((4, 5, 2), dtype=np.float32)
    valid = np.ones(4, dtype=bool)
    det_out, _, mask_out = ops.select_top_faces(
        jnp.asarray(dets), jnp.asarray(kps), jnp.asarray(valid), max_num=2)
    got_scores = sorted(np.asarray(det_out)[:, 4].tolist())
    assert got_scores == [0.6000000238418579, 0.800000011920929]  # two largest areas
    assert np.asarray(mask_out).all()


def test_select_top_faces_center_metric():
    dets = np.array([
        [300, 220, 340, 260, 0.9],   # centered, area 1600
        [0, 0, 45, 45, 0.8],         # corner, slightly larger area 2025
    ], dtype=np.float32)
    kps = np.zeros((2, 5, 2), dtype=np.float32)
    valid = np.ones(2, dtype=bool)
    det_out, _, _ = ops.select_top_faces(
        jnp.asarray(dets), jnp.asarray(kps), jnp.asarray(valid),
        max_num=1, metric="default", frame_hw=(480, 640))
    # center-weighted metric prefers the centered box despite smaller area
    assert float(det_out[0, 4]) == np.float32(0.9)


def test_blocked_nms_matches_sequential():
    """nms_mask_blocked must equal nms_mask bit-for-bit (property test)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(42)
    for trial in range(20):
        n = 256
        dets = _random_dets(rng, n, wh=400)  # dense -> heavy overlap
        valid = rng.random(n) > 0.1
        # valid pattern must be applied to score-sorted order consistently
        m1 = np.asarray(ops.nms_mask(jnp.asarray(dets[:, :4]), 0.4,
                                     jnp.asarray(valid)))
        m2 = np.asarray(ops.nms_mask_blocked(jnp.asarray(dets[:, :4]), 0.4,
                                             jnp.asarray(valid)))
        np.testing.assert_array_equal(m1, m2, err_msg=f"trial {trial}")


def test_blocked_nms_non_multiple_sizes():
    """Non-block-multiple slates pad internally and match nms_mask exactly."""
    rng = np.random.default_rng(7)
    for n in (100, 33, 5, 31, 257):
        dets = _random_dets(rng, n, wh=400)
        m1 = np.asarray(ops.nms_mask(jnp.asarray(dets[:, :4]), 0.4))
        m2 = np.asarray(ops.nms_mask_blocked(jnp.asarray(dets[:, :4]), 0.4))
        assert m2.shape == (n,)
        np.testing.assert_array_equal(m1, m2, err_msg=f"n={n}")
        # with an explicit validity mask too
        valid = rng.random(n) > 0.2
        m1 = np.asarray(ops.nms_mask(jnp.asarray(dets[:, :4]), 0.4,
                                     jnp.asarray(valid)))
        m2 = np.asarray(ops.nms_mask_blocked(jnp.asarray(dets[:, :4]), 0.4,
                                             jnp.asarray(valid)))
        np.testing.assert_array_equal(m1, m2, err_msg=f"n={n} masked")
