"""Pallas warp kernel vs the exact XLA warp (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scrfd_arcface_facerecognition_tpu import ops
from scrfd_arcface_facerecognition_tpu.ops import pallas_warp as pw
from scrfd_arcface_facerecognition_tpu.ops.warp import warp_affine_flat


def _matrices(specs):
    """specs: list of (scale, angle_rad, cx, cy) -> (F, 2, 3) src->dst M."""
    ms = []
    for s, ang, cx, cy in specs:
        # dst->src: sigma*R(phi) with center mapping; build src->dst = inverse
        sigma = 1.0 / s
        rot = np.array([[np.cos(ang), -np.sin(ang)],
                        [np.sin(ang), np.cos(ang)]]) / sigma
        t = np.array([55.5, 55.5]) - rot @ np.array([cx, cy])
        ms.append(np.concatenate([rot, t[:, None]], axis=1))
    return jnp.asarray(np.stack(ms).astype(np.float32))


def _run(frames, matrices, frame_idx):
    fh, fw = frames.shape[1:3]
    plan = ops.letterbox_plan((fh, fw), (640, 640))
    params = pw.prepare_warp_params(matrices, jnp.asarray(frame_idx),
                                    (fh, fw), plan.det_scale)
    planar = pw.planarize(frames)
    canvas = jnp.clip(jnp.round(ops.letterbox(frames, plan)), 0, 255
                      ).astype(jnp.uint8)
    canvas_planar = pw.planarize(canvas)
    crops = pw.warp_crops_pallas(planar, canvas_planar, params,
                                 interpret=True)
    return crops, params


def _xla_reference(frames, matrices, frame_idx):
    return warp_affine_flat(frames, matrices, jnp.asarray(frame_idx))


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    # smooth-ish content: resampling comparisons are meaningful
    base = rng.integers(0, 255, (2, 68, 120, 3)).astype(np.float32)
    import cv2
    big = np.stack([cv2.resize(b, (960, 540)) for b in base])
    return jnp.asarray(np.clip(big, 0, 255).astype(np.uint8))


def test_pure_scale_matches_exact(frames):
    """No rotation, level-0 crops: multi-pass == direct bilinear exactly
    (both are separable exact interpolation)."""
    specs = [(0.8, 0.0, 300.0, 270.0), (1.6, 0.0, 500.0, 200.0),
             (0.7, 0.0, 640.0, 300.0)]
    m = _matrices(specs)
    fidx = np.array([0, 1, 1], np.int32)
    got, params = _run(frames, m, fidx)
    assert not np.asarray(params.fallback).any()
    assert (np.asarray(params.iparams)[:, 1] == 0).all()  # all level 0
    want = np.asarray(_xla_reference(frames, m, fidx))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2)


def test_small_rotation_close_to_exact(frames):
    specs = [(0.8, 0.1, 300.0, 270.0), (1.2, -0.15, 500.0, 250.0)]
    m = _matrices(specs)
    fidx = np.array([0, 1], np.int32)
    got, params = _run(frames, m, fidx)
    assert not np.asarray(params.fallback).any()
    want = np.asarray(_xla_reference(frames, m, fidx))
    diff = np.abs(np.asarray(got) - want)
    # multi-pass resampling: small interior differences only
    assert np.median(diff) < 1.0
    assert np.mean(diff) < 2.0


def test_border_zero(frames):
    """Crop sampling beyond the frame edge must be zero outside."""
    specs = [(1.0, 0.0, 20.0, 20.0)]  # near top-left corner
    m = _matrices(specs)
    got, params = _run(frames, m, np.array([0], np.int32))
    want = np.asarray(_xla_reference(frames, m, np.array([0], np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2)
    assert np.asarray(got)[0, 0, 0].max() == 0.0  # beyond-edge corner = 0


def test_large_face_uses_canvas_level(frames):
    specs = [(0.4, 0.0, 480.0, 270.0)]  # ~280px face -> level 1 (det 2/3)
    m = _matrices(specs)
    got, params = _run(frames, m, np.array([0], np.int32))
    assert int(np.asarray(params.iparams)[0, 1]) == 1
    assert not np.asarray(params.fallback).any()
    want = np.asarray(_xla_reference(frames, m, np.array([0], np.int32)))
    # canvas level resamples from the 1/3-scale letterbox: allow loose tol
    diff = np.abs(np.asarray(got) - want)
    assert np.median(diff) < 4.0


def test_fallback_flags():
    m = _matrices([(1.0, 0.6, 300.0, 300.0),    # 34 deg rotation -> fallback
                   (0.05, 0.0, 480.0, 270.0)])  # gigantic face -> fallback
    params = pw.prepare_warp_params(m, jnp.asarray(np.array([0, 0], np.int32)),
                                    (540, 960), 2.0 / 3)
    assert np.asarray(params.fallback).all()


def test_fallback_flags_near_inverted_faces():
    """phi ~ 180 deg has |sin(phi)| small — |v| <= PHI_MAX alone would
    admit it while the shear u = -sin/(1+cos) explodes. The envelope must
    flag every near-inverted rotation (inverted camera / lying subject)."""
    degs = [175.0, 180.0, -178.0, 170.5, 95.0]
    m = _matrices([(1.0, np.deg2rad(d), 300.0, 300.0) for d in degs])
    params = pw.prepare_warp_params(
        m, jnp.asarray(np.zeros(len(degs), np.int32)), (540, 960), 2.0 / 3)
    assert np.asarray(params.fallback).all()
    # and the upright envelope is untouched
    m_ok = _matrices([(1.0, np.deg2rad(8.0), 300.0, 300.0)])
    p_ok = pw.prepare_warp_params(m_ok, jnp.asarray(np.zeros(1, np.int32)),
                                  (540, 960), 2.0 / 3)
    assert not np.asarray(p_ok.fallback).any()


def test_order_restoration(frames):
    """Crops from interleaved frames come back in the caller's order."""
    specs = [(1.0, 0.0, 300.0, 270.0)] * 4
    m = _matrices(specs)
    fidx = np.array([1, 0, 1, 0], np.int32)
    got, _ = _run(frames, m, fidx)
    want = np.asarray(_xla_reference(frames, m, fidx))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2)


def test_rotation_at_envelope_edge(frames):
    """Rotation just inside PHI_MAX must stay band-covered (no dropped
    taps -> bounded deviation from the exact warp)."""
    ang = 0.23  # sin = 0.228 < PHI_MAX
    specs = [(1.0, ang, 400.0, 270.0), (1.0, -ang, 500.0, 250.0)]
    m = _matrices(specs)
    fidx = np.array([0, 1], np.int32)
    got, params = _run(frames, m, fidx)
    assert not np.asarray(params.fallback).any()
    want = np.asarray(_xla_reference(frames, m, fidx))
    diff = np.abs(np.asarray(got) - want)
    # dropped band taps would zero whole regions -> huge median
    assert np.median(diff) < 2.0
    # interior must be populated (no zeroed stripes)
    interior = np.asarray(got)[:, 20:92, 20:92]
    assert (np.abs(interior).mean(axis=(1, 2, 3)) > 10).all()


def test_mixed_repair_path(frames):
    """embed_crops_mixed: out-of-envelope crops are recomputed with the
    exact XLA warp while in-envelope crops keep the pallas result — one
    tilted head must not degrade (or slow) the rest of the batch."""
    from scrfd_arcface_facerecognition_tpu.pipeline.embedder import (
        embed_crops_mixed, embed_crops)

    # crop 1 rotated 34 deg -> fallback-flagged; 0 and 2 in-envelope
    m = _matrices([(1.0, 0.0, 300.0, 300.0),
                   (1.0, 0.6, 400.0, 300.0),
                   (0.9, 0.1, 500.0, 250.0)])
    fidx = jnp.asarray([0, 1, 1], jnp.int32)
    fh, fw = frames.shape[1:3]
    plan = ops.letterbox_plan((fh, fw), (640, 640))
    params = pw.prepare_warp_params(m, fidx, (fh, fw), plan.det_scale)
    assert np.asarray(params.fallback).tolist() == [False, True, False]

    canvas = jnp.clip(jnp.round(ops.letterbox(frames, plan)), 0, 255
                      ).astype(jnp.uint8)
    valid = jnp.ones((3,), bool)

    # identity embedder: the "embedding" IS the normalized crop -> compare
    # warp outputs directly through the embed machinery
    flat = lambda v, x: x.reshape(x.shape[0], -1)[:, :128]
    emb_mixed = embed_crops_mixed(flat, None, frames, canvas, 
                                  _kps_from_matrices(m), fidx, valid,
                                  fb_slots=2, interpret=True, l2=False)
    emb_xla = embed_crops(flat, None, frames, _kps_from_matrices(m), fidx,
                          valid, l2=False)
    # the repaired crop equals the exact path bit-for-bit
    np.testing.assert_allclose(np.asarray(emb_mixed[1]),
                               np.asarray(emb_xla[1]), atol=1e-4)
    # in-envelope crops stay close to exact (pallas resampling tolerance)
    np.testing.assert_allclose(np.asarray(emb_mixed[0]),
                               np.asarray(emb_xla[0]), atol=0.1)


def _kps_from_matrices(ms):
    """Invert src->dst similarity onto the canonical 5 landmarks to get
    source keypoints whose umeyama fit reproduces (approximately) ms."""
    from scrfd_arcface_facerecognition_tpu.ops.umeyama import ARCFACE_DST
    from scrfd_arcface_facerecognition_tpu.ops.warp import invert_affine
    minv = np.asarray(invert_affine(ms))
    dst = np.asarray(ARCFACE_DST)                   # (5, 2)
    kps = dst @ minv[:, :, :2].transpose(0, 2, 1) + minv[:, None, :, 2]
    return jnp.asarray(kps.astype(np.float32))


def test_pipeline_policy_selects_mixed_path():
    """auto policy: 0 violations -> pure pallas; 1..FB_SLOTS -> mixed
    (fb_slots set); more -> XLA. Decision logic only (CPU)."""
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline

    pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                        conf_thres=0.0, pre_nms=16, max_det=2,
                        gallery_capacity=8, seed=0)
    pipe.pallas_policy = "auto"   # as on TPU
    calls = []
    pipe._bucket_fn = lambda bucket, use_pallas=False, fb_slots=0: (
        calls.append((use_pallas, fb_slots)) or
        (lambda *a, **k: "out"))

    class FakeDet:
        def __init__(self, n_fb):
            self.valid = jnp.ones((1, 2), bool)
            self.canvas = jnp.zeros((1, 8, 8, 3), jnp.uint8)
            self._n = n_fb
        boxes = scores = kps = count = det_scale = None
        host_counts = None
        @property
        def n_warp_fallback(self):
            return jnp.int32(self._n)

    placed = (None, None, None, None)
    for n_fb, want in [(0, (True, 0)), (3, (True, 16)), (40, (False, 0))]:
        pipe._read_counts = lambda det, n=n_fb: (2, n)
        pipe._finish(jnp.zeros((1, 8, 8, 3), jnp.uint8), FakeDet(n_fb), placed)
        assert calls[-1] == want, (n_fb, calls[-1])


def test_window_origin_always_128_aligned():
    """ox must honor the kernel's pl.multiple_of(ox, 128) promise even when
    the right-edge clamp binds on non-128-multiple source widths (e.g. the
    576-wide tight canvas of a portrait frame, or a 1080-wide frame)."""
    for fw, cw in [(1080, 576), (900, 512), (1920, 640), (640, 640)]:
        # faces marching across the full width
        cxs = np.linspace(10, fw - 10, 13, dtype=np.float32)
        ms = _matrices([(1.0, 0.0, float(cx), 300.0) for cx in cxs])
        params = pw.prepare_warp_params(
            ms, jnp.zeros((len(cxs),), jnp.int32), (1100, fw), 0.5,
            canvas_hw=(640, cw))
        ox = np.asarray(params.iparams[:, 3])
        assert (ox % 128 == 0).all(), (fw, cw, ox)
        # window must stay inside the lane-padded plane
        src_w = np.where(np.asarray(params.iparams[:, 1]) == 0, fw, cw)
        padded = -(-src_w // 128) * 128
        assert (ox + pw.PW <= padded).all(), (fw, cw, ox, padded)


def test_large_sigma_window_phase_coverage(frames):
    """Crops near SIGMA_MAX at worst window-alignment phases must not
    zero their right edge: the x-window origin rounds to the NEAREST 128
    so mx + sigma*CQ always fits PW (the floored origin put mx in
    [256, 384) and silently blacked out columns)."""
    sigma = pw.SIGMA_MAX - 0.02
    # sweep centers across a full 128 alignment period
    specs = [(1.0 / sigma, 0.0, 300.0 + phase, 270.0)
             for phase in range(0, 128, 16)]
    m = _matrices(specs)
    fidx = jnp.zeros((len(specs),), jnp.int32)
    crops, params = _run(frames, m, fidx)
    assert not np.asarray(params.fallback).any()
    exact = np.asarray(_xla_reference(frames, m, fidx))
    got = np.asarray(crops)
    # right-edge columns must carry content, not a zero band
    for i in range(len(specs)):
        right_exact = exact[i, :, -8:, :].mean()
        right_got = got[i, :, -8:, :].mean()
        assert right_got > 0.25 * right_exact, (
            i, right_got, right_exact)


def test_envelope_fuzz_against_exact_warp(frames):
    """Randomized in-envelope crops (scale x rotation x position sweep)
    stay within the documented tolerance of the exact warp — a property
    fuzz over the full parameter box, not just hand-picked cases."""
    rng = np.random.default_rng(123)
    specs = []
    for _ in range(24):
        sigma = rng.uniform(0.45, pw.SIGMA_MAX - 0.03)
        ang = rng.uniform(-0.22, 0.22)          # inside PHI_MAX=0.24
        cx = rng.uniform(120, 840)
        cy = rng.uniform(100, 440)
        specs.append((1.0 / sigma, ang, cx, cy))
    m = _matrices(specs)
    fidx = jnp.asarray(rng.integers(0, 2, size=len(specs)).astype(np.int32))
    crops, params = _run(frames, m, fidx)
    exact = np.asarray(_xla_reference(frames, m, fidx))
    got = np.asarray(crops)
    ok = ~np.asarray(params.fallback)
    assert ok.sum() >= len(specs) - 2   # nearly all inside the envelope
    for i in np.nonzero(ok)[0]:
        d = np.abs(got[i] - exact[i])
        # multi-pass resampling tolerance (documented: embedding cosine
        # effect < 1e-4): mean error small on the 0-255 scale, peaks
        # bounded — gross corruption (e.g. a zeroed edge band) shows up
        # as means >> 10
        assert d.mean() < 2.5, (i, specs[i], d.mean())
        assert np.percentile(d, 99) < 16.0, (i, specs[i])


def test_narrow_source_planes_pad_to_window():
    """Sources narrower than the PW=512 x-window must be padded, not read
    out of bounds. A 320x320 frame (detector input 320 caps the tight
    canvas at 320 wide — below the 512 floor) hit exactly this: the
    kernel's [ox, ox+PW) window overran the 384-lane padded plane and
    produced garbage crops -> NaN embeddings in the decision-quality eval
    (tools/exp_decisions.py). Padded lanes are zero — the warp's defined
    border — so narrow sources must now match the exact warp."""
    rng = np.random.default_rng(7)
    import cv2
    base = rng.integers(0, 255, (1, 40, 40, 3)).astype(np.float32)
    frames320 = jnp.asarray(np.clip(np.stack(
        [cv2.resize(b, (320, 320)) for b in base]), 0, 255).astype(np.uint8))
    # faces spread across the narrow frame, scales up to near the eval's
    # 208px paste boxes (sigma ~ 1.86)
    specs = [(1.0 / 1.6, 0.0, 160.0, 160.0),
             (1.0 / 1.86, 0.05, 100.0, 220.0),
             (1.0, -0.08, 250.0, 80.0)]
    m = _matrices(specs)
    fidx = jnp.zeros((len(specs),), jnp.int32)
    plan = ops.tight_letterbox_plan((320, 320), (320, 320))
    assert plan.model_hw[1] < pw.PW   # the regression's precondition
    params = pw.prepare_warp_params(m, fidx, (320, 320), plan.det_scale,
                                    canvas_hw=plan.model_hw)
    canvas = jnp.clip(jnp.round(ops.letterbox(frames320, plan)), 0, 255
                      ).astype(jnp.uint8)
    crops = pw.warp_crops_pallas(pw.planarize(frames320),
                                 pw.planarize(canvas), params,
                                 interpret=True)
    got = np.asarray(crops)
    assert np.all(np.isfinite(got))
    exact = np.asarray(_xla_reference(frames320, m, fidx))
    ok = ~np.asarray(params.fallback)
    assert ok.all()          # in-envelope geometry must not need fallback
    for i in range(len(specs)):
        d = np.abs(got[i] - exact[i])
        assert d.mean() < 2.5, (i, d.mean())
