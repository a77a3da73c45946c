"""cv2 parity: bilinear resize, letterbox, warpAffine alignment."""
import cv2
import numpy as np
import jax.numpy as jnp

from scrfd_arcface_facerecognition_tpu import ops
from oracles import np_letterbox_geometry, np_umeyama


def test_resize_matches_cv2_float32():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(90, 160, 3)).astype(np.float32)
    for out_wh in [(64, 36), (320, 180), (123, 77), (160, 90)]:
        want = cv2.resize(img, out_wh, interpolation=cv2.INTER_LINEAR)
        got = np.asarray(ops.resize_bilinear(jnp.asarray(img), (out_wh[1], out_wh[0])))
        np.testing.assert_allclose(got, want, atol=1e-2)


def test_resize_matches_cv2_uint8_within_quantization():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(108, 192, 3), dtype=np.uint8)
    want = cv2.resize(img, (64, 36), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    got = np.asarray(ops.resize_bilinear(jnp.asarray(img), (36, 64)))
    # cv2 quantizes weights (11-bit) and rounds to uint8 -> <=1 LSB apart.
    assert np.max(np.abs(got - want)) <= 1.0 + 1e-4


def test_resize_u8_exact_bit_parity_with_cv2():
    """resize_bilinear_u8_exact reproduces cv2's u8 fixed-point pipeline
    array_equal — up/down scale, odd sizes, identity-ish, and the exact-2x
    case cv2 silently reroutes to its INTER_AREA fast path."""
    rng = np.random.default_rng(2)
    cases = [((108, 192), (36, 64)), ((90, 160), (180, 320)),
             ((77, 123), (53, 99)), ((64, 64), (64, 64)),
             ((112, 112), (56, 56)),      # exact 2x down -> AREA fast path
             ((1080, 1920), (360, 640)),
             ((7, 5), (13, 11))]
    for (h, w), (oh, ow) in cases:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(ops.resize_bilinear_u8_exact(jnp.asarray(img), (oh, ow)))
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"{(h, w)}->{(oh, ow)}")


def test_resize_u8_exact_on_reference_fixtures():
    """Bit-parity vs cv2 on real reference crops (odd sizes, real content)."""
    import glob
    files = sorted(glob.glob("/root/reference/image_cache/*.jpg"))[::60]
    checked = 0
    for f in files:
        img = cv2.imread(f)
        if img is None:
            continue
        plan = ops.letterbox_plan(img.shape[:2], (640, 640))
        nh, nw = plan.new_hw
        got = np.asarray(ops.resize_bilinear_u8_exact(jnp.asarray(img), (nh, nw)))
        want = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(got, want, err_msg=f)
        checked += 1
    assert checked >= 3


def test_letterbox_exact_u8_flag():
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, size=(1080, 1920, 3), dtype=np.uint8)
    plan = ops.letterbox_plan((1080, 1920), (640, 640))
    new_h, new_w = plan.new_hw
    want = cv2.resize(frame, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(ops.letterbox(jnp.asarray(frame), plan, exact_u8=True))
    np.testing.assert_array_equal(got[:new_h, :new_w], want.astype(np.float32))
    assert (got[new_h:] == 0).all() and (got[:, new_w:] == 0).all()


def test_letterbox_geometry_matches_reference():
    for frame_hw in [(1080, 1920), (1920, 1080), (640, 640), (480, 640), (720, 576)]:
        plan = ops.letterbox_plan(frame_hw, (640, 640))
        want = np_letterbox_geometry(frame_hw, (640, 640))
        assert plan.new_hw == (want[0], want[1])
        assert abs(plan.det_scale - want[2]) < 1e-9


def test_letterbox_content_and_padding():
    rng = np.random.default_rng(2)
    frame = rng.integers(0, 256, size=(1080, 1920, 3), dtype=np.uint8)
    plan = ops.letterbox_plan((1080, 1920), (640, 640))
    out = np.asarray(ops.letterbox(jnp.asarray(frame), plan))
    assert out.shape == (640, 640, 3)
    new_h, new_w = plan.new_hw
    # Padding region is exactly zero.
    assert np.all(out[new_h:, :, :] == 0)
    assert np.all(out[:, new_w:, :] == 0)
    # Content region matches cv2.resize within uint8 quantization.
    want = cv2.resize(frame, (new_w, new_h)).astype(np.float32)
    assert np.max(np.abs(out[:new_h, :new_w] - want)) <= 1.0 + 1e-4


def test_letterbox_batched():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(2, 270, 480, 3), dtype=np.uint8)
    plan = ops.letterbox_plan((270, 480), (640, 640))
    out = np.asarray(ops.letterbox(jnp.asarray(frames), plan))
    assert out.shape == (2, 640, 640, 3)


def test_invert_affine():
    rng = np.random.default_rng(4)
    m = rng.normal(size=(2, 3)).astype(np.float32)
    m[0, 0] += 2.0  # keep well-conditioned
    m[1, 1] += 2.0
    minv = np.asarray(ops.invert_affine(jnp.asarray(m)))
    m3 = np.vstack([m, [0, 0, 1]])
    want = np.linalg.inv(m3)[:2]
    np.testing.assert_allclose(minv, want, atol=1e-5)


def test_warp_affine_matches_cv2_float32():
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, size=(300, 400, 3)).astype(np.float32)
    src = np.asarray(ops.ARCFACE_DST) * 2.0 + np.array([40.0, 30.0], dtype=np.float32)
    m = np_umeyama(src, np.asarray(ops.ARCFACE_DST)).astype(np.float32)
    want = cv2.warpAffine(img, m, (112, 112), borderValue=0.0)
    got = np.asarray(ops.warp_affine(jnp.asarray(img), jnp.asarray(m)))
    np.testing.assert_allclose(got, want, atol=0.5)


def test_warp_affine_zero_border():
    img = np.full((50, 50, 3), 200.0, dtype=np.float32)
    # Identity warp shifted far off-image -> mostly zeros.
    m = np.array([[1.0, 0.0, -200.0], [0.0, 1.0, -200.0]], dtype=np.float32)
    got = np.asarray(ops.warp_affine(jnp.asarray(img), jnp.asarray(m)))
    assert np.all(got == 0.0)


def test_norm_crop_matches_cv2_pipeline():
    """End-to-end alignment parity: estimate_norm + warp vs numpy-umeyama + cv2."""
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
    landmarks = (np.asarray(ops.ARCFACE_DST) * 1.7
                 + np.array([120.0, 80.0])
                 + rng.normal(scale=2.0, size=(5, 2))).astype(np.float32)
    m = np_umeyama(landmarks, np.asarray(ops.ARCFACE_DST)).astype(np.float32)
    want = cv2.warpAffine(img, m, (112, 112), borderValue=0.0)
    got = np.asarray(ops.norm_crop(jnp.asarray(img), jnp.asarray(landmarks)))
    np.testing.assert_allclose(got, want, atol=1.0)


def test_norm_crop_batched():
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, size=(240, 320, 3)).astype(np.float32)
    lms = np.stack([
        (np.asarray(ops.ARCFACE_DST) + np.array([20.0 * i, 10.0 * i])).astype(np.float32)
        for i in range(4)
    ])
    got = np.asarray(ops.norm_crop(jnp.asarray(img), jnp.asarray(lms)))
    assert got.shape == (4, 112, 112, 3)


def test_bf16_letterbox_close():
    """bf16 compute letterbox stays within ~1 intensity LSB of f32 —
    the bound the bf16-detector pipeline relies on."""
    import jax.numpy as jnp_
    rng = np.random.default_rng(9)
    frame = rng.integers(0, 256, size=(270, 480, 3), dtype=np.uint8)
    plan = ops.letterbox_plan((270, 480), (640, 640))
    want = np.asarray(ops.letterbox(jnp.asarray(frame), plan))
    got = np.asarray(ops.letterbox(jnp.asarray(frame), plan,
                                   dtype=jnp_.bfloat16))
    assert np.max(np.abs(got - want)) <= 1.0 + 1e-4
