"""Multi-process decode pool + zero-copy ring (runtime/decode_pool.py,
runtime/native.py fp_reserve/fp_peek, runtime/video.py zero-copy paths).

Frame content is the oracle: each synthetic frame encodes its index in the
pixel values, so ordering, completeness, and bit-exactness are all checked
against an independent sequential decode of the same file.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scrfd_arcface_facerecognition_tpu.runtime.native import FramePipe
from scrfd_arcface_facerecognition_tpu.runtime.video import (
    BatchedFrameReader, open_capture)

pytestmark = pytest.mark.slow

N_FRAMES = 60
W, H = 320, 240


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vid") / "seq.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (W, H))
    if not wr.isOpened():
        pytest.skip("VideoWriter unavailable")
    for i in range(N_FRAMES):
        wr.write(np.full((H, W, 3), i * 4 % 251, np.uint8))
    wr.release()
    return path


def _ref_frames(path):
    cap = open_capture(path)
    out = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        out.append(f.copy())
    cap.release()
    return np.stack(out)


def _frame_index(frame, lut):
    """Map a decoded frame back to its index via mean pixel value."""
    return int(np.abs(lut - float(frame.mean())).argmin())


# ------------------------------------------------------------- zero-copy ring


def test_framepipe_reserve_commit_peek_release():
    pipe = FramePipe(slot_bytes=64, n_slots=4)
    if not pipe.zero_copy:
        pytest.skip("native ring unavailable")
    for i in range(10):
        view = pipe.reserve_view(timeout_ms=1000)
        assert view is not None and view.shape == (64,)
        view[:] = i
        pipe.commit()
        rc, out = pipe.peek_view(timeout_ms=1000)
        assert rc == 1 and (out == i).all()
        pipe.release_slot()
    pipe.close()
    rc, out = pipe.peek_view(timeout_ms=100)
    assert rc == -1 and out is None


def test_framepipe_zero_copy_interops_with_push():
    pipe = FramePipe(slot_bytes=8, n_slots=4)
    if not pipe.zero_copy:
        pytest.skip("native ring unavailable")
    pipe.push(b"\x01" * 8)
    view = pipe.reserve_view()
    view[:] = 2
    pipe.commit()
    assert pipe.pop() == b"\x01" * 8
    rc, out = pipe.peek_view()
    assert rc == 1 and (out == 2).all()
    pipe.release_slot()


# -------------------------------------------------- BatchedFrameReader paths


def test_batched_reader_zero_copy_bit_exact(video):
    ref = _ref_frames(video)
    cap = open_capture(video)
    r = BatchedFrameReader(cap, batch=7)
    got = np.concatenate([b.copy() for b in r], axis=0)
    assert r.close()
    cap.release()
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_batched_reader_legacy_path_matches(video):
    ref = _ref_frames(video)
    cap = open_capture(video)
    # ctor knob (a post-construction patch raced the producer thread,
    # which samples the mode once at startup)
    r = BatchedFrameReader(cap, batch=7, zero_copy=False)
    got = np.concatenate([b.copy() for b in r], axis=0)
    r.close()
    cap.release()
    np.testing.assert_array_equal(got, ref)


# -------------------------------------------------------------- DecodePool


def test_decode_pool_complete_ordered(video):
    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    ref = _ref_frames(video)
    lut = ref.reshape(len(ref), -1).mean(axis=1)
    pool = DecodePool([video] * 3, workers=2, slot_bytes=W * H * 3,
                      timeout_ms=8000)
    seq = {0: [], 1: [], 2: []}
    total = 0
    for batch, ids in pool:
        assert batch.dtype == np.uint8
        for bi, sid in enumerate(ids):
            seq[sid].append(_frame_index(batch[bi], lut))
        total += len(ids)
    assert total == 3 * len(ref)
    for sid in range(3):
        # every stream delivered every frame, in order
        assert seq[sid] == list(range(len(ref))), sid
        # the pool learns each stream's real rate (writers need it; a
        # hardcoded 24.0 played 30 fps cameras 20% slow)
        assert abs(pool.stream_fps[sid] - 24.0) < 1.0, pool.stream_fps
    pool.release()


def test_decode_pool_single_worker_many_streams(video):
    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    ref = _ref_frames(video)
    pool = DecodePool([video] * 4, workers=1, slot_bytes=W * H * 3,
                      timeout_ms=8000)
    counts = {}
    first_round = None
    for batch, ids in pool:
        if first_round is None:
            first_round = (batch.copy(), list(ids))
        for sid in ids:
            counts[sid] = counts.get(sid, 0) + 1
    pool.release()
    assert counts == {s: len(ref) for s in range(4)}
    b0, ids0 = first_round
    assert ids0 == [0, 1, 2, 3]
    for bi in range(4):
        np.testing.assert_array_equal(b0[bi], ref[0])


def test_decode_pool_bad_source_drops_out(video):
    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    ref = _ref_frames(video)
    pool = DecodePool([video, "/nonexistent/nope.mp4"], workers=1,
                      slot_bytes=W * H * 3, timeout_ms=8000)
    counts = {}
    for batch, ids in pool:
        for sid in ids:
            counts[sid] = counts.get(sid, 0) + 1
    pool.release()
    assert counts.get(0) == len(ref)
    assert counts.get(1) in (None, 0)


def test_decode_pool_release_mid_stream(video):
    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    pool = DecodePool([video] * 2, workers=2, slot_bytes=W * H * 3)
    it = iter(pool)
    next(it)
    next(it)
    pool.release()
    assert all(not p.is_alive() for p in pool._procs)


def test_iter_round_bounded_with_multiple_stalled_streams():
    """ADVICE r4: several stalled cameras must share ONE concurrent
    timeout window per round, not serialize full timeouts — a healthy
    stream's frame is delivered within ~timeout_ms even when three
    siblings are stalled."""
    import queue
    import time as _time

    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    class _DeadProc:
        def is_alive(self):
            return False

    pool = DecodePool.__new__(DecodePool)   # no processes: queue-level test
    pool.n_streams = 4
    pool.timeout_ms = 400
    pool.startup_timeout_ms = 400
    pool._proc_of = {i: _DeadProc() for i in range(4)}
    pool.slot_bytes = 16 * 16 * 3
    pool._buf = np.zeros(4 * pool.slot_bytes, np.uint8)
    pool._free_qs = {i: queue.Queue() for i in range(4)}
    pool._filled_qs = {i: queue.Queue() for i in range(4)}
    pool.frames_out = 0
    pool.stream_dims = {}
    pool.stream_fps = {}
    pool._t0 = _time.monotonic()
    pool._closed = True                      # __del__ release() no-ops

    pool._filled_qs[0].put((0, 16, 16, 24.0))   # stream 0 healthy
    it = iter(pool)
    t0 = _time.monotonic()
    batch, ids = next(it)
    dt = _time.monotonic() - t0
    assert ids == [0]
    assert batch.shape == (1, 16, 16, 3)
    # sequential per-stream waits would take >= 3 * 400 ms here
    assert dt < 0.8, f"round took {dt:.2f}s — stalled streams serialized"
    # slot recycled to the healthy stream's own free queue
    assert pool._free_qs[0].get_nowait() == 0


def test_decode_pool_startup_grace_under_tiny_timeout(video):
    """A stream that has NEVER delivered is connecting, not stalled: with
    timeout_ms far below worker spawn + import time (regression for the
    loaded-1-core-host startup flake), every frame must still arrive as
    long as the workers are alive — first delivery is governed by
    startup_timeout_ms, and only post-delivery silence by timeout_ms."""
    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    ref = _ref_frames(video)
    pool = DecodePool([video] * 2, workers=1, slot_bytes=W * H * 3,
                      timeout_ms=1, startup_timeout_ms=120000)
    counts = {}
    for batch, ids in pool:
        for sid in ids:
            counts[sid] = counts.get(sid, 0) + 1
    pool.release()
    # timeout_ms=1 makes post-start rounds racy by design (a frame can
    # legitimately miss a 1 ms round) — the regression being pinned is
    # "startup must not drop everything": both streams deliver their
    # first frames and a healthy prefix
    assert counts.get(0, 0) > 0 and counts.get(1, 0) > 0
    assert max(counts.values()) <= len(ref)


def test_decode_pool_dead_worker_not_waited_on(video):
    """A never-started stream whose worker DIED must not hold iteration
    for the startup grace."""
    import time as _time

    from scrfd_arcface_facerecognition_tpu.runtime.decode_pool import (
        DecodePool)

    ref = _ref_frames(video)
    pool = DecodePool([video, "/nonexistent/nope.mp4"], workers=2,
                      slot_bytes=W * H * 3, timeout_ms=4000,
                      startup_timeout_ms=600000)
    t0 = _time.monotonic()
    counts = {}
    for batch, ids in pool:
        for sid in ids:
            counts[sid] = counts.get(sid, 0) + 1
    pool.release()
    # the bad source eos's (worker stays alive serving stream 0), or its
    # worker dies — either way iteration finishes in bounded time without
    # burning the 10-minute startup grace
    assert _time.monotonic() - t0 < 60
    assert counts.get(0) == len(ref)
    assert counts.get(1) in (None, 0)
