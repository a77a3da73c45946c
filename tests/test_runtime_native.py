"""Native runtime: build, frame pipe, union-find, snapshot store, video."""
import threading

import numpy as np
import pytest

from scrfd_arcface_facerecognition_tpu.runtime import (
    native_available, build_native, FramePipe, uf_group_roots,
    snapshot_write, snapshot_read, BatchedFrameReader)


def test_native_library_builds():
    assert build_native(), "libsafr_native.so must build with g++"
    assert native_available()


def test_framepipe_roundtrip():
    pipe = FramePipe(slot_bytes=16, n_slots=4)
    assert pipe.push(b"x" * 16)
    assert pipe.push(b"y" * 16)
    assert pipe.size() == 2
    assert pipe.pop() == b"x" * 16
    assert pipe.pop() == b"y" * 16
    pipe.close()
    assert pipe.pop() is None  # closed + drained


def test_framepipe_threaded_ordering():
    pipe = FramePipe(slot_bytes=8, n_slots=4)  # small ring forces blocking
    n = 200

    push_ok = []

    def producer():
        try:
            for i in range(n):
                push_ok.append(pipe.push(i.to_bytes(8, "little")))
        finally:
            pipe.close()   # a failed push must not leave the consumer
                           # stalled; the main thread asserts the results

    t = threading.Thread(target=producer)
    t.start()
    got = []
    while True:
        data = pipe.pop()
        if data is None:
            break
        got.append(int.from_bytes(data, "little"))
    t.join()
    assert push_ok == [True] * n
    assert got == list(range(n))


def test_framepipe_rejects_oversize():
    pipe = FramePipe(slot_bytes=4, n_slots=2)
    assert not pipe.push(b"too large for slot")


def test_uf_group_roots():
    pairs = np.asarray([[0, 1], [1, 2], [4, 5]], np.int64)
    roots = uf_group_roots(7, pairs)
    assert roots[0] == roots[1] == roots[2] == 0
    assert roots[4] == roots[5] == 4
    assert roots[3] == 3 and roots[6] == 6


def test_uf_empty_pairs():
    roots = uf_group_roots(3, np.zeros((0, 2), np.int64))
    assert roots.tolist() == [0, 1, 2]


def test_snapshot_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(17, 512)).astype(np.float32)
    ids = rng.integers(0, 10000, size=17).astype(np.int64)
    path = str(tmp_path / "gallery.safr")
    snapshot_write(path, emb, ids)
    emb2, ids2 = snapshot_read(path)
    np.testing.assert_array_equal(emb, emb2)
    np.testing.assert_array_equal(ids, ids2)


def test_snapshot_detects_corruption(tmp_path):
    if not native_available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(4, 8)).astype(np.float32)
    ids = np.arange(4, dtype=np.int64)
    path = str(tmp_path / "g.safr")
    snapshot_write(path, emb, ids)
    raw = bytearray(open(path, "rb").read())
    raw[40] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        snapshot_read(path)


class _FakeCapture:
    def __init__(self, frames):
        self.frames = list(frames)

    def read(self):
        if not self.frames:
            return False, None
        return True, self.frames.pop(0)


def test_batched_frame_reader():
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
              for _ in range(10)]
    reader = BatchedFrameReader(_FakeCapture(list(frames)), batch=4)
    batches = list(reader)
    assert [len(b) for b in batches] == [4, 4, 2]
    np.testing.assert_array_equal(np.concatenate(batches), np.stack(frames))


def test_batched_frame_reader_empty():
    reader = BatchedFrameReader(_FakeCapture([]), batch=4)
    assert list(reader) == []


def test_batched_frame_reader_close_joins_producer():
    """close() must stop AND join the decode thread — even when the
    producer is blocked pushing into a full ring — so the caller can
    safely release the capture afterwards (apps/realtime.py finally)."""
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
              for _ in range(64)]
    # tiny ring so the producer is parked on a full-ring push mid-stream
    reader = BatchedFrameReader(_FakeCapture(list(frames)), batch=4,
                                ring_slots=2)
    next(iter(reader))            # consume one batch, then abandon
    assert reader.close() is True
    assert not reader._thread.is_alive()
    # idempotent
    assert reader.close() is True


def test_native_video_decoder_matches_cv2():
    """NativeVideoReader (ffmpeg C++) decodes the reference's committed
    demo.mp4 to the same frames cv2 produces (both are ffmpeg-backed;
    color conversion may differ by ~1 LSB)."""
    import cv2
    import pytest
    from scrfd_arcface_facerecognition_tpu.runtime.native import (
        NativeVideoReader, _load_video)

    if _load_video() is None:
        pytest.skip("libsafr_video.so unavailable")
    src = "/root/reference/assets/demo.mp4"
    nat = NativeVideoReader(src)
    ref = cv2.VideoCapture(src)
    assert (nat.width, nat.height) == (
        int(ref.get(cv2.CAP_PROP_FRAME_WIDTH)),
        int(ref.get(cv2.CAP_PROP_FRAME_HEIGHT)))
    n = 0
    for _ in range(5):
        ok_n, f_n = nat.read()
        ok_r, f_r = ref.read()
        assert ok_n == ok_r
        if not ok_n:
            break
        assert f_n.shape == f_r.shape
        diff = np.abs(f_n.astype(int) - f_r.astype(int))
        assert diff.mean() < 2.0 and np.percentile(diff, 99) <= 4, (
            diff.mean(), diff.max())
        n += 1
    nat.release()
    ref.release()
    assert n >= 3


def test_open_capture_prefers_native_and_falls_back():
    import pytest
    from scrfd_arcface_facerecognition_tpu.runtime.video import open_capture
    from scrfd_arcface_facerecognition_tpu.runtime.native import (
        NativeVideoReader, _load_video)

    if _load_video() is None:
        pytest.skip("libsafr_video.so unavailable")
    cap = open_capture("/root/reference/assets/demo.mp4")
    assert isinstance(cap, NativeVideoReader)
    ok, frame = cap.read()
    assert ok and frame.dtype == np.uint8 and frame.ndim == 3
    cap.release()
    # nonexistent file -> cv2 fallback object (unopened), no raise
    cap2 = open_capture("/nope/missing.mp4")
    assert not isinstance(cap2, NativeVideoReader)


def test_multi_stream_reader_batches_all_live_streams(tmp_path):
    """N synthetic videos of different lengths: every yielded batch carries
    one frame per still-live stream in stream order; ended streams drop."""
    import cv2
    from scrfd_arcface_facerecognition_tpu.runtime.video import (
        MultiStreamReader, open_capture)

    paths = []
    for si, n_frames in enumerate((6, 3)):
        p = str(tmp_path / f"s{si}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (64, 48))
        for f in range(n_frames):
            frame = np.full((48, 64, 3), 10 * si + f, np.uint8)
            wr.write(frame)
        wr.release()
        paths.append(p)

    reader = MultiStreamReader([open_capture(p) for p in paths],
                               timeout_ms=5000)
    batches = list(reader)
    reader.release()
    # first 3 rounds: both streams; remaining: only stream 0
    assert [ids for _, ids in batches[:3]] == [[0, 1]] * 3
    assert all(ids == [0] for _, ids in batches[3:])
    assert 4 <= len(batches) <= 6
    for batch, ids in batches:
        assert batch.shape[0] == len(ids)
        assert batch.dtype == np.uint8
