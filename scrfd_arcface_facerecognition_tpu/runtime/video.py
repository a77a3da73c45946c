"""Video input: background-decoded, device-batch-sized frame batches.

The decode thread pushes raw BGR frames through the native FramePipe ring
(runtime/native.py) while the consumer assembles (batch, H, W, 3) uint8
arrays for the TPU pipeline — decode overlaps device compute, the
host->device analog of the reference's download ThreadPool (SURVEY.md §2.3).
"""
from __future__ import annotations

import threading
from typing import Iterator

import numpy as np

from .native import FramePipe


class BatchedFrameReader:
    """Iterate (n<=batch, H, W, 3) uint8 frame batches from a cv2 capture."""

    def __init__(self, capture, batch: int = 8, ring_slots: int = 32,
                 zero_copy: bool = True):
        # zero_copy=False forces the legacy tobytes+pop path even when the
        # native ring supports reserve/commit — the knob bench_ingest.py
        # and the tests use to measure/exercise both producers (a
        # post-construction patch raced the already-running producer
        # thread, which samples the mode exactly once at startup)
        self.cap = capture
        self.batch = batch
        self._stop = threading.Event()
        ok, first = capture.read()
        if not ok:
            self._empty = True
            self.shape = None
            return
        self._empty = False
        self.shape = first.shape
        self._pipe = FramePipe(slot_bytes=first.nbytes, n_slots=ring_slots)
        self._zero_copy = bool(zero_copy) and self._pipe.zero_copy
        self._pipe.push(first.tobytes())
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        # Zero-copy fast path: reserve a ring slot and let the decoder
        # write INTO it (native reader: vdec_read straight to the slot;
        # cv2: one np.copyto). The legacy path costs two extra full-frame
        # copies per frame (frame.tobytes() + the ring push memcpy) under
        # the GIL — at 1080p that is ~12 MB/frame of avoidable memcpy.
        zero_copy = self._zero_copy
        read_into = getattr(self.cap, "read_into", None)
        h, w, c = self.shape
        # finally: the pipe MUST close even if the loop body raises (e.g.
        # np.copyto on a mid-stream resolution change), or the consumer
        # blocks the full peek timeout and misreports a dead stream as a
        # wedged camera
        try:
            while not self._stop.is_set():
                if zero_copy:
                    view = None
                    while not self._stop.is_set():
                        view = self._pipe.reserve_view(timeout_ms=200)
                        if view is not None:
                            break
                    if view is None:
                        break
                    slot = view[:h * w * c].reshape(h, w, c)
                    if read_into is not None:
                        ok = read_into(slot)
                    else:
                        ok, frame = self.cap.read()
                        if ok:
                            if frame.shape != (h, w, c):
                                break   # mid-stream resolution change
                            np.copyto(slot, frame)
                    if not ok:
                        break
                    self._pipe.commit()
                    continue
                ok, frame = self.cap.read()
                if not ok:
                    break
                if frame.shape != (h, w, c):
                    # mid-stream resolution change: a larger frame makes
                    # fp_push reject instantly (hot spin, never eos); a
                    # smaller one corrupts the consumer's fixed reshape
                    break
                # short push slices that re-check stop, so close() can
                # always unblock a producer stuck on a full ring
                pushed = False
                while not self._stop.is_set():
                    if self._pipe.push(frame.tobytes(), timeout_ms=200):
                        pushed = True
                        break
                if not pushed:
                    break
        finally:
            self._pipe.close()

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._empty:
            return
        h, w, c = self.shape
        zero_copy = self._zero_copy
        while True:
            batch = np.empty((self.batch, h, w, c), np.uint8)
            n = 0
            for bi in range(self.batch):
                if zero_copy:
                    # peek the slot and assemble the batch row directly
                    # out of the ring (the single remaining host copy)
                    rc, view = self._pipe.peek_view(timeout_ms=60000)
                    if rc == 0:
                        # timeout is a STALL, not end-of-stream — match the
                        # legacy pop path's TimeoutError so callers can
                        # distinguish a wedged camera from a finished video
                        raise TimeoutError("peek_view timed out")
                    if rc != 1:
                        break
                    batch[bi] = view[:h * w * c].reshape(h, w, c)
                    self._pipe.release_slot()
                else:
                    data = self._pipe.pop(timeout_ms=60000)
                    if data is None:
                        break
                    batch[bi] = np.frombuffer(
                        data, np.uint8)[:h * w * c].reshape(h, w, c)
                n = bi + 1
            if n == 0:
                return
            yield batch[:n]
            if n < self.batch:
                return

    def close(self, join_timeout: float = 5.0):
        """Stop the producer and JOIN it before returning, so callers can
        safely release the capture afterwards (the producer may otherwise
        still be inside cap.read() — a use-after-free for the native
        ffmpeg reader). A producer stalled inside a blocking read past the
        timeout is left running (leak the capture rather than free it
        under the reader); close() reports whether the join succeeded."""
        self._stop.set()
        if self._empty:
            return True
        self._pipe.close()
        import time as _time

        deadline = _time.monotonic() + join_timeout
        while self._thread.is_alive() and _time.monotonic() < deadline:
            # drain so a producer blocked on a full ring's push can exit
            try:
                self._pipe.pop(timeout_ms=50)
            except TimeoutError:
                pass
            self._thread.join(timeout=0.05)
        return not self._thread.is_alive()


def open_capture(source):
    """Open a video source: native ffmpeg decoder for file/URL sources
    (runtime/native.py NativeVideoReader), cv2.VideoCapture otherwise
    (webcam indices) or as fallback. Returns a cv2-shaped capture."""
    if isinstance(source, str) and not source.isdigit():
        try:
            from .native import NativeVideoReader

            return NativeVideoReader(source)
        except (RuntimeError, OSError):
            pass
    import cv2

    return cv2.VideoCapture(int(source) if isinstance(source, str)
                            and source.isdigit() else source)


class MultiStreamReader:
    """N cameras -> one batched device feed (the production serving model).

    H.264 decode is CPU-bound at ~340 fps/stream/core (docs/PERF.md) while
    the chip consumes 600+ fps: each source gets its own decode thread
    pushing into a shared ring, and the consumer assembles
    (n_streams, H, W, 3) batches — one frame per live stream, in stream
    order — so every pipeline batch carries every camera. Streams that end
    (or stall past `timeout_ms`) drop out; iteration stops when none
    remain. Generalizes the reference's two-camera lockstep loop
    (main2.py:78-101) to N sources.
    """

    def __init__(self, captures, timeout_ms: int = 10000):
        import queue

        self.captures = list(captures)
        self.timeout_ms = timeout_ms
        self._stop = threading.Event()
        self._queues = [queue.Queue(maxsize=4) for _ in self.captures]
        self._threads = []
        for cap, q in zip(self.captures, self._queues):
            t = threading.Thread(target=self._producer, args=(cap, q),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def _producer(self, cap, q):
        import queue as _q

        while not self._stop.is_set():
            ok, frame = cap.read()
            if not ok:
                frame = None
            # bounded put that re-checks stop, so release() can always
            # unblock a producer stuck on a full queue
            while not self._stop.is_set():
                try:
                    q.put(frame, timeout=0.1)
                    break
                except _q.Full:
                    continue
            if frame is None:
                return

    def __iter__(self):
        import queue as _q

        live = list(range(len(self.captures)))
        while live:
            frames, ids = [], []
            still = []
            for i in live:
                try:
                    f = self._queues[i].get(timeout=self.timeout_ms / 1000)
                except _q.Empty:
                    f = None     # stalled stream drops out
                if f is None:
                    continue
                frames.append(f)
                ids.append(i)
                still.append(i)
            live = still
            if not frames:
                return
            h = max(f.shape[0] for f in frames)
            w = max(f.shape[1] for f in frames)
            batch = np.zeros((len(frames), h, w, 3), np.uint8)
            for bi, f in enumerate(frames):
                batch[bi, :f.shape[0], :f.shape[1]] = f
            yield batch, ids

    def release(self):
        # Producers may be inside cap.read() (for NativeVideoReader that is
        # an in-flight vdec_read on the ffmpeg handle) — releasing the
        # capture under them is a use-after-free. Signal stop, drain queues
        # so blocked puts return, JOIN, then release.
        self._stop.set()
        import queue as _q
        import time

        deadline = time.monotonic() + self.timeout_ms / 1000
        for t, q in zip(self._threads, self._queues):
            while t.is_alive() and time.monotonic() < deadline:
                try:
                    q.get_nowait()
                except _q.Empty:
                    pass
                t.join(timeout=0.05)
        for cap, t in zip(self.captures, self._threads):
            if t.is_alive():
                # producer still inside cap.read() (stalled source) —
                # leak the capture rather than free it under the reader
                continue
            try:
                cap.release()
            except Exception:
                pass
