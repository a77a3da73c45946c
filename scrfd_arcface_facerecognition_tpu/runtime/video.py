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

    def __init__(self, capture, batch: int = 8, ring_slots: int = 32):
        self.cap = capture
        self.batch = batch
        ok, first = capture.read()
        if not ok:
            self._empty = True
            self.shape = None
            return
        self._empty = False
        self.shape = first.shape
        self._pipe = FramePipe(slot_bytes=first.nbytes, n_slots=ring_slots)
        self._pipe.push(first.tobytes())
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            if not self._pipe.push(frame.tobytes(), timeout_ms=60000):
                break
        self._pipe.close()

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._empty:
            return
        h, w, c = self.shape
        while True:
            frames = []
            for _ in range(self.batch):
                data = self._pipe.pop(timeout_ms=60000)
                if data is None:
                    break
                frames.append(
                    np.frombuffer(data, np.uint8).reshape(h, w, c).copy())
            if not frames:
                return
            yield np.stack(frames)
            if len(frames) < self.batch:
                return

    def close(self):
        if not self._empty:
            self._pipe.close()


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
