"""Host-side runtime: native (C++) components + video IO.

- native: ctypes bindings to libsafr_native.so (frame prefetch ring,
  gallery snapshot store, union-find merge engine), with automatic build
  via the checked-in Makefile and pure-Python fallbacks.
- video: batched, prefetching video readers feeding the device pipeline.
"""

from .native import (
    native_available, build_native, FramePipe, uf_group_roots,
    snapshot_write, snapshot_read,
)
from .video import BatchedFrameReader
from .microbatch import MicroBatcher

__all__ = ["native_available", "build_native", "FramePipe", "uf_group_roots",
           "snapshot_write", "snapshot_read", "BatchedFrameReader",
           "MicroBatcher"]
