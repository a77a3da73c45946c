"""Multi-process video decode pool: N cameras -> shared memory -> batches.

VERDICT r3 item 2: thread-per-camera decode under the GIL topped out at
148 fps aggregate against a 758+ fps chip (docs/PERF.md). This pool
sidesteps the GIL entirely — decode runs in worker PROCESSES that write
frames directly into shared-memory slots (the native decoder's vdec_read
targets the slot buffer itself: the frame is never copied inside the
worker), and only slot indices cross process boundaries through small
per-stream control queues. The consumer assembles (n_live_streams, H, W, 3)
device batches out of the shared memory — one copy per frame, the
unavoidable batch-assembly one.

Backpressure is PER STREAM: each stream owns a fixed quota of slots and its
own free/filled queues, so a fast camera can never hoard the ring and
starve a slow one (a shared pool livelocks: the consumer can't complete a
round without the starved stream, so it never recycles the hoarder's
slots). Within a stream, slot indices flow through one FIFO pair — frame
order is preserved by construction.

Iteration contract matches runtime/video.py MultiStreamReader: yields
(batch, stream_ids) with one frame per live stream per round; streams that
end or stall past timeout_ms drop out; iteration stops when none remain.
A stream that has never delivered a frame is "connecting", not stalled:
it gets startup_timeout_ms (worker spawn + imports on a loaded host, rtsp
handshakes) as long as its worker process is alive.

NOTE: as with any spawn/forkserver multiprocessing, the calling script
needs the standard `if __name__ == "__main__":` guard.

Reference shape being served: /root/reference/main2.py:33-36 (multi-camera
RTSP is the reference's serving deployment).
"""
from __future__ import annotations

import logging
import multiprocessing as mp
import os
import queue as _queue
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# Env vars that make child interpreters register the TPU tunnel at startup
# (sitecustomize): decode workers never touch JAX, and a scrubbed child
# starts in ~0.1 s instead of ~7 s.
_SCRUB_ENV = ("PALLAS_AXON_POOL_IPS",)


def _decode_into(cap, buf: np.ndarray, slot: int,
                 slot_bytes: int) -> Tuple[bool, int, int]:
    """Decode one frame into shared-memory slot `slot`; -> (ok, h, w)."""
    view = buf[slot * slot_bytes:(slot + 1) * slot_bytes]
    read_into = getattr(cap, "read_into", None)
    if read_into is not None:
        h, w = cap.height, cap.width
        if h * w * 3 > slot_bytes:
            _warn_oversize(h, w, slot_bytes)
            return False, 0, 0
        ok = read_into(view[:h * w * 3].reshape(h, w, 3))
        return (True, h, w) if ok else (False, 0, 0)
    ok, frame = cap.read()
    if not ok or frame is None:
        return False, 0, 0
    h, w = frame.shape[:2]
    n = h * w * 3
    if n > slot_bytes:
        _warn_oversize(h, w, slot_bytes)
        return False, 0, 0
    np.copyto(view[:n].reshape(h, w, 3), frame)
    return True, h, w


def _warn_oversize(h: int, w: int, slot_bytes: int) -> None:
    # A silent eos here is indistinguishable from an empty source — say
    # WHY the stream dropped and how to fix it (multistream: --slot-bytes).
    logger.error(
        "decode pool: %dx%d frame needs %d bytes but slot_bytes=%d — "
        "stream drops out; construct DecodePool with slot_bytes >= the "
        "largest source's h*w*3 (CLI: --slot-bytes)",
        w, h, h * w * 3, slot_bytes)


def _stream_fps(cap) -> float:
    """Source frame rate (NativeVideoReader.fps / cv2 CAP_PROP_FPS=5)."""
    fps = float(getattr(cap, "fps", 0.0) or 0.0)
    if fps <= 0:
        try:
            fps = float(cap.get(5))   # cv2.CAP_PROP_FPS
        except Exception:
            fps = 0.0
    return fps if fps > 0 else 24.0


def _worker_main(sources: Sequence, stream_ids: Sequence[int],
                 shm_name: str, slot_bytes: int, free_qs: Dict, filled_qs: Dict,
                 stop_evt):
    """Decode loop for one worker process.

    Round-robins its assigned streams. Per frame: take a slot from the
    stream's own free queue (short timeout, rotate on empty so one
    backlogged stream never starves the others), decode INTO the slot,
    publish (slot, h, w) on the stream's filled queue. A stream that ends
    publishes None (eos) once and leaves the rotation.
    """
    from multiprocessing import shared_memory

    from .video import open_capture

    shm = shared_memory.SharedMemory(name=shm_name)
    buf = np.frombuffer(shm.buf, np.uint8)
    try:
        live: Dict[int, object] = {}
        fps_map: Dict[int, float] = {}
        for sid, src in zip(stream_ids, sources):
            try:
                live[sid] = open_capture(src)
                fps_map[sid] = _stream_fps(live[sid])
            except Exception:
                filled_qs[sid].put(None)
        while live and not stop_evt.is_set():
            for sid in list(live):
                cap = live[sid]
                try:
                    slot = free_qs[sid].get(timeout=0.05)
                except _queue.Empty:
                    continue    # consumer lagging on this stream; rotate
                ok, h, w = _decode_into(cap, buf, slot, slot_bytes)
                if not ok:
                    free_qs[sid].put(slot)
                    try:
                        cap.release()
                    except Exception:
                        pass
                    del live[sid]
                    filled_qs[sid].put(None)
                    continue
                filled_qs[sid].put((slot, h, w, fps_map[sid]))
        for sid, cap in live.items():
            try:
                cap.release()
            except Exception:
                pass
            filled_qs[sid].put(None)
    finally:
        buf = None  # noqa: F841 — drop the exported view before close
        try:
            shm.close()
        except BufferError:
            pass


class DecodePool:
    """N video sources decoded by worker processes into shared memory.

    workers: decode processes (default min(n_sources, cpu_count)).
    slots_per_stream: each stream's in-flight frame quota (default 4).
    slot_bytes: frame capacity per slot (default 1080p BGR; larger
    sources drop out at decode time — pass explicitly for >1080p).
    timeout_ms: per-round stall bound for streams that have delivered.
    startup_timeout_ms: first-delivery grace while the worker is alive.
    """

    def __init__(self, sources: Sequence, workers: Optional[int] = None,
                 slot_bytes: Optional[int] = None,
                 slots_per_stream: int = 4, timeout_ms: int = 10000,
                 startup_timeout_ms: int = 120000,
                 start_method: Optional[str] = None):
        from multiprocessing import shared_memory

        n = len(sources)
        if n == 0:
            raise ValueError("DecodePool needs at least one source")
        self.timeout_ms = timeout_ms
        # a stream that has NEVER delivered is "connecting", not "stalled":
        # worker spawn + numpy/cv2 imports on a loaded host (or an rtsp
        # handshake) routinely exceed timeout_ms, and dropping every camera
        # at startup served zero frames. While the owning worker process is
        # alive, first delivery gets this larger grace instead.
        self.startup_timeout_ms = max(startup_timeout_ms, timeout_ms)
        self.n_streams = n
        workers = max(1, min(workers or (os.cpu_count() or 1), n))
        slot_bytes = slot_bytes or 1920 * 1080 * 3
        self.slot_bytes = slot_bytes
        self.slots_per_stream = slots_per_stream

        if start_method is None:
            # forkserver: no fork-from-a-jax-threaded-parent hazards AND
            # cheap per-worker start (the server is the only new exec)
            start_method = ("forkserver"
                            if "forkserver" in mp.get_all_start_methods()
                            else "spawn")
        ctx = mp.get_context(start_method)
        if start_method == "forkserver":
            # the server's DEFAULT preload list is ['__main__'] — that
            # re-executes the caller's script inside the server process;
            # workers import this module themselves, nothing to preload
            ctx.set_forkserver_preload([])

        self._shm = shared_memory.SharedMemory(
            create=True, size=slot_bytes * slots_per_stream * n)
        self._buf = np.frombuffer(self._shm.buf, np.uint8)
        # per-stream slot ownership: stream sid owns slots
        # [sid*q, (sid+1)*q) and its own free/filled FIFO pair
        self._free_qs = {sid: ctx.Queue() for sid in range(n)}
        self._filled_qs = {sid: ctx.Queue() for sid in range(n)}
        for sid in range(n):
            for k in range(slots_per_stream):
                self._free_qs[sid].put(sid * slots_per_stream + k)
        self._stop = ctx.Event()
        self._procs: List = []
        self._proc_of: Dict[int, object] = {}
        self._closed = False

        assign: List[Tuple[List, List[int]]] = [([], [])
                                                for _ in range(workers)]
        for sid, src in enumerate(sources):
            assign[sid % workers][0].append(src)
            assign[sid % workers][1].append(sid)

        scrubbed = {}
        for k in _SCRUB_ENV:
            if k in os.environ:
                scrubbed[k] = os.environ.pop(k)
        try:
            for srcs, sids in assign:
                if not srcs:
                    continue
                p = ctx.Process(
                    target=_worker_main,
                    args=(srcs, sids, self._shm.name, slot_bytes,
                          {s: self._free_qs[s] for s in sids},
                          {s: self._filled_qs[s] for s in sids},
                          self._stop),
                    daemon=True)
                p.start()
                self._procs.append(p)
                for s in sids:
                    self._proc_of[s] = p
        finally:
            os.environ.update(scrubbed)
        self.n_workers = len(self._procs)
        self.frames_out = 0
        # per-stream native frame dims (h, w), learned from each stream's
        # first decoded frame — consumers (multistream writers) need the
        # stream's OWN size, not the padded batch max
        self.stream_dims: Dict[int, Tuple[int, int]] = {}
        # per-stream source frame rate, for consumers writing annotated
        # video (a hardcoded fps makes 30 fps cameras play 20% slow)
        self.stream_fps: Dict[int, float] = {}
        self._t0 = time.monotonic()

    # ------------------------------------------------------------ consume

    def __iter__(self):
        live = set(range(self.n_streams))
        started: set = set()   # streams that have ever delivered (or eos'd)
        hard_deadline = time.monotonic() + self.startup_timeout_ms / 1000
        while live:
            got: Dict[int, Tuple[int, int, int, float]] = {}
            # wait on every live stream CONCURRENTLY: each gets the full
            # timeout measured from round start, but the deadlines run in
            # parallel, so a round is bounded by ONE timeout_ms even with
            # several stalled cameras (sequential full-timeout waits made
            # a round cost n_stalled * timeout before healthy frames
            # were delivered). Polling slice is well under a frame
            # interval, so healthy-stream latency is unaffected.
            pending = set(live)
            deadline = time.monotonic() + self.timeout_ms / 1000
            while pending:
                progressed = False
                for sid in sorted(pending):
                    try:
                        msg = self._filled_qs[sid].get_nowait()
                    except _queue.Empty:
                        continue
                    progressed = True
                    pending.discard(sid)
                    started.add(sid)
                    if msg is None:
                        live.discard(sid)  # stream ended (eos)
                    else:
                        got[sid] = msg
                if not pending:
                    break
                now = time.monotonic()
                if now >= deadline:
                    # streams that have delivered before are genuinely
                    # stalled; never-started streams whose worker is still
                    # alive are CONNECTING — give them the startup grace
                    # (one shared hard deadline, so a hung source can't
                    # wedge iteration forever)
                    stalled = {s for s in pending
                               if s in started
                               or not self._proc_of[s].is_alive()
                               or now >= hard_deadline}
                    if stalled:
                        live -= stalled
                        pending -= stalled
                    if not pending or got:
                        # serve what we have; still-connecting streams
                        # join in a later round
                        break
                if not progressed:
                    time.sleep(0.005)
            if not got:
                return   # every remaining stream ended or stalled
            ready = sorted(got)
            for s in ready:
                self.stream_dims.setdefault(s, (got[s][1], got[s][2]))
                self.stream_fps.setdefault(s, got[s][3])
            h = max(got[s][1] for s in ready)
            w = max(got[s][2] for s in ready)
            batch = np.zeros((len(ready), h, w, 3), np.uint8)
            for bi, sid in enumerate(ready):
                slot, fh, fw, _ = got[sid]
                view = self._buf[slot * self.slot_bytes:
                                 slot * self.slot_bytes + fh * fw * 3]
                batch[bi, :fh, :fw] = view.reshape(fh, fw, 3)
                self._free_qs[sid].put(slot)
            # a suspended generator frame must not pin a shared-memory
            # view across the yield: it keeps the mmap "exported" past
            # release(), and SharedMemory.__del__ then raises BufferError
            # at GC time (an unraisable warning in every consumer suite)
            del view  # noqa: F821 — ready is never empty here
            self.frames_out += len(ready)
            yield batch, ready

    @property
    def aggregate_fps(self) -> float:
        dt = time.monotonic() - self._t0
        return self.frames_out / dt if dt > 0 else 0.0

    # ------------------------------------------------------------ cleanup

    def release(self, join_timeout: float = 5.0):
        if self._closed:
            return
        self._closed = True
        self._stop.set()
        deadline = time.monotonic() + join_timeout
        # drain filled queues so workers blocked on a put can exit, and
        # refill free queues so workers blocked on a get see the stop event
        while any(p.is_alive() for p in self._procs) \
                and time.monotonic() < deadline:
            for sid in range(self.n_streams):
                try:
                    self._filled_qs[sid].get_nowait()
                except _queue.Empty:
                    pass
            for p in self._procs:
                p.join(timeout=0.02)
        for p in self._procs:
            if p.is_alive():
                p.terminate()
                p.join(timeout=1.0)
        self._buf = None    # drop the exported view or shm.close() raises
        import gc

        gc.collect()        # free suspended __iter__ frames holding views
        try:
            self._shm.close()
        except BufferError:
            pass            # a caller still holds a view; unlink anyway
        try:
            self._shm.unlink()
        except Exception:
            pass

    def __del__(self):
        try:
            self.release(join_timeout=1.0)
        except Exception:
            pass
