"""Disaggregated two-stage serving: detector chips feed embedder chips.

The fused pipeline's stages scale on different axes: detect cost is per
FRAME (a fixed letterboxed conv stack regardless of content), embed cost
is per FACE (a crowd frame costs up to max_det ArcFace forwards, an empty
frame none). Co-locating both stages on every chip (the DP deployment,
parallel/data_parallel.py) provisions every chip for the worst case of
BOTH stages. Disaggregation — the LLM-serving prefill/decode split
applied to vision — pins the SCRFD weights on one device group and the
ArcFace weights + gallery on another, each group sized for ITS stage's
load (lobby cameras: many frames, few faces -> more detect chips;
turnstile cameras: every frame dense with faces -> more embed chips).
Batches pipeline through both groups concurrently: while batch i embeds
on the embed group, batch i+1 detects on the detect group, and the stage
handoff (frames + detections + letterbox canvas) moves device-to-device
over ICI, never through the host.

The reference runs both ONNX sessions back-to-back in one process per
frame (main.py:130-134) and has no pipeline-parallel analog (SURVEY.md
§2.3 "PP: absent") — this module is the framework's PP axis, validated
on the virtual 8-device mesh (tests/test_parallel.py) and in the
multichip dryrun (__graft_entry__.py).
"""
from __future__ import annotations

from collections import deque
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh
from .data_parallel import replicate


def split_devices(n_det: Optional[int] = None, devices=None):
    """Partition devices into (detect_group, embed_group).

    Default is an even split. Size the detect group up for frame-heavy /
    face-light workloads and the embed group up for dense-face ones.
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < 2:
        raise ValueError("disaggregation needs at least 2 devices")
    if n_det is None:
        n_det = len(devices) // 2
    if not 0 < n_det < len(devices):
        raise ValueError(f"n_det={n_det} must leave both groups non-empty "
                         f"({len(devices)} devices)")
    return devices[:n_det], devices[n_det:]


class DisaggPipeline:
    """A FacePipeline deployed across two device groups (detect | embed).

    Wraps an existing :class:`FacePipeline` — same jit closures, same
    numerics, same PipelineOutput — but stage 1 runs data-parallel over
    ``det_devices`` and stage 2 (+ gallery match) over ``emb_devices``.

    >>> det_g, emb_g = split_devices()          # or explicit lists
    >>> server = DisaggPipeline(pipe, det_g, emb_g)
    >>> for out in server.process_stream(batches):  # pipelined handoff
    ...     ...
    """

    SHARD_AUTO_BYTES = 64 << 20   # shard past 64 MB (32k rows at 512 f32)

    def __init__(self, pipe, det_devices: Sequence, emb_devices: Sequence,
                 axis: str = "data", shard_gallery: str = "auto"):
        # shard_gallery: "auto" | True | False — row-shard the gallery over
        # the embed group instead of replicating it. Replication caps the
        # deployment at galleries that fit one chip's HBM alongside ArcFace
        # (exactly the regime where disagg is least needed); sharding
        # composes the PP split with the sharded-gallery collective: GSPMD
        # partitions the match matmul and inserts the argmax all-reduce
        # (numerically identical — tests/test_parallel.py).
        overlap = set(map(id, det_devices)) & set(map(id, emb_devices))
        if overlap:
            raise ValueError("det/emb device groups overlap — that is the "
                             "co-located DP deployment; use shard_frames")
        if shard_gallery not in ("auto", True, False):
            raise ValueError(f"shard_gallery={shard_gallery!r}")
        self.pipe = pipe
        self.axis = axis
        self.shard_gallery = shard_gallery
        self.det_mesh = make_mesh((len(det_devices),), (axis,),
                                  devices=det_devices)
        self.emb_mesh = make_mesh((len(emb_devices),), (axis,),
                                  devices=emb_devices)
        self._det_vars = replicate(pipe.detector.variables, self.det_mesh)
        self._det_src = pipe.detector.variables
        self._emb_state = None   # (src_vars, src_gallery, placed-tuple)

    # ------------------------------------------------------------ placement

    def _emb_placed(self):
        """(None, emb_vars, gallery, gallery_valid) on the embed mesh.

        Re-placed whenever the pipeline's live embedder weights or gallery
        change (same staleness rule as FacePipeline._placed: the cache
        stores the SOURCE objects it replicated from).
        """
        pipe = self.pipe
        st = self._emb_state
        if (st is None or st[0] is not pipe.embedder.variables
                or st[1] is not pipe._gallery):
            gallery, gvalid = pipe._gallery, pipe._gallery_valid
            shard = self.shard_gallery
            if shard == "auto":
                shard = gallery.nbytes > self.SHARD_AUTO_BYTES
            if shard:
                # row-shard over the embed group (pad rows to divide the
                # axis; padding is valid=False so the match never sees it)
                import jax.numpy as jnp

                n = self.emb_mesh.shape[self.axis]
                g, d = gallery.shape
                gp = -(-g // n) * n
                if gp != g:
                    gallery = jnp.zeros((gp, d), gallery.dtype
                                        ).at[:g].set(gallery)
                    gvalid = jnp.zeros((gp,), bool).at[:g].set(gvalid)
                gallery_p = jax.device_put(
                    gallery, NamedSharding(self.emb_mesh, P(self.axis, None)))
                gvalid_p = jax.device_put(
                    gvalid, NamedSharding(self.emb_mesh, P(self.axis)))
            else:
                gallery_p = replicate(gallery, self.emb_mesh)
                gvalid_p = replicate(gvalid, self.emb_mesh)
            placed = (None,
                      replicate(pipe.embedder.variables, self.emb_mesh),
                      gallery_p, gvalid_p)
            st = (pipe.embedder.variables, pipe._gallery, placed)
            self._emb_state = st
        return st[2]

    def _refresh_det_vars(self):
        if self._det_src is not self.pipe.detector.variables:
            self._det_vars = replicate(self.pipe.detector.variables,
                                       self.det_mesh)
            self._det_src = self.pipe.detector.variables

    def _handoff(self, tree, batch):
        """Move a stage-1 output pytree onto the embed mesh: leaves with a
        leading batch dim stay batch-sharded, the rest replicate. This is
        the PP boundary — an ICI device-to-device copy."""
        data = NamedSharding(self.emb_mesh, P(self.axis))
        rep = NamedSharding(self.emb_mesh, P())
        def put(x):
            if x is None:
                return None
            sh = data if (getattr(x, "ndim", 0) >= 1
                          and x.shape[0] == batch) else rep
            return jax.device_put(x, sh)
        return jax.tree.map(put, tree)

    # -------------------------------------------------------------- serving

    def _dispatch(self, frames, max_num, metric):
        import jax.numpy as jnp

        if not isinstance(frames, jax.Array):
            frames = jnp.asarray(np.asarray(frames))
        if frames.ndim == 3:
            frames = frames[None]
        b = frames.shape[0]
        for name, mesh in (("detect", self.det_mesh),
                           ("embed", self.emb_mesh)):
            n = mesh.devices.size
            if b % n:
                raise ValueError(
                    f"batch {b} not divisible by the {name} group's "
                    f"{n} devices")
        self._refresh_det_vars()
        f_det = jax.device_put(frames,
                               NamedSharding(self.det_mesh, P(self.axis)))
        detect_fn, _ = self.pipe._fn(tuple(frames.shape[1:3]), max_num,
                                     metric)
        det = detect_fn(self._det_vars, f_det)
        # stage handoff: frames go host->emb group; detections det->emb
        f_emb = jax.device_put(frames,
                               NamedSharding(self.emb_mesh, P(self.axis)))
        det_emb = self._handoff(det, b)
        return f_emb, det_emb, self._emb_placed()

    def __call__(self, frames, max_num: int = 0, metric: str = "max"):
        return self.pipe._finish(*self._dispatch(frames, max_num, metric))

    def process_stream(self, frames_iter, max_num: int = 0,
                       metric: str = "max", depth: int = 2):
        """Pipelined disaggregated serving: yields PipelineOutput per batch.

        With ``depth`` batches in flight, batch i+1's detect program runs
        on the detect group WHILE batch i's embed program runs on the
        embed group — the two stages overlap across device groups, which
        is the throughput case for disaggregation (a single batch pays
        the handoff latency without the overlap)."""
        pending = deque()
        for frames in frames_iter:
            pending.append(self._dispatch(frames, max_num, metric))
            if len(pending) > max(1, depth):
                yield self.pipe._finish(*pending.popleft())
        while pending:
            yield self.pipe._finish(*pending.popleft())

    def match_names(self, out):
        return self.pipe.match_names(out)
