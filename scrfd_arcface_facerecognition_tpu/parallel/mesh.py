"""Mesh construction helpers: single-slice, DCN-aware multi-slice, and the
multi-host process bootstrap.

The reference has no distributed execution at all (SURVEY.md §2.3); this is
the framework's ICI/DCN layer: galleries and frame batches shard over a
Mesh, XLA's collectives ride ICI inside a slice, and axes placed on the
slower DCN (cross-slice) dimension carry only the small/infrequent traffic
(e.g. replicated-gallery search fan-out), never the per-frame collectives.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def local_device_count() -> int:
    """Devices attached to THIS process (not the pod-wide count — callers
    size per-host batches with this)."""
    return jax.local_device_count()


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host bootstrap: jax.distributed.initialize with env fallbacks.

    On TPU pods the runtime discovers everything automatically
    (initialize() with no args); elsewhere the coordinator/process
    parameters come from arguments or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID. Returns True if a multi-process
    runtime came up, False when single-process (already initialized, or
    nothing to join) — callers can mesh over jax.devices() either way.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        else:
            jax.distributed.initialize()   # TPU pod auto-discovery
        return jax.process_count() > 1
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        return jax.process_count() > 1


def make_mesh(axis_sizes: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    make_mesh() -> 1-D 'data' mesh over all devices.
    make_mesh((2, 4), ('data', 'model')) -> 2x4 DPxTP mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(arr, tuple(axis_names))


def make_hybrid_mesh(ici_axis_sizes: Tuple[int, ...],
                     axis_names: Sequence[str],
                     dcn_axis: str = "replica",
                     num_slices: Optional[int] = None) -> Mesh:
    """DCN-aware mesh for galleries spanning pod slices.

    Layout: (dcn_axis, *axis_names) where dcn_axis strides across slices
    (the slow DCN dimension) and the ici axes tile within a slice, so the
    per-frame collectives (gallery top-k all_gather, DP psum) stay on ICI.
    Slice boundaries come from device.slice_index when the runtime reports
    them (multi-slice TPU); otherwise devices are split into equal
    contiguous groups (CPU/virtual-mesh testing, where process locality is
    the analog).

    make_hybrid_mesh((2, 4), ("data", "model"), num_slices=2)
        -> a (2, 2, 4) mesh with axes ("replica", "data", "model").
    """
    devices = jax.devices()
    slice_ids = [getattr(d, "slice_index", None) for d in devices]
    if any(s is None for s in slice_ids):
        if num_slices is None:
            num_slices = max(1, len(devices)
                             // int(np.prod(ici_axis_sizes)))
        per = len(devices) // num_slices
        groups = [devices[i * per:(i + 1) * per] for i in range(num_slices)]
    else:
        ids = sorted(set(slice_ids))
        groups = [[d for d, s in zip(devices, slice_ids) if s == sid]
                  for sid in ids]
        num_slices = len(groups)
    n_ici = int(np.prod(ici_axis_sizes))
    for g in groups:
        if len(g) < n_ici:
            raise ValueError(
                f"slice has {len(g)} devices, ici mesh needs {n_ici}")
    arr = np.asarray([g[:n_ici] for g in groups]).reshape(
        (num_slices, *ici_axis_sizes))
    return Mesh(arr, (dcn_axis, *tuple(axis_names)))
