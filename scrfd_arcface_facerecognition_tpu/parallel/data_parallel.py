"""Frame data-parallelism: shard batches on the 'data' mesh axis.

The fused pipeline program (pipeline/face_pipeline.py) is shape-polymorphic
over batch; under a sharded-batch input jit partitions every stage (letterbox
matmuls, convs, NMS vmap, warp gathers, gallery matmul) across the mesh with
zero collectives — frames are independent. This is the TPU replacement for
the reference's ThreadPoolExecutor concurrency (SURVEY.md §2.3).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_frames(frames, mesh: Mesh, axis: str = "data"):
    """Place (B, H, W, 3) frames batch-sharded over the mesh."""
    return jax.device_put(frames, NamedSharding(mesh, P(axis)))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, gallery) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
