"""Device-mesh parallelism (SURVEY.md §2.3's TPU-native equivalents).

The reference has no distributed execution; its scaling axes are frame
batch B and gallery size G. Here those shard over a jax.sharding.Mesh:

- frame DP: batches sharded on a 'data' axis; each chip runs the full fused
  detect->embed->match program on its shard (data_parallel_pipeline);
- gallery sharding (the TP analog): the [G, 512] matrix is sharded over the
  'model' axis; matching is a local matmul + per-shard top-k + all_gather
  of the (k, score) candidates over ICI (sharded_top_k);
- stage disaggregation (the PP axis): detector weights on one device
  group, embedder + gallery on another, batches pipelined through both
  with the handoff over ICI (disagg.DisaggPipeline);
- communication is XLA collectives only — no custom transport.
"""

from .mesh import (make_mesh, make_hybrid_mesh, initialize_distributed,
                   local_device_count)
from .sharded_gallery import ShardedGallery, sharded_top_k
from .data_parallel import shard_frames, replicate
from .disagg import DisaggPipeline, split_devices

__all__ = ["make_mesh", "make_hybrid_mesh", "initialize_distributed",
           "local_device_count", "ShardedGallery",
           "sharded_top_k", "shard_frames", "replicate",
           "DisaggPipeline", "split_devices"]
