"""ArcFace training: margin-softmax with a class-sharded head.

The reference performs inference only; the w600k weights it consumes were
produced by ArcFace training (additive angular margin over a WebFace600K
class head). A complete framework must be able to (re)train/fine-tune its
embedders, so this module provides the TPU-native training path:

- data parallelism over the image batch ('data' mesh axis);
- the classifier matrix W [D, num_classes] sharded over the 'model' axis
  (partial-FC style tensor parallelism — for 600k identities W is 1.2 GB
  and must not be replicated);
- GSPMD sharding constraints + jit: XLA inserts the psum/all_gather for the
  cross-shard softmax; BatchNorm statistics sync across the global batch
  for free because the batch axis is just a sharded array axis.
"""

from .arcface_train import (
    ArcFaceTrainer, TrainState, arcface_margin_logits, softmax_xent,
)

__all__ = ["ArcFaceTrainer", "TrainState", "arcface_margin_logits",
           "softmax_xent"]
