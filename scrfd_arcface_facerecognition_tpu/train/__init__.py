"""Training: the reference performs inference only; a complete framework
must be able to (re)train both halves of its model stack, so this package
provides TPU-native trainers for each:

- ArcFace embedder (arcface_train.py): margin-softmax with data parallelism
  over the image batch ('data' mesh axis) and the classifier matrix
  W [D, num_classes] sharded over 'model' (for 600k identities W is
  1.2 GB and must not be replicated). GSPMD sharding constraints + jit:
  XLA inserts the psum/all_gather for the cross-shard softmax. Partial FC
  (arXiv:2010.05222, the technique behind the released w600k weights) is
  available via ArcFaceTrainer(sample_rate=...): each step's softmax runs
  over the batch positives + a sampled negative subset, shrinking logits
  and head-gradient work by the sample rate.

- SCRFD detector (scrfd_train.py): ATSS-style assignment + Quality Focal /
  DIoU / landmark smooth-L1 losses, data-parallel over frames, all
  static-shape (padded gt with validity masks).
"""

from .arcface_train import (
    ArcFaceTrainer, TrainState, arcface_margin_logits, softmax_xent,
    partial_fc_sample, verification_metrics, evaluate_embedder,
)
from .scrfd_train import (
    SCRFDTrainer, SCRFDTrainState, SCRFDLossConfig, scrfd_loss, atss_assign,
    diou_loss, quality_focal_loss, pairwise_iou, synthetic_detection_batch,
)
from .schedules import make_lr_schedule
from .detection_data import (
    Annotation, parse_wider_annotations, batches_from_annotations,
    letterbox_example, average_precision, evaluate_detector,
)

__all__ = ["ArcFaceTrainer", "TrainState", "arcface_margin_logits",
           "partial_fc_sample", "verification_metrics", "evaluate_embedder",
           "softmax_xent", "SCRFDTrainer", "SCRFDTrainState",
           "SCRFDLossConfig", "scrfd_loss", "atss_assign", "diou_loss",
           "quality_focal_loss", "pairwise_iou", "synthetic_detection_batch",
           "Annotation", "parse_wider_annotations",
           "batches_from_annotations", "letterbox_example",
           "average_precision", "evaluate_detector", "make_lr_schedule"]
