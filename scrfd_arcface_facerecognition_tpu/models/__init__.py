"""Flax model definitions: SCRFD detector family + ArcFace embedders.

TPU-native re-implementations of the five ONNX graphs shipped by the
reference (SURVEY.md §2.4): det_500m / det_2.5g / det_10g (SCRFD) and
w600k_mbf / w600k_r50 (ArcFace). NHWC layout, f32 params with optional
bf16 compute, fully static shapes.
"""

from .layers import PReLU, ConvBN, conv_kernel_init
from .arcface import (
    ArcFaceConfig, IResNet, MobileFaceNet, ARCFACE_CONFIGS, build_arcface,
)
from .scrfd import SCRFDConfig, SCRFDNet, SCRFD_CONFIGS, build_scrfd
from .checkpoints import load_inference_variables
from .config_from_graph import flax_from_onnx, infer_config

__all__ = [
    "PReLU", "ConvBN", "conv_kernel_init",
    "ArcFaceConfig", "IResNet", "MobileFaceNet", "ARCFACE_CONFIGS", "build_arcface",
    "SCRFDConfig", "SCRFDNet", "SCRFD_CONFIGS", "build_scrfd",
    "load_inference_variables", "flax_from_onnx", "infer_config",
]
