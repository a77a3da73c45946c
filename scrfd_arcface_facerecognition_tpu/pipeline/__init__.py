"""Fused inference pipelines: one jitted program per stage chain.

The reference's hot loop does 2 host->GPU ONNX round-trips per frame plus
numpy NMS and Python target scans (SURVEY.md §3.1). Here the entire chain
frames -> letterbox -> SCRFD -> decode+NMS -> umeyama+warp -> ArcFace ->
L2-norm -> gallery match runs as a single XLA program on HBM-resident
batches; the only host work is video decode and drawing.
"""

from .detector import Detector, Detections
from .embedder import Embedder
from .face_pipeline import FacePipeline, PipelineOutput

__all__ = ["Detector", "Detections", "Embedder", "FacePipeline", "PipelineOutput"]
