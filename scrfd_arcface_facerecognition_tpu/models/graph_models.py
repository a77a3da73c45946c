"""Pipeline adapters for ONNX-graph-executed models.

Wrap an OnnxModel (models/onnx_exec.py) in the `.apply(variables, x)`
interface the pipeline uses, mapping the graph's declared outputs onto the
pipeline's contract:

- SCRFD: 9 outputs ordered [score x3, bbox x3, kps x3]
  (/root/reference/models/scrfd.py:89-94). Rather than trusting declared
  order, each output is classified by shape — N = num_anchors*(H/s)*(W/s)
  picks the stride, C in {1, 4, 10} picks the kind — so any released
  variant maps correctly regardless of graph output naming.
- ArcFace: single (B, 512) output (/root/reference/models/arcface.py:26).

When `Detector`/`Embedder` are given an `onnx_path`, these adapters replace
the hand-written Flax modules: the graph itself is the model, making
numerical agreement with the file structural rather than hoped-for.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple


from .onnx_exec import OnnxModel, onnx_model


class SCRFDGraphModule:
    """SCRFD from an ONNX graph; .apply returns the head dict the decode
    stage consumes (pipeline/detector.py:44-66)."""

    def __init__(self, model: OnnxModel, strides=(8, 16, 32),
                 num_anchors: int = 2):
        self.model = model
        self.strides = tuple(strides)
        self.num_anchors = num_anchors
        self.variables = model.variables

    def _classify(self, shapes: List[Tuple[int, ...]], hw: Tuple[int, int]):
        """output index -> (kind, stride_idx) from static shapes."""
        h, w = hw
        n_of_stride = {self.num_anchors * (h // s) * (w // s): si
                       for si, s in enumerate(self.strides)}
        kind_of_c = {1: "scores", 4: "bboxes", 10: "kps"}
        mapping = {}
        for i, shp in enumerate(shapes):
            if len(shp) != 3 or shp[1] not in n_of_stride \
                    or shp[2] not in kind_of_c:
                raise ValueError(
                    f"output {i} shape {shp} does not match the SCRFD "
                    f"9-output contract for input {hw}")
            mapping[i] = (kind_of_c[shp[2]], n_of_stride[shp[1]])
        if len(mapping) != 9:
            raise ValueError(f"expected 9 outputs, got {len(shapes)}")
        return mapping

    def apply(self, variables, x) -> Dict[str, List]:
        outs = self.model.apply(variables, x)
        shapes = [tuple(o.shape) for o in outs]
        mapping = self._classify(shapes, tuple(x.shape[1:3]))
        result = {"scores": [None] * 3, "bboxes": [None] * 3,
                  "kps": [None] * 3}
        for i, o in enumerate(outs):
            kind, si = mapping[i]
            result[kind][si] = o
        return result


class ArcFaceGraphModule:
    """ArcFace from an ONNX graph; .apply returns (B, 512) embeddings."""

    def __init__(self, model: OnnxModel):
        self.model = model
        self.variables = model.variables

    def apply(self, variables, x):
        outs = self.model.apply(variables, x)
        emb = outs[0]
        if emb.ndim != 2:
            raise ValueError(f"unexpected embedding shape {emb.shape}")
        return emb


def scrfd_from_onnx(path: str, dtype: Any = None) -> SCRFDGraphModule:
    return SCRFDGraphModule(onnx_model(path, dtype=dtype))


def arcface_from_onnx(path: str, dtype: Any = None) -> ArcFaceGraphModule:
    return ArcFaceGraphModule(onnx_model(path, dtype=dtype))
