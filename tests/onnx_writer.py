"""Test-side alias for the package's ONNX protobuf encoder.

The encoder graduated from a test fixture into a package module when the
exporter landed (models/onnx_export.py builds deployable graphs with it);
tests keep importing from here.
"""
from scrfd_arcface_facerecognition_tpu.models.onnx_write import (  # noqa: F401
    _DTYPE_CODE, encode_attr_float, encode_attr_int, encode_attr_ints,
    encode_attr_string, encode_model, encode_node, encode_tensor)
