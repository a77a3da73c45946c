"""Release-file preflight: classify bad graphs with a NAMED diagnosis.

On real-weight day the sign-off (tools/verify_release.py) receives five
downloaded files (the reference fetches them via download.sh:12-16) and
must fail LOUDLY AND DIAGNOSABLY — not with a parser traceback — when a
file is truncated, is not ONNX at all, uses an op the executor cannot
run, is the wrong KIND of graph under an expected filename, or has the
wrong output arity. This module is that gate; verify_release runs it on
every file before any parity work, and tests/test_verify_release_negative
drives each failure class through the full sign-off entry point.

Classes (ReleaseFileError.kind):
  missing_file | empty_file | not_onnx | corrupt_or_truncated |
  unsupported_op | wrong_graph_kind | output_arity |
  config_inference_failed

A det_500m graph renamed det_10g.onnx is intentionally NOT an error:
config-from-graph derives the architecture from the bytes
(models/config_from_graph.py), so any SCRFD-family graph loads under any
det_* name. Only cross-KIND swaps (an embedder under a det name, or vice
versa) are detectable and fatal.
"""
from __future__ import annotations

import os
from typing import Dict

from .onnx_exec import SUPPORTED_OPS
from .onnx_proto import OnnxGraph, load_onnx
from .config_from_graph import ConfigInferenceError, detect_family


class ReleaseFileError(Exception):
    """A release file failed preflight; .kind names the failure class."""

    def __init__(self, kind: str, path: str, detail: str):
        self.kind = kind
        self.path = path
        self.detail = detail
        super().__init__(f"[{kind}] {os.path.basename(path)}: {detail}")


def preflight_graph(path: str, expect_kind: str) -> Dict:
    """Validate one release file; raise ReleaseFileError with a named
    classification on any defect, return facts on success.

    expect_kind: 'det' (SCRFD: >=6 raw outputs) or 'rec' (embedder: one
    output). Returns {'family', 'n_nodes', 'n_outputs', 'unsupported': []}.
    """
    if expect_kind not in ("det", "rec"):
        raise ValueError(f"expect_kind must be det|rec, got {expect_kind!r}")
    if not os.path.exists(path):
        raise ReleaseFileError(
            "missing_file", path,
            "file does not exist — did the download finish? "
            "(reference fetch list: download.sh:12-16)")
    size = os.path.getsize(path)
    if size == 0:
        raise ReleaseFileError("empty_file", path,
                               "0 bytes — truncated download")

    try:
        graph = load_onnx(path)
    except Exception as e:
        msg = str(e)
        kind = ("not_onnx" if "no graph found" in msg
                else "corrupt_or_truncated")
        raise ReleaseFileError(
            kind, path,
            f"protobuf parse failed after {size} bytes: {msg} — "
            "re-download and compare checksums") from e
    return preflight_parsed(graph, path, expect_kind)


def preflight_parsed(graph: OnnxGraph, path: str,
                     expect_kind: str) -> Dict:
    """The post-parse checks of preflight_graph (shared entry for callers
    that already hold an OnnxGraph)."""
    if not graph.nodes:
        raise ReleaseFileError("corrupt_or_truncated", path,
                               "graph parsed but contains no nodes")

    unsupported = sorted({n.op_type for n in graph.nodes
                          if n.op_type not in SUPPORTED_OPS})
    if unsupported:
        raise ReleaseFileError(
            "unsupported_op", path,
            f"graph uses op(s) the executor cannot run: "
            f"{', '.join(unsupported)} — a newer export opset? "
            "Extend models/onnx_exec.py for these ops before sign-off")

    n_out = len(graph.outputs)
    try:
        family = detect_family(graph)
    except ConfigInferenceError as e:
        raise ReleaseFileError(
            "output_arity", path,
            f"{n_out} outputs match no supported family: {e}") from e

    actual_kind = "det" if family == "scrfd" else "rec"
    if actual_kind != expect_kind:
        raise ReleaseFileError(
            "wrong_graph_kind", path,
            f"expected a {'detector (SCRFD, >=6 outputs)' if expect_kind == 'det' else 'recognition embedder (1 output)'} "
            f"but the bytes are a {family} graph with {n_out} output(s) — "
            "files swapped under expected names?")

    # arity sanity within the family (SCRFD ships 3 strides x 3 heads)
    if expect_kind == "det" and n_out not in (6, 9, 15):
        raise ReleaseFileError(
            "output_arity", path,
            f"SCRFD-family graph with {n_out} outputs (expected 6, 9, or "
            "15 = strides x (cls,box[,kps])) — unsupported head layout")

    # the full architecture inference must succeed (it is what the Flax
    # load path will run; scrfd.py:38-47 is the only fixed contract)
    try:
        from .config_from_graph import infer_config

        infer_config(graph)
    except ConfigInferenceError as e:
        raise ReleaseFileError(
            "config_inference_failed", path,
            f"family {family} recognized but architecture inference "
            f"failed: {e} — the executor path (verify_release) still "
            "runs; file a gap for the Flax importer") from e

    return {"family": family, "n_nodes": len(graph.nodes),
            "n_outputs": n_out, "unsupported": []}
