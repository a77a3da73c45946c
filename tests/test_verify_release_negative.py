"""Real-weight-day negative paths: bad release files must fail LOUDLY
with a NAMED diagnosis, through the full sign-off entry point.

VERDICT r4 weak #6: verify_release proved good graphs pass, but nothing
proved bad inputs produce a diagnosable verdict instead of a stack
trace. On real-weight day the five files arrive via the reference's
download.sh:12-16; the failure classes below (truncated download, not
ONNX at all, unsupported op/opset, wrong graph kind under an expected
filename, wrong output arity) are each driven BOTH through the
preflight unit (models/preflight.py) AND through `verify_release.main()`
itself, asserting exit code 2 and the class name on stdout.
docs/RUNBOOK.md maps each class to its remedy.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from scrfd_arcface_facerecognition_tpu.models.onnx_write import (
    encode_attr_ints, encode_model, encode_node)
from scrfd_arcface_facerecognition_tpu.models.preflight import (
    ReleaseFileError, preflight_graph)

_TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")


# ------------------------------------------------------------ bad files


def _conv_graph(path: str, n_outputs: int = 1, op: str = "Conv",
                group: int = 1) -> str:
    """Tiny parseable graph: x -> op -> y[, y2...]. One Conv keeps the
    family detector on the 'iresnet' branch (1 output, no grouped conv)."""
    attrs = []
    if op == "Conv":
        attrs = [encode_attr_ints("kernel_shape", [3, 3]),
                 encode_attr_ints("strides", [1, 1]),
                 encode_attr_ints("pads", [1, 1, 1, 1])]
        if group > 1:
            from scrfd_arcface_facerecognition_tpu.models.onnx_write import (
                encode_attr_int)

            attrs.append(encode_attr_int("group", group))
    outs = [f"y{i}" for i in range(n_outputs)]
    nodes = [encode_node(op, ["x", "w"] if op == "Conv" else ["x"],
                         [outs[0]], attrs=attrs)]
    for i in range(1, n_outputs):
        nodes.append(encode_node("Relu", [outs[0]], [outs[i]]))
    init = {"w": np.zeros((4, 1, 3, 3), np.float32)} if op == "Conv" else {}
    with open(path, "wb") as f:
        f.write(encode_model(nodes, init, ["x"], outs))
    return path


CLASSES = {
    # kind -> (file builder, expect_kind to preflight with)
    "missing_file": (lambda p: p, "det"),                    # never created
    "empty_file": (lambda p: open(p, "wb").close() or p, "det"),
    "not_onnx": (lambda p: (open(p, "wb").write(b"\x89PNG" + b"\x00" * 500),
                            p)[1], "det"),
    "corrupt_or_truncated": ("truncate", "det"),
    "unsupported_op": (lambda p: _conv_graph(p, op="Atan"), "det"),
    "wrong_graph_kind": (lambda p: _conv_graph(p, n_outputs=1), "det"),
    "output_arity": (lambda p: _conv_graph(p, n_outputs=3), "det"),
}


def _make_bad(kind: str, path: str) -> str:
    builder, _ = CLASSES[kind]
    if builder == "truncate":
        _conv_graph(path)
        raw = open(path, "rb").read()
        with open(path, "wb") as f:       # cut mid-initializer: parses
            f.write(raw[: int(len(raw) * 0.6)])   # as protobuf garbage
        return path
    return builder(path)


# ------------------------------------------------------- unit: preflight


@pytest.mark.parametrize("kind", sorted(CLASSES))
def test_preflight_classifies(kind, tmp_path):
    path = _make_bad(kind, str(tmp_path / "det_500m.onnx"))
    with pytest.raises(ReleaseFileError) as ei:
        preflight_graph(path, CLASSES[kind][1])
    assert ei.value.kind == kind, (ei.value.kind, str(ei.value))
    # the message is the diagnosis: names the class and the file
    assert kind in str(ei.value) and "det_500m" in str(ei.value)


def test_preflight_rec_expectations(tmp_path):
    """A detector-shaped graph under an embedder name is wrong_graph_kind;
    a grouped-conv single-output graph passes as mobilefacenet."""
    det_like = _conv_graph(str(tmp_path / "w600k_r50.onnx"), n_outputs=6)
    with pytest.raises(ReleaseFileError) as ei:
        preflight_graph(det_like, "rec")
    assert ei.value.kind == "wrong_graph_kind"

    mbf_like = _conv_graph(str(tmp_path / "mbf.onnx"), group=4)
    # family detection says mobilefacenet; full config inference on this
    # toy graph cannot succeed -> the NAMED config_inference_failed class
    with pytest.raises(ReleaseFileError) as ei:
        preflight_graph(mbf_like, "rec")
    assert ei.value.kind == "config_inference_failed"


def test_preflight_passes_a_real_export(tmp_path):
    """Positive control: a graph the exporter emits preflights clean."""
    import jax

    from scrfd_arcface_facerecognition_tpu.models import build_arcface
    from scrfd_arcface_facerecognition_tpu.models.onnx_export import (
        export_arcface)

    m = build_arcface("w600k_mbf")
    v = m.init(jax.random.PRNGKey(0), np.zeros((1, 112, 112, 3),
                                               np.float32))
    path = str(tmp_path / "w600k_mbf.onnx")
    export_arcface(m, v, path)
    facts = preflight_graph(path, "rec")
    assert facts["family"] == "mobilefacenet" and facts["n_outputs"] == 1


# ------------------------------------- entry point: verify_release.main


ENTRY_CLASSES = ["empty_file", "not_onnx", "corrupt_or_truncated",
                 "unsupported_op", "wrong_graph_kind", "output_arity"]


@pytest.mark.parametrize("kind", ENTRY_CLASSES)
def test_signoff_entry_point_fails_loudly(kind, tmp_path, monkeypatch,
                                          capsys):
    """The ONE command of real-weight day (tools/verify_release.py) must
    exit 2 with 'SIGN-OFF FAIL' + the class name — not a traceback — when
    a released file is bad. The bad file sits under det_500m.onnx (first
    in the sign-off order) so the failure is reached before any stand-in
    parity work."""
    monkeypatch.syspath_prepend(_TOOLS)
    monkeypatch.syspath_prepend(os.path.dirname(__file__))
    import verify_release

    weights = tmp_path / "weights"
    weights.mkdir()
    _make_bad(kind, str(weights / "det_500m.onnx"))
    monkeypatch.setattr(sys, "argv", [
        "verify_release.py", "--backend", "cpu",
        "--weights", str(weights),
        "--images", "/root/reference/image_cache", "--n", "2",
        "--out", str(tmp_path / "PARITY.md")])
    rc = verify_release.main()
    out = capsys.readouterr().out
    assert rc == 2
    assert "SIGN-OFF FAIL" in out and kind in out, out
    assert "RUNBOOK" in out    # points the operator at the remedy table
