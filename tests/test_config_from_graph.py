"""Config-from-graph inference (models/config_from_graph.py).

VERDICT r3 item 1: the ordered importer previously required released graphs
to match hand-guessed channel widths (SCRFD widths are NAS-derived,
arXiv:2105.04714). These tests prove the load path now derives the
architecture FROM the graph:

- inference on the five full-scale stand-ins reproduces the registry
  configs exactly (the registry is right for the stand-ins — inference
  must agree);
- width/depth-MUTATED stand-ins (every knob perturbed away from
  SCRFD_CONFIGS/ARCFACE_CONFIGS, including the head GroupNorm group count)
  import through `flax_from_onnx` and match the torch oracle numerically;
- a mutated graph round-trips through the exporter and the executor;
- the OLD registry-bound path fails loudly on the same mutated graph —
  the exact failure mode config inference removes.
"""
import os
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from torch_export import (MUTATED_STAND_INS, STAND_INS, calibrate_detector,
                          export_onnx, seeded)  # noqa: E402
from scrfd_arcface_facerecognition_tpu.models.onnx_proto import (
    load_onnx)  # noqa: E402
from scrfd_arcface_facerecognition_tpu.models import (
    config_from_graph as cfg_mod)  # noqa: E402
from scrfd_arcface_facerecognition_tpu.models.scrfd import (
    SCRFD_CONFIGS)  # noqa: E402
from scrfd_arcface_facerecognition_tpu.models.arcface import (
    ARCFACE_CONFIGS)  # noqa: E402

pytestmark = pytest.mark.slow


def _export(name, ctor, tmp_path, input_hw):
    tm = seeded(ctor(), seed=zlib.crc32(name.encode()) % 1000)
    if hasattr(tm, "scales"):
        # same regime as verify_release: calibrated box/kps magnitudes
        # (raw seeded weights blow up activations and the oracle diff
        # measures float reassociation, not import correctness)
        tm = calibrate_detector(tm)
    path = str(tmp_path / f"{name}.onnx")
    export_onnx(tm, torch.randn(1, 3, *input_hw), path)
    return tm, path


# --------------------------------------------------- inference == registry


@pytest.mark.parametrize("name", ["det_500m", "det_2.5g", "det_10g"])
def test_infer_scrfd_matches_registry(name, tmp_path):
    # export at a reduced canvas: config inference is purely structural
    _, path = _export(name, STAND_INS[name], tmp_path, (320, 320))
    cfg = cfg_mod.infer_config(load_onnx(path), name=name)
    want = SCRFD_CONFIGS[name]
    assert cfg.stem_filters == want.stem_filters
    assert tuple(cfg.stage_blocks) == tuple(want.stage_blocks)
    assert tuple(cfg.stage_filters) == tuple(want.stage_filters)
    assert cfg.neck_filters == want.neck_filters
    assert cfg.head_stacks == want.head_stacks
    assert cfg.head_filters == want.head_filters
    assert cfg.num_anchors == want.num_anchors
    assert cfg.num_kps == want.num_kps
    assert cfg.gn_groups == want.gn_groups
    assert tuple(cfg.strides) == tuple(want.strides)


@pytest.mark.parametrize("name", ["w600k_mbf", "w600k_r50"])
def test_infer_arcface_matches_registry(name, tmp_path):
    _, path = _export(name, STAND_INS[name], tmp_path, (112, 112))
    cfg = cfg_mod.infer_config(load_onnx(path), name=name)
    want = ARCFACE_CONFIGS[name]
    assert cfg.arch == want.arch
    assert cfg.emb_dim == want.emb_dim
    if cfg.arch == "iresnet":
        assert tuple(cfg.stage_blocks) == tuple(want.stage_blocks)
        assert tuple(cfg.stage_filters) == tuple(want.stage_filters)
    else:
        assert tuple(cfg.mbf_blocks) == tuple(want.mbf_blocks)
        # the explicit inferred widths equal the scale-derived defaults
        assert cfg.mbf_widths() == want.mbf_widths()


# ------------------------------------------------ mutated imports: parity


def _forward_pair(tm, model, variables, shape):
    x = np.random.RandomState(0).randn(*shape).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    return want, got


def test_mutated_detector_imports_and_matches(tmp_path):
    tm, path = _export("det_10g_mut", MUTATED_STAND_INS["det_10g"],
                       tmp_path, (320, 320))
    model, variables = cfg_mod.flax_from_onnx(path, input_size=(320, 320))
    cfg = model.config
    # every knob differs from the registry guess
    reg = SCRFD_CONFIGS["det_10g"]
    assert cfg.stem_filters != reg.stem_filters
    assert tuple(cfg.stage_blocks) != tuple(reg.stage_blocks)
    assert cfg.gn_groups == 8 != reg.gn_groups
    want, got = _forward_pair(tm, model, variables, (1, 3, 320, 320))
    want_l = [w.numpy() for w in want]
    got_l = [np.asarray(t) for k in ("scores", "bboxes", "kps")
             for t in got[k]]
    worst = max(float(np.abs(g - w).max()) for g, w in zip(got_l, want_l))
    assert worst < 1e-2, worst


@pytest.mark.parametrize("name", ["w600k_mbf", "w600k_r50"])
def test_mutated_embedder_imports_and_matches(name, tmp_path):
    tm, path = _export(f"{name}_mut", MUTATED_STAND_INS[name], tmp_path,
                       (112, 112))
    model, variables = cfg_mod.flax_from_onnx(path)
    want, got = _forward_pair(tm, model, variables, (1, 3, 112, 112))
    w = want.numpy().ravel()
    g = np.asarray(got).ravel()
    cos = float(np.dot(g, w) / (np.linalg.norm(g) * np.linalg.norm(w)))
    assert cos > 1 - 1e-3, cos


# -------------------------------------------- mutated export round-trip


def test_mutated_embedder_export_roundtrip(tmp_path):
    from scrfd_arcface_facerecognition_tpu.models.onnx_export import (
        export_model)
    from scrfd_arcface_facerecognition_tpu.models.onnx_exec import (
        onnx_model)

    tm, path = _export("w600k_mbf_rt", MUTATED_STAND_INS["w600k_mbf"],
                       tmp_path, (112, 112))
    model, variables = cfg_mod.flax_from_onnx(path)
    rt = str(tmp_path / "mbf_rt.onnx")
    export_model(model, variables, rt)
    m2 = onnx_model(rt)
    x = np.random.RandomState(1).randn(1, 3, 112, 112).astype(np.float32)
    want = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)))).ravel()
    out = m2.apply(m2.variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(out[0] if isinstance(out, (list, tuple))
                     else out).ravel()
    cos = float(np.dot(got, want)
                / (np.linalg.norm(got) * np.linalg.norm(want)))
    assert cos > 1 - 1e-3, cos


# ------------------------------------- the failure mode inference removes


def test_registry_bound_path_fails_loudly_on_mutated_graph(tmp_path):
    from scrfd_arcface_facerecognition_tpu.models import onnx_import as oi
    from scrfd_arcface_facerecognition_tpu.models.scrfd import build_scrfd

    _, path = _export("det_10g_mut2", MUTATED_STAND_INS["det_10g"],
                      tmp_path, (320, 320))
    with pytest.raises(oi.ImportError_):
        oi.load_scrfd_weights(build_scrfd("det_10g"), path,
                              input_size=(320, 320))


# ------------------------------------------------- inference error paths


def test_wrong_family_is_rejected(tmp_path):
    _, path = _export("mbf_as_det", STAND_INS["w600k_mbf"], tmp_path,
                      (112, 112))
    g = load_onnx(path)
    with pytest.raises(cfg_mod.ConfigInferenceError):
        cfg_mod.infer_scrfd_config(g)
