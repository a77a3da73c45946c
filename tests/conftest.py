"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4: multi-chip behavior is tested on a fake mesh via
``--xla_force_host_platform_device_count=8`` so sharded gallery matching and
the DP/TP training step are testable without TPU hardware.

Note: this machine's sitecustomize imports jax at interpreter startup (the
axon TPU tunnel), so setting JAX_PLATFORMS via os.environ is too late —
jax.config.update is required to actually select the CPU backend.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of cwd.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


# ---------------------------------------------------------------------------
# quick / slow split: `pytest -m quick` is the inner-loop suite (~1 min,
# app logic + ops unit tests); the unmarked full run stays CI's job.
# Slow = anything compiling full-size convnets or sweeping real fixtures.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_FILES = {
    "test_models_parity.py",     # torch-oracle convnet parity (full size)
    "test_pipeline_detector.py",
    "test_pipeline_embedder.py",
    "test_pallas_warp.py",
    "test_parallel.py",          # 8-device jits
    "test_scrfd_train.py",
    "test_bucket_parity.py",     # real model stack on fixtures
    "test_onnx_exec.py",
    "test_onnx_export.py",
    "test_onnx_import.py",
    "test_golden_fixtures.py",
    "test_replay_real_visits.py",
    "test_gallery_pq.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = os.path.basename(str(item.fspath))
        if name in _SLOW_FILES or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
