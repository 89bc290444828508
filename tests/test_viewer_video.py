"""Viewer server (C22) and video ingestion helpers (C19)."""

import urllib.request

import numpy as np
import pytest

from casualhdrsplat_tpu.data import video as video_mod
from casualhdrsplat_tpu.viewer.server import ViewerServer


def test_viewer_serves_renders():
    calls = {}

    def render(angle, log_exposure, mode):
        calls["last"] = (angle, log_exposure, mode)
        return np.full((8, 8, 3), 0.5, np.float32)

    server = ViewerServer(render, host="127.0.0.1", port=0).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"viewer" in page
        jpg = urllib.request.urlopen(
            base + "/render.jpg?angle=0.5&log_exposure=-1.0", timeout=10
        ).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
        assert calls["last"][0] == pytest.approx(0.5)
        assert calls["last"][1] == pytest.approx(-1.0)
        # error surfaces as 500, not a hang
        def bad(angle, log_exposure, mode):
            raise RuntimeError("boom")
        server.render_fn = bad
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(base + "/render.jpg", timeout=10)
        assert exc.value.code == 500
    finally:
        server.stop()


def test_timestamps_from_names():
    names = ["frame_00010.png", "frame_00012.png", "frame_00020.png"]
    ts = video_mod.timestamps_from_names(names, fps=10.0)
    np.testing.assert_allclose(ts, [0.0, 0.2, 1.0])
    # no digits -> ordinal
    ts2 = video_mod.timestamps_from_names(["a.png", "b.png"], fps=2.0)
    np.testing.assert_allclose(ts2, [0.0, 0.5])


def test_prepare_video_requires_colmap(tmp_path):
    # frames present but no sparse model -> clear error
    frames = tmp_path / "images"
    frames.mkdir()
    (frames / "frame_00001.png").write_bytes(b"x")
    with pytest.raises(RuntimeError, match="COLMAP"):
        video_mod.prepare_video_dataset.__wrapped__ if False else None
        # call with a fake video path; extraction skipped (frames exist)
        video_mod.prepare_video_dataset("missing.mp4", str(tmp_path))
