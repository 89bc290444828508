"""Casual-video ingestion (SURVEY.md C19, §3.5).

The capability contract takes "a single casually captured video with auto
exposure enabled" (Readme.md:44).  As in the reference lineage, heavy
preprocessing stays OFFLINE and external: ffmpeg extracts frames, COLMAP
reconstructs poses.  This module drives that preprocessing (gated on the
external binaries) and recovers per-frame TIMESTAMPS — the quantity the
continuous-time spline model needs that a plain image folder loses.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
from typing import List, Optional

import numpy as np


def have_binary(name: str) -> bool:
    from shutil import which

    return which(name) is not None


def probe_fps(video_path: str) -> float:
    """Frame rate via ffprobe (falls back to 30.0 without it)."""
    if not have_binary("ffprobe"):
        return 30.0
    out = subprocess.run(
        [
            "ffprobe", "-v", "error", "-select_streams", "v:0",
            "-show_entries", "stream=r_frame_rate", "-of", "json", video_path,
        ],
        capture_output=True, text=True, check=True,
    )
    rate = json.loads(out.stdout)["streams"][0]["r_frame_rate"]
    num, den = rate.split("/")
    return float(num) / float(den)


def extract_frames(
    video_path: str,
    out_dir: str,
    fps: Optional[float] = None,
    max_frames: Optional[int] = None,
) -> List[str]:
    """ffmpeg frame extraction to PNG; returns the written file list."""
    if not have_binary("ffmpeg"):
        raise RuntimeError("ffmpeg not available; extract frames offline")
    os.makedirs(out_dir, exist_ok=True)
    args = ["ffmpeg", "-y", "-i", video_path]
    if fps:
        args += ["-vf", f"fps={fps}"]
    if max_frames:
        args += ["-frames:v", str(max_frames)]
    args += [os.path.join(out_dir, "frame_%05d.png")]
    subprocess.run(args, check=True, capture_output=True)
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".png")
    )


_FRAME_RE = re.compile(r"(\d+)\D*$")


def timestamps_from_names(names: List[str], fps: float) -> np.ndarray:
    """Per-frame capture times from frame-numbered filenames.

    Uses the LAST number in each basename (frame_00042.png -> 42) so
    timestamps stay correct when SfM drops frames.  Falls back to ordinal
    position when the numbers do not look like a frame counter: missing
    on some names, non-increasing in name order, or implausibly sparse
    (photo sets named by date/time, e.g. IMG_20230401_123456.jpg, would
    otherwise produce a garbage timeline for the SE(3) spline).
    """
    ts = []
    for name in names:
        stem = os.path.splitext(os.path.basename(name))[0]
        m = _FRAME_RE.search(stem)
        ts.append(int(m.group(1)) if m else None)
    n = len(ts)
    counter_like = (
        n > 0
        and all(t is not None for t in ts)
        and all(b > a for a, b in zip(ts, ts[1:]))
        # a counter with SfM drops stays dense; > 16x average spacing
        # means these are date stamps or unrelated ids
        and (n < 2 or (max(ts) - min(ts)) <= 16 * (n - 1))
    )
    arr = np.asarray(ts if counter_like else range(n), np.float64)
    arr = arr - (arr.min() if n else 0.0)
    return (arr / fps).astype(np.float32)


def prepare_video_dataset(
    video_path: str,
    workdir: str,
    downscale: int = 1,
    max_frames: Optional[int] = None,
):
    """video -> frames (ffmpeg) -> COLMAP (external, user-run) -> Dataset.

    Runs the frame extraction; if `workdir` already contains a COLMAP
    `sparse` model (the user ran `colmap automatic_reconstructor` or the
    lineage's convert script), loads it with real timestamps attached.
    """
    from casualhdrsplat_tpu.data.dataset import load_colmap_dataset

    frames_dir = os.path.join(workdir, "images")
    if not os.path.isdir(frames_dir) or not os.listdir(frames_dir):
        extract_frames(video_path, frames_dir, max_frames=max_frames)
    model_present = any(
        os.path.exists(os.path.join(workdir, d, "cameras.bin"))
        or os.path.exists(os.path.join(workdir, d, "0", "cameras.bin"))
        for d in ("sparse",)
    )
    if not model_present:
        raise RuntimeError(
            f"no COLMAP model under {workdir}/sparse — run COLMAP on "
            f"{frames_dir} first (external preprocessing, SURVEY.md §3.5)"
        )
    # Timestamps are derived inside load_colmap_dataset from the names of
    # the REGISTERED images (not this directory listing): SfM commonly
    # drops blurry casual-video frames, and a listing-based assignment
    # would shift every later timestamp onto the wrong frame.
    fps = probe_fps(video_path)
    return load_colmap_dataset(workdir, downscale=downscale, fps=fps)
