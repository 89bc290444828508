"""Perceptual metric (LPIPS) — gated (SURVEY.md C20 metrics set).

LPIPS needs pretrained VGG/AlexNet features; this image has no
torchvision/lpips packages and no network egress, so the metric loads
lazily and `available()` reports whether it can run.  When unavailable,
evaluators simply omit the `lpips` key — PSNR/SSIM (models/losses.py)
always report.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_state = {"fn": None, "checked": False}


def available() -> bool:
    return _load() is not None


def _load():
    if _state["checked"]:
        return _state["fn"]
    _state["checked"] = True
    try:
        import lpips as lpips_pkg  # type: ignore
        import torch

        net = lpips_pkg.LPIPS(net="alex")

        def fn(a: np.ndarray, b: np.ndarray) -> float:
            ta = torch.from_numpy((a * 2 - 1).transpose(2, 0, 1)[None]).float()
            tb = torch.from_numpy((b * 2 - 1).transpose(2, 0, 1)[None]).float()
            with torch.no_grad():
                return float(net(ta, tb))

        _state["fn"] = fn
    except Exception:
        _state["fn"] = None
    return _state["fn"]


def lpips(a: np.ndarray, b: np.ndarray) -> Optional[float]:
    """[H,W,3] float images in [0,1] -> LPIPS distance, or None if the
    pretrained backbone is unavailable in this environment."""
    fn = _load()
    if fn is None:
        return None
    return fn(np.asarray(a, np.float32), np.asarray(b, np.float32))
