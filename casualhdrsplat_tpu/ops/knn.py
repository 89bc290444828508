"""k-NN mean distance for Gaussian scale initialization (SURVEY.md C7).

Reference lineage: the 3DGS `simple_knn` CUDA extension.  Here: the native
C++ grid-accelerated implementation (native/knn.cc, via ctypes) with a
NumPy brute-force fallback — this runs once at init time on the host, so
it is a runtime/native component, not a TPU kernel.
"""

from __future__ import annotations

import numpy as np


def knn_mean_dist(points: np.ndarray, k: int = 3, chunk: int = 2048) -> np.ndarray:
    """Mean Euclidean distance from each point to its k nearest neighbors
    (excluding itself).  [M,3] -> [M]."""
    points = np.asarray(points, np.float32)
    from casualhdrsplat_tpu.data import _native

    lib = _native.load()
    if lib is not None and len(points) > 0:
        try:
            return _native.knn_mean_dist(lib, points, k)
        except Exception:
            pass
    return _knn_numpy(points, k, chunk)


def _knn_numpy(points: np.ndarray, k: int, chunk: int) -> np.ndarray:
    m = len(points)
    if m <= 1:
        return np.full((m,), 0.01, np.float32)
    k = min(k, m - 1)
    out = np.empty((m,), np.float32)
    sq = (points**2).sum(-1)
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        d2 = sq[s:e, None] + sq[None, :] - 2.0 * points[s:e] @ points.T
        np.maximum(d2, 0.0, out=d2)
        idx = np.argpartition(d2, k, axis=1)[:, : k + 1]
        part = np.take_along_axis(d2, idx, axis=1)
        part.sort(axis=1)
        out[s:e] = np.sqrt(part[:, 1 : k + 1]).mean(axis=1)
    return out
