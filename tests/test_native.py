"""Native C++ helper tests (SURVEY.md C7/C19): grid kNN vs NumPy brute
force and the points3D.bin fast path vs the pure-Python reader."""

import os
import subprocess

import numpy as np
import pytest

from casualhdrsplat_tpu.data import _native
from casualhdrsplat_tpu.ops import knn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_lib():
    lib = _native.load()
    if lib is None:
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
        _native.load.cache_clear()
        lib = _native.load()
    return lib


def test_native_knn_matches_bruteforce(rng):
    lib = ensure_lib()
    assert lib is not None
    pts = rng.normal(size=(3000, 3)).astype(np.float32)
    fast = _native.knn_mean_dist(lib, pts, 3)
    ref = knn._knn_numpy(pts, 3, 1024)
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-5)


def test_native_knn_degenerate_clouds():
    lib = ensure_lib()
    # all points identical
    pts = np.zeros((50, 3), np.float32)
    out = _native.knn_mean_dist(lib, pts, 3)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
    # colinear
    pts = np.stack([np.arange(10), np.zeros(10), np.zeros(10)], -1).astype(np.float32)
    out = _native.knn_mean_dist(lib, pts, 3)
    ref = knn._knn_numpy(pts, 3, 1024)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_native_points3d_matches_python(tmp_path):
    lib = ensure_lib()
    from tests.test_data import write_fake_colmap_bin

    model_dir = str(tmp_path / "sparse")
    write_fake_colmap_bin(model_dir)
    path = os.path.join(model_dir, "points3D.bin")
    out = _native.read_points3d(lib, path)
    assert out is not None
    xyz, rgb = out
    assert xyz.shape == (3, 3)
    np.testing.assert_allclose(xyz[:, 0], [0.0, 1.0, 2.0])
    np.testing.assert_allclose(rgb[0], [1.0, 128 / 255.0, 0.0], atol=1e-6)


def test_knn_wrapper_uses_native_when_available(rng):
    ensure_lib()
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    out = knn.knn_mean_dist(pts, 3)
    ref = knn._knn_numpy(pts, 3, 1024)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
