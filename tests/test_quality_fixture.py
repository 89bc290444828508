"""scripts/quality_run.build_fixture: the knob-dict → fixture mapping that
eval_aligned.py uses to re-evaluate a checkpoint must reproduce the exact
dataset the checkpoint trained on — same knobs → bit-identical frames and
init poses through the npz cache round-trip."""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))


TINY_KNOBS = {
    "size": 48, "gt_gaussians": 200, "frames": 3, "capacity": 512,
    "virtual_views": 4, "exposure_range": [0.3, 0.6],
    "shared_binning": False, "stream_factor": 12,
    "fixture": "structured", "shake": [0.03, 0.015],
    "knots_per_frame": 2, "antialias": False,
    "pose_warmup": 0, "pose_trans_lr_scale": 1.0,
    "exposure_lr": 1e-3, "exposure_init_frac": 0.0, "crf_lr": 1e-3,
    "c2f": [0, 8.0], "holdout_every": 0,
}


def test_build_fixture_cache_roundtrip(tmp_path, monkeypatch):
    import quality_run

    monkeypatch.chdir(tmp_path)
    video, ds = quality_run.build_fixture(dict(TINY_KNOBS))
    assert ds.images.shape == (3, 48, 48, 3)
    assert ds.sharp_images is not None and np.isfinite(ds.images).all()
    assert os.path.isdir("outputs/fixture_cache")
    # second call hits the npz cache — eval_aligned.py's path — and must
    # reproduce the training dataset exactly
    video2, ds2 = quality_run.build_fixture(dict(TINY_KNOBS))
    np.testing.assert_array_equal(np.asarray(ds.images), np.asarray(ds2.images))
    np.testing.assert_array_equal(
        np.asarray(ds.viewmats), np.asarray(ds2.viewmats)
    )
    np.testing.assert_array_equal(
        np.asarray(video.exposures), np.asarray(video2.exposures)
    )
    # a fixture-shaping knob change must MISS the cache (different video)
    bumped = dict(TINY_KNOBS, exposure_range=[0.4, 0.8])
    _, ds3 = quality_run.build_fixture(bumped)
    assert not np.array_equal(np.asarray(ds.images), np.asarray(ds3.images))
