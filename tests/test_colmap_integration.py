"""L1 -> L6 integration on REAL on-disk COLMAP-format data (VERDICT r3
Missing #3 / next-step 6): the committed miniature binary sparse model +
PNG frames (tests/fixtures/colmap_mini, written by make_colmap_fixture.py
through the exact inverse of data/colmap.py's readers) drives
load_dataset -> Trainer.run_step -> CLI render --mode deblur, closing the
ingestion seam that unit tests covered only piecewise."""

import json
import os
import subprocess
import sys

import numpy as np

from casualhdrsplat_tpu import config
from casualhdrsplat_tpu.data.dataset import load_colmap_dataset, load_dataset
from casualhdrsplat_tpu.train.trainer import Trainer

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "colmap_mini")


def _cfg():
    cfg = config.TrainConfig(name="colmap-mini")
    cfg.model.max_gaussians = 256
    cfg.model.sh_degree = 1
    cfg.model.num_virtual_views = 2
    cfg.model.crf.kind = "gamma"
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=8, tile_capacity=128, max_tiles_per_gaussian=16,
        chunk=32, backend="xla",
    )
    cfg.densify.enabled = False
    cfg.data.source = "colmap"
    cfg.data.path = FIXTURE
    cfg.data.eval_every = 0
    cfg.log_every = 10**9
    cfg.eval_every = 0
    cfg.checkpoint_every = 0
    cfg.optim.max_steps = 6
    return cfg


def test_binary_model_loads_with_expected_geometry():
    ds = load_colmap_dataset(FIXTURE)
    assert ds.images.shape == (5, 40, 40, 3)
    assert ds.viewmats.shape == (5, 4, 4)
    assert ds.points_xyz.shape == (120, 3)
    # timestamps parsed from the frame numbers in the image names
    np.testing.assert_allclose(ds.timestamps, np.arange(5, dtype=np.float32))
    # rotations orthonormal after the qvec -> viewmat conversion
    R = ds.viewmats[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (5, 1, 1)),
        atol=1e-5,
    )


def test_colmap_to_trainer_step_and_cli_deblur(tmp_path):
    cfg = _cfg()
    ds = load_dataset(cfg.data)  # the config-driven L1 entry
    t = Trainer(cfg, ds)
    losses = [t.run_step()["loss"] for _ in range(6)]
    assert np.all(np.isfinite(losses)), losses
    ckpt = t.save(str(tmp_path / "run"))
    with open(tmp_path / "run" / "config.json") as f:
        assert json.load(f)["data"]["path"] == FIXTURE

    # L6: the CLI renders a deblurred train view from that checkpoint
    env = dict(os.environ, CHS_FORCE_CPU="1",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out_dir = tmp_path / "render"
    res = subprocess.run(
        [sys.executable, "-m", "casualhdrsplat_tpu.cli", "render",
         "--checkpoint", ckpt, "--mode", "deblur", "--out", str(out_dir)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    pngs = sorted(p for p in os.listdir(out_dir) if p.endswith(".png"))
    assert len(pngs) >= 1, os.listdir(out_dir)
