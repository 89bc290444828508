"""Trainer with a mesh (SURVEY.md P1-P5): the same Trainer class runs the
shard_map render path when cfg.parallel asks for >1 device."""

import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu import config
from casualhdrsplat_tpu.data import dataset as dataset_mod
from casualhdrsplat_tpu.train.trainer import Trainer


def test_sharded_trainer_loss_decreases():
    ds = dataset_mod.make_synthetic_dataset(
        seed=11, n_gaussians=60, n_frames=3, n_virtual=2, size=16
    )
    cfg = config.TrainConfig(name="sharded-smoke")
    cfg.model.max_gaussians = 128
    cfg.model.sh_degree = 1
    cfg.model.num_virtual_views = 2
    cfg.model.crf.kind = "identity"
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=16, tile_capacity=64, max_tiles_per_gaussian=32,
        chunk=32, backend="xla", packed=False,
    )
    cfg.densify.enabled = False
    cfg.parallel = config.ParallelConfig(data=2, gauss=4)
    cfg.data.eval_every = 0
    t = Trainer(cfg, ds)
    assert t.mesh is not None
    assert t.params["gaussians"]["means"].sharding.spec[0] == "gauss"
    losses = [t.run_step()["loss"] for _ in range(8)]
    assert np.isfinite(losses).all()
    # params remain sharded through optimizer updates
    assert t.params["gaussians"]["means"].sharding.spec[0] == "gauss"
    m = t.evaluate()
    assert np.isfinite(m["eval_psnr"])
