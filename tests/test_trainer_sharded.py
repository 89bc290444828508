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


def test_sharded_trainer_with_densification():
    """Ladder-4-style sharded training WITH ADC on (VERDICT r1 next-step
    3): several densify rounds on the 8-device mesh grow the store, losses
    stay finite, and params/optimizer remain `gauss`-sharded throughout."""
    import jax

    ds = dataset_mod.make_synthetic_dataset(
        seed=12, n_gaussians=40, n_frames=3, n_virtual=2, size=16
    )
    cfg = config.TrainConfig(name="sharded-adc")
    cfg.model.max_gaussians = 128
    cfg.model.sh_degree = 1
    cfg.model.num_virtual_views = 2
    cfg.model.crf.kind = "identity"
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=16, tile_capacity=64, max_tiles_per_gaussian=32,
        chunk=32, backend="xla", packed=False,
    )
    cfg.densify.enabled = True
    cfg.densify.start_iter = 1
    cfg.densify.interval = 3
    cfg.densify.grad_threshold = 1e-8  # force clones/splits every round
    cfg.densify.opacity_reset_interval = 10**9
    cfg.parallel = config.ParallelConfig(data=2, gauss=4)
    cfg.data.eval_every = 0
    t = Trainer(cfg, ds)
    alive0 = int(jnp.sum(t.params["gaussians"]["alive"]))
    stats = None
    losses = []
    for _ in range(10):
        s = t.run_step()
        losses.append(s["loss"])
        stats = s if "alive" in s else stats
    assert np.isfinite(losses).all()
    assert stats is not None and stats["alive"] > alive0
    # store AND optimizer state still sharded on gauss after ADC surgery
    assert t.params["gaussians"]["means"].sharding.spec[0] == "gauss"
    cap = t.params["gaussians"]["means"].shape[0]
    sharded_leaves = [
        l for l in jax.tree.leaves(t.opt_state)
        if hasattr(l, "sharding") and getattr(l, "ndim", 0) >= 1
        and l.shape[0] == cap
    ]
    assert sharded_leaves
    for l in sharded_leaves:
        assert l.sharding.spec[0] == "gauss", l.sharding
