"""End-to-end TPU demo: full joint model + densification on a synthetic casual video; writes deblurred + exposure-sweep renders. Measured on one v5e chip: 2000 steps in ~522 s, 3000 -> 7526 Gaussians, eval PSNR 23.9."""
import time, numpy as np
from casualhdrsplat_tpu.utils import runtime; runtime.setup()
import jax, jax.numpy as jnp
from casualhdrsplat_tpu import config
from casualhdrsplat_tpu.data import dataset as dataset_mod
from casualhdrsplat_tpu.train.trainer import Trainer
from casualhdrsplat_tpu.train import metrics as metrics_mod
from casualhdrsplat_tpu.models import image_formation as imf

cfg = config.TrainConfig(name="tpu-ladder4")
cfg.model.max_gaussians = 1 << 15      # 32k capacity
cfg.model.sh_degree = 2
cfg.model.num_virtual_views = 4
cfg.model.crf.kind = "mlp"
cfg.model.rasterize = config.RasterizeConfig(
    tile_h=16, tile_w=16, max_tiles_per_gaussian=16, chunk=128,
    backend="pallas", packed=True, stream_factor=8)
cfg.densify.enabled = True
cfg.densify.start_iter = 100
cfg.densify.interval = 100
cfg.densify.stop_iter = 1500
cfg.densify.sh_degree_interval = 300
cfg.densify.opacity_reset_interval = 10**9  # short run: no reset
cfg.optim.max_steps = 2000
cfg.data.eval_every = 0
cfg.log_every = 100
cfg.eval_every = 500
cfg.checkpoint_every = 0
cfg.out_dir = "outputs/tpu-demo"

ds = dataset_mod.make_synthetic_dataset(
    seed=4, n_gaussians=3000, n_frames=8, n_virtual=6, size=128,
    angle_span=0.4)
t = Trainer(cfg, ds)
print("alive at start:", int(jnp.sum(t.params['gaussians']['alive'])), flush=True)
t0 = time.time()
t.train()
print(f"train wall: {time.time()-t0:.0f}s", flush=True)
print("alive at end:", int(jnp.sum(t.params['gaussians']['alive'])), flush=True)
print("final eval:", t.evaluate(indices=list(range(8))), flush=True)
# deblurred render + exposure sweep outputs
img, _, _ = imf.render_deblurred(t.params, t.scene, jnp.asarray(2), cfg.model)
metrics_mod.save_image("outputs/tpu-demo/deblur2.png", img)
for j, dt_v in enumerate([0.3, 1.0, 3.0]):
    mid = t.scene.timestamps[2] + 0.5 * imf.exposure_of(t.params, 2)
    vm = imf.poses_at(t.params, t.scene, jnp.array([mid]), cfg.model)[0]
    ldr, _, _ = imf.render_pose(t.params, t.scene, vm, cfg.model, exposure=jnp.asarray(dt_v))
    metrics_mod.save_image(f"outputs/tpu-demo/sweep_{j}.png", ldr)
hdr, _, _ = imf.render_deblurred(t.params, t.scene, jnp.asarray(2), cfg.model, hdr_output=True)
print("HDR range:", float(jnp.min(hdr)), float(jnp.max(hdr)), flush=True)
print("GT exposures:", np.asarray(ds.timestamps)*0+np.asarray([0.0]), flush=True)
print("learned log_exposures:", np.round(np.asarray(t.params['log_exposures']),3), flush=True)
