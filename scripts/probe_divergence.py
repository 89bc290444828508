"""Small-scale repro of the quality_run divergence: same fixture geometry
(angle_span=2.0, exposure 0.25-1.0) at 128^2, short training with shared
binning ON vs OFF, reporting loss/psnr and the stream-drop counter."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

_TPU_LOCK = acquire_chip("probe_divergence", timeout_s=120.0)  # one chip client at a time

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu import config  # noqa: E402
from casualhdrsplat_tpu.data import dataset as dataset_mod  # noqa: E402
from casualhdrsplat_tpu.data import synthetic  # noqa: E402
from casualhdrsplat_tpu.train.trainer import Trainer  # noqa: E402


def build(shared: bool, steps: int = 400):
    rng = np.random.default_rng(42)
    video = synthetic.make_casual_video(
        rng, n_gaussians=2000, n_frames=12, n_virtual=16, size=128,
        angle_span=2.0, exposure_range=(0.25, 1.0), crf_gamma=2.2,
        hdr_max=1.8, extent=2.2, scale_range=(0.01, 0.04), renderer="fast",
    )
    n = video.images.shape[0]
    cam = video.camera
    ds = dataset_mod.Dataset(
        images=np.asarray(video.images),
        timestamps=np.asarray(video.timestamps),
        viewmats=np.asarray(
            [np.asarray(video.knots[2 + i]) for i in range(n)], np.float32),
        fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx), cy=float(cam.cy),
        width=cam.width, height=cam.height,
        points_xyz=np.asarray(video.cloud.means3d),
        points_rgb=np.clip(np.asarray(video.cloud.colors), 0, 1),
        sharp_images=np.asarray(video.sharp_ldr),
    )
    cfg = config.TrainConfig(name="probe")
    cfg.model.max_gaussians = 1 << 13
    cfg.model.sh_degree = 1
    cfg.model.num_virtual_views = 8
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=16, tile_w=16, tile_capacity=1024, max_tiles_per_gaussian=32,
        chunk=128, backend="auto", shared_binning=shared,
    )
    cfg.densify.enabled = False
    cfg.optim.max_steps = steps
    cfg.data.eval_every = 0
    cfg.eval_every = 0
    cfg.checkpoint_every = 0
    cfg.log_every = 0
    return Trainer(cfg, ds), ds


def drop_counter(t):
    """One rasterize of frame 0 through the training path; read num_dropped."""
    from casualhdrsplat_tpu.models import image_formation as imf
    fid = jnp.asarray(0)
    r = imf.render_frame(
        t.params, t.scene, fid, t.cfg.model, sh_degree=t.active_sh_degree())
    return int(r.aux.num_dropped), float(jnp.mean(r.blurred_ldr))


def main():
    for shared in (True, False):
        t0 = time.time()
        t, ds = build(shared)
        nd, mean_ldr = drop_counter(t)
        losses = []
        for i in range(400):
            out = t.run_step()
            losses.append(out["loss"])
        m = t.evaluate(indices=[0, 6])
        print(f"shared={shared} dropped@init={nd} mean_ldr={mean_ldr:.3f} "
              f"loss[0:5]={np.round(losses[:5],3).tolist()} "
              f"loss[-5:]={np.round(losses[-5:],3).tolist()} "
              f"eval_psnr={m['eval_psnr']:.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
