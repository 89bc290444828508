"""At-spec forward diagnosis for the quality-run divergence: render ONE
frame at 800^2/131k/8-view scale through (a) packed+shared-binning,
(b) packed+per-view binning, (c) the dense XLA path, and report drop
counters + cross-path PSNR.  If (a)!=(c) but (b)==(c): shared-binning
budget blowup.  If both packed paths mismatch: kernel/budget bug."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.models import losses  # noqa: E402
from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

_TPU_LOCK = acquire_chip("probe_scale", timeout_s=120.0)  # one chip client at a time

runtime.setup()

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu import config  # noqa: E402
from casualhdrsplat_tpu.data import dataset as dataset_mod  # noqa: E402
from casualhdrsplat_tpu.data import synthetic  # noqa: E402
from casualhdrsplat_tpu.models import image_formation as imf  # noqa: E402
from casualhdrsplat_tpu.train.trainer import Trainer  # noqa: E402


def psnr(a, b):
    return float(losses.psnr(jnp.asarray(a), jnp.asarray(b)))


def main():
    rng = np.random.default_rng(42)
    t0 = time.time()
    video = synthetic.make_casual_video(
        rng, n_gaussians=15_000, n_frames=12, n_virtual=16, size=800,
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
    print(f"fixture {time.time()-t0:.0f}s", flush=True)

    cfg = config.TrainConfig(name="probe-scale")
    cfg.model.max_gaussians = 1 << 17
    cfg.model.sh_degree = 3
    cfg.model.num_virtual_views = 8
    base_rast = config.RasterizeConfig(
        tile_h=16, tile_w=16, tile_capacity=1024, max_tiles_per_gaussian=32,
        chunk=128, backend="auto",
    )
    cfg.model.rasterize = base_rast
    cfg.densify.enabled = False
    cfg.optim.max_steps = 10
    cfg.data.eval_every = 0
    cfg.eval_every = 0
    cfg.checkpoint_every = 0
    t = Trainer(cfg, ds)

    fid = jnp.asarray(0)
    deg = 3
    outs = {}
    for name, rast in [
        ("packed_shared", base_rast),
        ("packed_perview", dataclasses.replace(base_rast, shared_binning=False)),
        ("packed_perview_wide", dataclasses.replace(
            base_rast, shared_binning=False, max_tiles_per_gaussian=64,
            stream_factor=12)),
        ("dense_xla", dataclasses.replace(base_rast, packed=False,
                                          backend="xla")),
    ]:
        m = dataclasses.replace(cfg.model, rasterize=rast)
        t1 = time.time()
        r = imf.render_frame(t.params, t.scene, fid, m, sh_degree=deg)
        img = np.asarray(r.blurred_ldr)
        nd = int(r.aux.num_dropped)
        outs[name] = img
        print(f"{name}: dropped={nd} mean={img.mean():.4f} "
              f"({time.time()-t1:.0f}s)", flush=True)

    ref = outs["dense_xla"]
    for name, img in outs.items():
        if name != "dense_xla":
            print(f"PSNR({name} vs dense_xla) = {psnr(img, ref):.2f} dB",
                  flush=True)


if __name__ == "__main__":
    main()
