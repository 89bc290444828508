"""Fixture-knob probe AT SPEC RESOLUTION (800^2): reports image stats
(mean LDR, saturation, blurry-input-vs-sharp PSNR) and binning pressure
(segment demand vs stream budget, drops at init) for candidate quality-run
fixtures.  Cheap: few frames / virtual views — stats, not training."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.models import losses  # noqa: E402
from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

_TPU_LOCK = acquire_chip("probe_fixture", timeout_s=120.0)  # one chip client at a time

runtime.setup()

import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu import config  # noqa: E402
from casualhdrsplat_tpu.data import synthetic  # noqa: E402
from casualhdrsplat_tpu.ops import binning  # noqa: E402
from casualhdrsplat_tpu.ops.projection import project_gaussians  # noqa: E402


def psnr(a, b):
    return float(losses.psnr(jnp.asarray(a), jnp.asarray(b)))


def probe(name, **kw):
    t0 = time.time()
    rng = np.random.default_rng(42)
    video = synthetic.make_casual_video(
        rng, n_frames=4, n_virtual=4, size=800, crf_gamma=2.2,
        renderer="fast", **kw,
    )
    img = np.asarray(video.images)
    sharp = np.asarray(video.sharp_ldr)
    in_psnr = np.mean([psnr(img[i], sharp[i]) for i in range(img.shape[0])])
    sat = float((img > 0.98).mean())

    # binning pressure of the GT cloud at the mid frame
    cam = synthetic.orbit_camera(0.0, width=800, img_height=800)
    cfg = config.RasterizeConfig()
    proj = project_gaussians(
        video.cloud.means3d, video.cloud.quats, video.cloud.scales,
        jnp.asarray(video.knots[2]), cam.fx, cam.fy, cam.cx, cam.cy,
        800, 800, near_plane=cfg.near_plane,
    )
    _, _, seg_len, _ = binning.sorted_stream(
        proj.means2d, proj.radii, proj.depths, proj.valid,
        800, 800, 16, 16, cfg.max_tiles_per_gaussian,
    )
    n = video.cloud.means3d.shape[0]
    demand = int(jnp.sum(seg_len))
    radii = np.asarray(proj.radii)
    print(
        f"{name}: mean={img.mean():.3f} sat={sat*100:.1f}% in_psnr={in_psnr:.1f}dB "
        f"demand/gauss={demand/max(n,1):.1f} r_med={np.median(radii[radii>0]):.1f}px "
        f"r_p99={np.percentile(radii[radii>0],99):.0f}px "
        f"budget@131k={demand/ (6*131072) * (131072/n):.2f}x "
        f"({time.time()-t0:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    base = dict(exposure_range=(0.25, 1.0), hdr_max=1.8, extent=2.2)
    probe("A n=30k s=(.003,.012) span=.8", n_gaussians=30_000,
          scale_range=(0.003, 0.012), angle_span=0.8, **base)
    probe("B n=50k s=(.002,.009) span=.8", n_gaussians=50_000,
          scale_range=(0.002, 0.009), angle_span=0.8, **base)
    probe("C n=30k s=(.003,.012) span=1.2", n_gaussians=30_000,
          scale_range=(0.003, 0.012), angle_span=1.2, **base)
