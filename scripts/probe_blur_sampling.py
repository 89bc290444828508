"""Blur time-discretization probe (round 4): how much of the quality-run
loss floor is the VIRTUAL-VIEW COUNT, independent of any fitting?

Renders the blurred frame with the GROUND-TRUTH scene + trajectory +
exposure + CRF at n virtual views and scores it against the fixture's
observed image (rendered at n=16).  If PSNR at the training view count
(6-8) is far below the n=16 reproduction, the image-formation chain has
an irreducible banding mismatch at training settings — the scene then
fattens splats to smear the ghost banding (the round-4 ceiling probe saw
exactly that: clipped watchdog firing at GT poses).

Also scores STRATIFIED-JITTER sampling (one random offset per stratum,
fresh each draw): the Monte-Carlo estimator whose EXPECTATION is the
continuous blur integral — the candidate fix that keeps n small.

Usage: python scripts/probe_blur_sampling.py --size 400
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

_TPU_LOCK = acquire_chip("probe_blur_sampling", timeout_s=1800.0)

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu import config  # noqa: E402
from casualhdrsplat_tpu.data import synthetic  # noqa: E402
from casualhdrsplat_tpu.geometry import spline  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--gt-gaussians", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--exposure-lo", type=float, default=0.5)
    ap.add_argument("--exposure-hi", type=float, default=1.0)
    ap.add_argument("--shake-rot", type=float, default=0.03)
    ap.add_argument("--shake-trans", type=float, default=0.015)
    ap.add_argument("--knots-per-frame", type=int, default=3)
    args = ap.parse_args()

    gt_rc = config.RasterizeConfig(
        shared_binning=False, stream_factor=24, max_tiles_per_gaussian=64,
        tile_capacity=4096, tile_h=16, tile_w=16, chunk=256,
    )
    video = synthetic.cached_casual_video(
        "outputs/fixture_cache", 42,
        n_gaussians=args.gt_gaussians, n_frames=args.frames,
        n_virtual=16, size=args.size, angle_span=0.8,
        exposure_range=(args.exposure_lo, args.exposure_hi), crf_gamma=2.2,
        hdr_max=3.0, extent=2.2, renderer="fast", raster_cfg=gt_rc,
        cloud_kind="structured", shake_rot=args.shake_rot,
        shake_trans=args.shake_trans, knots_per_frame=args.knots_per_frame,
    )
    cloud, cam = video.cloud, video.camera
    from casualhdrsplat_tpu.ops import rasterize as rast

    @jax.jit
    def render_blur(mats, dt):
        hdr, _, aux = rast.rasterize(
            cloud.means3d, cloud.quats, cloud.scales, cloud.opacities,
            cloud.colors, mats, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, gt_rc,
        )
        ldr = jnp.clip(hdr * dt, 0.0, 1.0) ** (1.0 / 2.2)
        return jnp.mean(ldr, axis=0), aux.num_dropped

    frames = [1, 5, 9]
    for n in (4, 6, 8, 12, 16):
        psnrs = []
        for i in frames:
            t_k = spline.sample_virtual_times(
                float(video.timestamps[i]), float(video.exposures[i]), n
            )
            mats = spline.cubic_bspline_interpolation(
                video.knots, video.knot_t0, video.knot_dt, t_k
            )
            img, dropped = render_blur(mats, float(video.exposures[i]))
            assert int(dropped) == 0
            mse = float(jnp.mean((img - video.images[i]) ** 2))
            psnrs.append(-10 * np.log10(max(mse, 1e-12)))
        print(f"uniform n={n:2d}: psnr vs GT(n=16) = "
              f"{np.mean(psnrs):6.2f} dB  {[round(p,1) for p in psnrs]}",
              flush=True)

    # stratified jitter at small n: single draws (the per-step training
    # view) and their spread
    rng = np.random.default_rng(0)
    for n in (6, 8):
        psnrs = []
        for i in frames:
            for _ in range(3):
                u = (np.arange(n) + rng.uniform(0, 1, n)) / n
                t_k = jnp.asarray(
                    float(video.timestamps[i])
                    + u * float(video.exposures[i]), jnp.float32
                )
                mats = spline.cubic_bspline_interpolation(
                    video.knots, video.knot_t0, video.knot_dt, t_k
                )
                img, _ = render_blur(mats, float(video.exposures[i]))
                mse = float(jnp.mean((img - video.images[i]) ** 2))
                psnrs.append(-10 * np.log10(max(mse, 1e-12)))
        print(f"jitter  n={n:2d}: psnr single-draw = "
              f"{np.mean(psnrs):6.2f} +- {np.std(psnrs):.2f} dB", flush=True)


if __name__ == "__main__":
    main()
