"""Pose-gradient geometry diagnostic (round-3 joint-recovery stall).

Questions it answers, on the chip, with the real fixture:
1. LANDSCAPE: does the training loss actually decrease along the
   straight line from the initial knot_deltas to the GT deltas — at
   several coarse-to-fine blur levels?  If not, no first-order optimizer
   can recover the poses from this init and the curriculum/model must
   change.
2. GRADIENT: does the autodiff pose gradient at the init point point
   downhill along that line (negative directional derivative), and do
   the packed (Pallas) and dense (XLA) backends agree on it?

Usage: python scripts/probe_pose_grad.py [--sigma 0 4 8 12]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

_TPU_LOCK = acquire_chip("probe_pose_grad", timeout_s=120.0)  # one chip client at a time

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu import config  # noqa: E402
from casualhdrsplat_tpu.data import dataset as dataset_mod  # noqa: E402
from casualhdrsplat_tpu.data import synthetic  # noqa: E402
from casualhdrsplat_tpu.geometry import lie  # noqa: E402
from casualhdrsplat_tpu.models import image_formation as imf  # noqa: E402
from casualhdrsplat_tpu.models import losses  # noqa: E402
from casualhdrsplat_tpu.train.trainer import Trainer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--gt-gaussians", type=int, default=10_000)
    ap.add_argument("--shake-rot", type=float, default=0.03)
    ap.add_argument("--shake-trans", type=float, default=0.015)
    ap.add_argument("--sigmas", type=float, nargs="+", default=[0.0, 4.0, 8.0])
    ap.add_argument("--gt-scene", action="store_true",
                    help="evaluate the landscape with the GT cloud as the "
                         "scene (upper bound) instead of the trained-init")
    args = ap.parse_args()

    kpf = 3
    gt_rc = config.RasterizeConfig(
        shared_binning=False, stream_factor=24, max_tiles_per_gaussian=64,
        tile_capacity=4096, tile_h=16, tile_w=16, chunk=256,
    )
    video = synthetic.cached_casual_video(
        "outputs/fixture_cache", 42,
        n_gaussians=args.gt_gaussians, n_frames=12, n_virtual=16,
        size=args.size, angle_span=0.8, exposure_range=(0.12, 0.5),
        crf_gamma=2.2, hdr_max=3.0, extent=2.2, renderer="fast",
        raster_cfg=gt_rc, cloud_kind="structured",
        shake_rot=args.shake_rot, shake_trans=args.shake_trans,
        knots_per_frame=kpf,
    )
    n = video.images.shape[0]
    cam = video.camera
    ds = dataset_mod.Dataset(
        images=np.asarray(video.images),
        timestamps=np.asarray(video.timestamps),
        viewmats=np.asarray(
            [np.asarray(video.knots[2 + i * kpf]) for i in range(n)],
            np.float32,
        ),
        fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx), cy=float(cam.cy),
        width=cam.width, height=cam.height,
        points_xyz=np.asarray(video.cloud.means3d),
        points_rgb=np.clip(np.asarray(video.cloud.colors), 0, 1),
        sharp_images=np.asarray(video.sharp_ldr),
    )

    cfg = config.TrainConfig(name="pose-grad-probe")
    cfg.model.max_gaussians = 1 << 14
    cfg.model.sh_degree = 0
    cfg.model.num_virtual_views = 6
    cfg.model.knots_per_frame = kpf
    cfg.model.crf.kind = "gamma"
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=16, tile_w=16, tile_capacity=1024, max_tiles_per_gaussian=32,
        chunk=256, backend="auto", stream_factor=10, shared_binning=False,
    )
    cfg.densify.enabled = False
    t = Trainer(cfg, ds)
    # GT exposures (isolate the POSE landscape)
    t.params["log_exposures"] = jnp.log(jnp.asarray(video.exposures))
    if args.gt_scene:
        # scene = GT cloud (sh0 radiance = GT color): landscape upper bound
        from casualhdrsplat_tpu.ops import sh as sh_ops

        g = dict(t.params["gaussians"])
        ncl = video.cloud.means3d.shape[0]
        cap = g["means"].shape[0]

        def put(dst, src):
            return dst.at[:ncl].set(src[:cap])

        g["means"] = put(g["means"], video.cloud.means3d)
        g["quats"] = put(g["quats"], video.cloud.quats)
        g["log_scales"] = put(g["log_scales"], jnp.log(video.cloud.scales))
        g["opacity_logit"] = put(
            g["opacity_logit"],
            jnp.log(video.cloud.opacities / (1 - video.cloud.opacities)),
        )
        g["sh_dc"] = put(
            g["sh_dc"], sh_ops.rgb_to_sh_dc(video.cloud.colors)[:, None, :]
        )
        t.params["gaussians"] = g

    base = t.scene.base_knots
    gt = jnp.asarray(video.knots)
    deltas_gt = jax.vmap(
        lambda b, g_: lie.se3_log(lie.mat_mul(g_, lie.se3_inverse(b)))
    )(base, gt)

    scene, model_cfg = t.scene, t.cfg.model
    images = jnp.asarray(ds.images)

    @jax.jit
    def loss_all_frames(params, sigma):
        def one(fid):
            out = imf.render_frame(params, scene, fid, model_cfg, sh_degree=0)
            pred = losses.gaussian_blur(out.blurred_ldr, sigma)
            tgt = losses.gaussian_blur(images[fid], sigma)
            return losses.photometric(pred, tgt, 0.2)

        return jnp.mean(jax.vmap(one)(jnp.arange(n)))

    d_unit = deltas_gt / jnp.maximum(jnp.linalg.norm(deltas_gt), 1e-12)
    for sigma in args.sigmas:
        sig = jnp.asarray(sigma, jnp.float32)
        vals = []
        for alpha in [0.0, 0.25, 0.5, 0.75, 1.0]:
            p = dict(t.params, knot_deltas=alpha * deltas_gt)
            vals.append(float(loss_all_frames(p, sig)))
        p0 = dict(t.params, knot_deltas=jnp.zeros_like(deltas_gt))
        g = jax.jit(jax.grad(lambda kd: loss_all_frames(
            dict(t.params, knot_deltas=kd), sig)))(jnp.zeros_like(deltas_gt))
        ddir = float(jnp.sum(g * d_unit))  # directional derivative toward GT
        gnorm = float(jnp.linalg.norm(g))
        print(
            f"sigma={sigma:5.1f}  L(alpha=0..1) = "
            + " ".join(f"{v:.4f}" for v in vals)
            + f"   dL/dalpha_hat={ddir:+.3e}  |g|={gnorm:.3e}",
            flush=True,
        )
    print("(negative dL/dalpha_hat = gradient points TOWARD the GT poses; "
          "L should fall with alpha if the basin reaches the init)",
          flush=True)


if __name__ == "__main__":
    main()
