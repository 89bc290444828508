"""Small-scale JOINT-recovery probe (VERDICT r2 next-steps 2/3): the
structured fixture at reduced resolution, full joint training (poses +
exposures + CRF + scene [+ densify]), reporting a recovery TIME SERIES —
sharp/deblur PSNR, gauge-aligned rot/trans ATE, exposure error — so the
pose-divergence fix and exposure-recovery levers are tuned in minutes on
the chip instead of hours at spec.

Usage (on the TPU):
    python scripts/probe_joint.py --steps 1500 --pose-warmup 300 \
        --pose-trans-lr-scale 0.3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

_TPU_LOCK = acquire_chip("probe_joint", timeout_s=120.0)  # one chip client at a time

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu import config  # noqa: E402
from casualhdrsplat_tpu.data import dataset as dataset_mod  # noqa: E402
from casualhdrsplat_tpu.data import synthetic  # noqa: E402
from casualhdrsplat_tpu.models import image_formation as imf  # noqa: E402
from casualhdrsplat_tpu.train import metrics as metrics_mod  # noqa: E402
from casualhdrsplat_tpu.train.trainer import Trainer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--gt-gaussians", type=int, default=10_000)
    ap.add_argument("--capacity", type=int, default=1 << 15)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--virtual-views", type=int, default=6)
    ap.add_argument("--knots-per-frame", type=int, default=3)
    ap.add_argument("--shake-rot", type=float, default=0.03)
    ap.add_argument("--shake-trans", type=float, default=0.015)
    ap.add_argument("--exposure-lo", type=float, default=0.12)
    ap.add_argument("--exposure-hi", type=float, default=0.5)
    ap.add_argument("--pose-warmup", type=int, default=0)
    ap.add_argument("--pose-trans-lr-scale", type=float, default=1.0)
    ap.add_argument("--pose-lr", type=float, default=1e-3)
    ap.add_argument("--exposure-lr", type=float, default=1e-3)
    ap.add_argument("--pose-sigma", type=float, default=0.002)
    ap.add_argument("--exposure-init-frac", type=float, default=0.0)
    ap.add_argument("--sh-degree", type=int, default=2)
    ap.add_argument("--crf", default="mlp", choices=["mlp", "gamma", "identity"])
    ap.add_argument("--sh-dc-lr", type=float, default=2.5e-3)
    ap.add_argument("--crf-lr", type=float, default=5e-3)
    ap.add_argument("--crf-smooth-w", type=float, default=1e-3)
    ap.add_argument("--crf-chroma-w", type=float, default=1e-2)
    ap.add_argument("--c2f-steps", type=int, default=0)
    ap.add_argument("--c2f-sigma", type=float, default=8.0)
    ap.add_argument("--means-lr", type=float, default=1.6e-4)
    ap.add_argument("--pose-anchor-w", type=float, default=0.0)
    ap.add_argument("--pose-b1", type=float, default=0.9)
    ap.add_argument("--densify", action="store_true")
    ap.add_argument("--densify-start", type=int, default=0,
                    help="0 = legacy max(300, c2f/2); start ADC only "
                         "after pose recovery has settled so a co-warp "
                         "is not baked into cloned splats")
    # training raster budget (round-4 ceiling-probe finding: mtpg 32
    # truncates the visible footprint of near-camera ground splats that
    # the GT renderer (mtpg 64) kept — black border bands, corrupted
    # gradients, fat-splat runaway even at GT poses)
    ap.add_argument("--mtpg", type=int, default=32)
    ap.add_argument("--stream-factor", type=int, default=10)
    ap.add_argument("--tile-capacity", type=int, default=1024)
    ap.add_argument("--prune-screen-radius", type=float, default=0.15)
    ap.add_argument("--shared-binning", action="store_true")
    ap.add_argument("--antialias", action="store_true")
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--label", default="")
    # Diagnostics: start the knots AT the GT trajectory (deltas =
    # log(base^-1 gt) on the shared dense grid) — isolates whether pose
    # error is the fit blocker; combine with --pose-lr 0 to freeze there.
    ap.add_argument("--gt-pose-init", action="store_true")
    # Same for exposures: start log dt at the GT values (gauge-free fit).
    ap.add_argument("--gt-exposure-init", action="store_true")
    ap.add_argument("--dump", action="store_true",
                    help="write render/target/deblur/sharp PNGs at the end")
    ap.add_argument("--fixture-only", action="store_true",
                    help="print fixture stats (input-vs-sharp dB) and exit "
                         "— blur-severity calibration")
    args = ap.parse_args()

    kpf = args.knots_per_frame
    gt_rc = config.RasterizeConfig(
        shared_binning=False, stream_factor=24, max_tiles_per_gaussian=64,
        tile_capacity=4096, tile_h=16, tile_w=16, chunk=256,
    )
    t0 = time.time()
    video = synthetic.cached_casual_video(
        "outputs/fixture_cache", 42,
        n_gaussians=args.gt_gaussians, n_frames=args.frames,
        n_virtual=16, size=args.size, angle_span=0.8,
        exposure_range=(args.exposure_lo, args.exposure_hi), crf_gamma=2.2,
        hdr_max=3.0, extent=2.2, renderer="fast", raster_cfg=gt_rc,
        cloud_kind="structured", shake_rot=args.shake_rot,
        shake_trans=args.shake_trans, knots_per_frame=kpf,
    )
    n = video.images.shape[0]
    cam = video.camera
    # pure-numpy PSNR: eager device ops on the axon backend can stall for
    # minutes per launch (measured 30 min once), and this is startup info
    img_np = np.asarray(video.images)
    sharp_np = np.asarray(video.sharp_ldr)
    mse = ((img_np - sharp_np) ** 2).reshape(n, -1).mean(axis=1)
    in_psnr = float(np.mean(-10.0 * np.log10(np.maximum(mse, 1e-12))))
    print(f"fixture ready: {time.time()-t0:.0f}s  input-vs-sharp "
          f"{in_psnr:.1f} dB", flush=True)
    if args.fixture_only:
        from casualhdrsplat_tpu.train import metrics as mm

        os.makedirs("outputs/probe_joint", exist_ok=True)
        tag = f"sr{args.shake_rot}_eh{args.exposure_hi}"
        mm.save_image(f"outputs/probe_joint/fixture_{tag}_input.png",
                      video.images[0])
        mm.save_image(f"outputs/probe_joint/fixture_{tag}_sharp.png",
                      video.sharp_ldr[0])
        return

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

    cfg = config.TrainConfig(name="probe-joint")
    cfg.model.max_gaussians = args.capacity
    cfg.model.sh_degree = args.sh_degree
    cfg.model.num_virtual_views = args.virtual_views
    cfg.model.knots_per_frame = kpf
    cfg.model.exposure_init_frac = args.exposure_init_frac
    cfg.model.crf.kind = args.crf
    cfg.optim.sh_dc_lr = args.sh_dc_lr
    cfg.optim.means_lr_init = args.means_lr
    cfg.optim.crf_lr = args.crf_lr
    cfg.loss.crf_smoothness_weight = args.crf_smooth_w
    cfg.loss.crf_chroma_weight = args.crf_chroma_w
    cfg.loss.coarse_to_fine_steps = args.c2f_steps
    cfg.loss.coarse_sigma0 = args.c2f_sigma
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=16, tile_w=16, tile_capacity=args.tile_capacity,
        max_tiles_per_gaussian=args.mtpg,
        chunk=256, backend="auto", stream_factor=args.stream_factor,
        shared_binning=args.shared_binning, antialias=args.antialias,
    )
    cfg.densify.prune_screen_radius = args.prune_screen_radius
    cfg.densify.enabled = bool(args.densify)
    cfg.densify.start_iter = (
        args.densify_start if args.densify_start > 0
        else max(300, args.c2f_steps // 2)
    )
    cfg.densify.interval = 100
    cfg.densify.stop_iter = int(args.steps * 0.6)
    cfg.densify.opacity_reset_interval = 10 * args.steps
    cfg.densify.screen_prune_from = 400
    cfg.optim.max_steps = args.steps
    cfg.optim.pose_warmup_steps = args.pose_warmup
    cfg.optim.pose_trans_lr_scale = args.pose_trans_lr_scale
    cfg.optim.pose_lr_init = args.pose_lr
    cfg.optim.exposure_lr = args.exposure_lr
    cfg.optim.pose_b1 = args.pose_b1
    cfg.loss.pose_anchor_weight = args.pose_anchor_w
    cfg.data.eval_every = 0
    cfg.log_every = 0
    cfg.eval_every = 0
    cfg.checkpoint_every = 0

    t = Trainer(cfg, ds)
    if args.gt_pose_init:
        from casualhdrsplat_tpu.geometry import lie

        base = t.scene.base_knots
        gt = jnp.asarray(video.knots)
        assert base.shape == gt.shape, (base.shape, gt.shape)
        t.params["knot_deltas"] = jax.vmap(
            lambda b, g: lie.se3_log(lie.mat_mul(g, lie.se3_inverse(b)))
        )(base, gt)
    else:
        t.params["knot_deltas"] = args.pose_sigma * jax.random.normal(
            jax.random.PRNGKey(3), t.params["knot_deltas"].shape
        )
    if args.gt_exposure_init:
        t.params["log_exposures"] = jnp.log(jnp.asarray(video.exposures))
        t._init_log_exposures = jnp.asarray(t.params["log_exposures"])

    traj_times = jnp.asarray(metrics_mod.exposure_window_times(
        video.timestamps, video.exposures
    ), jnp.float32)

    def recovery():
        # trajectory error at the SAMPLED times (knot-space comparison is
        # meaningless on dense grids — unsampled knots are a null space)
        rot, trans = metrics_mod.trajectory_recovery_errors(
            video.knots, video.knot_t0, video.knot_dt,
            imf.effective_knots(t.params, t.scene),
            t.scene.knot_t0, t.scene.knot_dt, traj_times,
        )
        got = np.asarray(t.params["log_exposures"])
        gt = np.log(np.asarray(video.exposures))
        err = np.abs((got - got.mean()) - (gt - gt.mean()))
        return {
            "rot": round(float(rot.mean()), 4),
            "rot_med": round(float(np.median(rot)), 4),
            "rot_max": round(float(rot.max()), 4),
            "trans": round(float(trans.mean()), 5),
            "trans_med": round(float(np.median(trans)), 5),
            "trans_max": round(float(trans.max()), 5),
            "exp": round(float(err.mean()), 4),
        }

    eval_idx = list(range(0, n, max(1, n // 4)))
    print(json.dumps({"step": 0, **recovery(), "label": args.label}),
          flush=True)
    t_tr = time.time()
    while t.step < args.steps:
        out = t.run_step()
        if t.step % args.eval_every == 0 or t.step == args.steps:
            m = t.evaluate(indices=eval_idx)
            entry = {
                "step": t.step, "loss": round(out["loss"], 4),
                "psnr": round(m["eval_psnr"], 2),
                "sharp": round(m.get("eval_sharp_psnr", 0.0), 2),
                "gain": round(
                    m.get("eval_sharp_psnr", 0.0)
                    - m.get("eval_sharp_psnr_input", 0.0), 2),
                "dropped": out["dropped"],
                **recovery(),
                "s_per_step": round((time.time() - t_tr) / t.step, 3),
            }
            print(json.dumps(entry), flush=True)
    print(f"done in {time.time()-t_tr:.0f}s", flush=True)
    if args.dump:
        out_dir = "outputs/probe_joint"
        os.makedirs(out_dir, exist_ok=True)
        deg = t.active_sh_degree()
        for i in eval_idx[:3]:
            fid = jnp.asarray(int(i))
            r = t._eval_render(t.params, fid, deg)
            metrics_mod.save_image(
                os.path.join(out_dir, f"render_{i:02d}.png"), r.blurred_ldr)
            metrics_mod.save_image(
                os.path.join(out_dir, f"target_{i:02d}.png"),
                jnp.asarray(ds.images[int(i)]))
            deb = t._eval_render_deblurred(t.params, fid, deg)
            metrics_mod.save_image(
                os.path.join(out_dir, f"deblur_{i:02d}.png"), deb)
            metrics_mod.save_image(
                os.path.join(out_dir, f"sharp_{i:02d}.png"),
                jnp.asarray(ds.sharp_images[int(i)]))
        print("dumps under", out_dir, flush=True)


if __name__ == "__main__":
    main()
