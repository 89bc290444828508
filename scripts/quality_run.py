"""At-spec quality run (BASELINE.md "match reference PSNR"; VERDICT r1
next-step 4): train the FULL joint model — poses + exposures + CRF + HDR
Gaussians + densification — at 800x800 / 100k+-Gaussian scale on a
synthetic casual video with known ground truth, then quantify:

- blurred-frame reconstruction PSNR/SSIM curve (training fit),
- DEBLURRED-render PSNR/SSIM vs GT sharp frames and the deblurring gain
  over the blurry inputs (Readme.md:54 "sharpen the train images"),
- exposure-RATIO recovery error (global scale is gauge),
- CRF-curve recovery RMSE vs the GT gamma curve after gauge alignment
  (a log-exposure shift — the HDR x dt x CRF chain has a scale gauge),
- pose recovery: effective spline knots vs GT knots (the script perturbs
  the initial knots, as COLMAP-on-blurry-frames would be).

Writes QUALITY_r{N}.json at the repo root plus renders under
outputs/quality/.  Run on the TPU chip: `python scripts/quality_run.py`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu import config  # noqa: E402
from casualhdrsplat_tpu.data import dataset as dataset_mod  # noqa: E402
from casualhdrsplat_tpu.data import synthetic  # noqa: E402
from casualhdrsplat_tpu.geometry import lie  # noqa: E402
from casualhdrsplat_tpu.models import crf as crf_mod  # noqa: E402
from casualhdrsplat_tpu.models import image_formation as imf  # noqa: E402
from casualhdrsplat_tpu.train import metrics as metrics_mod  # noqa: E402
from casualhdrsplat_tpu.train.trainer import Trainer  # noqa: E402


def crf_recovery_rmse(params, crf_cfg, gamma: float):
    """RMSE between the learned response curve and the GT gamma curve,
    minimized over a log-exposure shift (the chain's scale gauge)."""
    e = np.exp(np.linspace(np.log(1e-3), np.log(3.0), 256))
    best = (np.inf, 0.0)
    for delta in np.linspace(-2.0, 2.0, 161):
        learned = np.asarray(
            crf_mod.apply(params, jnp.asarray(np.tile(
                (e * np.exp(delta))[:, None], (1, 3))), crf_cfg)
        )
        gt = np.clip(e, 0.0, 1.0) ** (1.0 / gamma)
        rmse = float(np.sqrt(np.mean((learned - gt[:, None]) ** 2)))
        if rmse < best[0]:
            best = (rmse, float(delta))
    return {"rmse": best[0], "log_shift": best[1]}


def hdr_recovery_metrics(t, video, eval_idx, deg, crf_cfg, gamma=2.2):
    """Gauge-aligned HDR radiance recovery (VERDICT r3 Missing #2 /
    next-step 5): the chain H x dt x CRF has a global scale gauge, so the
    rendered linear-HDR deblurs are aligned to the fixture's GT radiance
    by ONE least-squares scalar before scoring.

    - eval_hdr_psnr: PSNR of the aligned HDR renders vs GT sharp_hdr,
      peak = GT max (the 'render HDR images' half of Readme.md:54);
    - exposure_sweep_psnr: end-to-end HDR exposure-editing fidelity —
      CRF_pred(s * H_pred * dt) vs the GT chain clip(H_gt*dt)^(1/gamma)
      across a 16x virtual-exposure sweep (teaser.png c.1); this couples
      the recovered radiance, CRF and exposure gauges the way a USER's
      editing slider would."""
    import jax.numpy as jnp

    from casualhdrsplat_tpu.models import crf as crf_mod

    preds, gts = [], []
    for i in eval_idx[:3]:
        preds.append(np.asarray(
            t._eval_render_deblurred_hdr(t.params, jnp.asarray(int(i)), deg)
        ))
        gts.append(np.asarray(video.sharp_hdr[int(i)]))
    p, g = np.stack(preds), np.stack(gts)
    if p.shape != g.shape:
        # coarse curriculum rung: deblurs render at the rung resolution —
        # score against the box-downscaled GT radiance (area average,
        # same filter Dataset.downscaled applies to the LDR frames)
        k = g.shape[1] // p.shape[1]
        b, h, w, _ = p.shape
        g = g.reshape(b, h, k, w, k, 3).mean(axis=(2, 4))
    s = float((p * g).sum() / max((p * p).sum(), 1e-12))
    peak = float(g.max())
    mse = float(((s * p - g) ** 2).mean())
    hdr_psnr = 20 * np.log10(max(peak, 1e-12)) - 10 * np.log10(max(mse, 1e-12))

    sweep = {}
    for dt_v in (0.25, 1.0, 4.0):
        ldr_pred = np.asarray(crf_mod.apply(
            t.params["crf"], jnp.asarray(s * p[0] * dt_v), crf_cfg
        ))
        ldr_gt = np.clip(g[0] * dt_v, 0.0, 1.0) ** (1.0 / gamma)
        m = float(((ldr_pred - ldr_gt) ** 2).mean())
        sweep[str(dt_v)] = round(-10 * np.log10(max(m, 1e-12)), 3)
    return {
        "eval_hdr_psnr": round(hdr_psnr, 3),
        "scale_gauge": round(s, 5),
        "exposure_sweep_psnr": sweep,
    }


def build_fixture(knobs: dict):
    """Rebuild the deterministic GT fixture + Dataset from the knob dict
    persisted beside the checkpoint (ckpt/fixture.json) — shared by the
    training run below and by scripts/eval_aligned.py, so a checkpoint is
    always re-evaluated against the exact fixture it trained on."""
    # GT generation budget: one-time cost, so over-provision the stream
    # (structured surfel splats at 800^2 need more than the training
    # defaults; make_casual_video RAISES if anything is dropped).
    gt_rc = config.RasterizeConfig(
        shared_binning=False, stream_factor=24, max_tiles_per_gaussian=64,
        tile_capacity=4096, tile_h=16, tile_w=16, chunk=256,
    )
    kpf = knobs["knots_per_frame"]
    video = synthetic.cached_casual_video(
        os.path.join("outputs", "fixture_cache"), 42,
        n_gaussians=knobs["gt_gaussians"],
        n_frames=knobs["frames"],
        n_virtual=16,
        size=knobs["size"],
        angle_span=0.8,
        exposure_range=tuple(knobs["exposure_range"]),
        crf_gamma=2.2,
        hdr_max=3.0,
        extent=2.2,
        scale_range=(0.004, 0.016),
        renderer="fast",
        raster_cfg=gt_rc,
        cloud_kind=(
            "structured" if knobs["fixture"] == "structured" else "random"
        ),
        shake_rot=knobs["shake"][0],
        shake_trans=knobs["shake"][1],
        knots_per_frame=kpf,
    )
    n = video.images.shape[0]
    cam = video.camera
    ds = dataset_mod.Dataset(
        images=np.asarray(video.images),
        timestamps=np.asarray(video.timestamps),
        # frame-time poses off the (dense, shaken) GT knot grid — the
        # "COLMAP-on-blurry-frames" initialization a real pipeline gets
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
    return video, ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--gt-gaussians", type=int, default=30_000)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--steps", type=int, default=4_000)
    ap.add_argument("--capacity", type=int, default=1 << 17)
    ap.add_argument("--virtual-views", type=int, default=8)
    ap.add_argument("--out", default="QUALITY_r05.json")
    ap.add_argument("--render-dir", default="outputs/quality")
    # Fixture: "structured" (piecewise-smooth textured room — the winnable
    # quality benchmark, VERDICT r2 Missing #4) vs legacy "confetti".
    ap.add_argument("--fixture", default="structured",
                    choices=["structured", "confetti"])
    # Handheld shake: per-dense-knot SE(3) jitter (rad / world units) —
    # the dominant source of casual-video blur (rotation moves the WHOLE
    # frame; the look-at orbit alone never blurs central content).
    # Calibrated heavy-blur regime (round 3): shake 0.06 + exposures
    # 0.5-1.0 of the frame interval -> input-vs-sharp ~22 dB at 800^2,
    # the genuinely-blurry casual video the deblurring contract needs,
    # with an init pose error the joint optimizer demonstrably recovers.
    ap.add_argument("--shake-rot", type=float, default=0.06)
    ap.add_argument("--shake-trans", type=float, default=0.03)
    # Sub-frame spline control points (GT and model use the same grid).
    ap.add_argument("--knots-per-frame", type=int, default=3)
    # Joint-stability controls (VERDICT r2 Missing #2 / next-step 2).
    ap.add_argument("--pose-warmup", type=int, default=100)
    ap.add_argument("--pose-trans-lr-scale", type=float, default=0.1)
    ap.add_argument("--exposure-lr", type=float, default=5e-3)
    # Exposure grads are per-frame sparse like knot grads; b1=0 stops the
    # stale-momentum random walk (OptimConfig.exposure_b1; measured on
    # the r05 320² heavy probe: exp_err rose 0.21→0.28 under b1=0.9).
    ap.add_argument("--exposure-b1", type=float, default=0.0)
    # Diagnostic ceiling probe: start log_exposures AT the GT values —
    # isolates how much of the heavy-regime plateau the exposure error
    # causes (r05 probes: exp_err rises under joint descent even with
    # momentum-free Adam, i.e. the gradient itself is biased at wrong
    # poses).  Exposures stay LEARNABLE; only the init changes.
    ap.add_argument("--gt-exposure-init", action="store_true")
    # Per-window pose restart at launch: refine the K worst train frames'
    # trajectory windows against their blurry inputs before continuing
    # joint training (train/pose_align.make_window_realigner; 0 = off).
    ap.add_argument("--realign-windows", type=int, default=0)
    ap.add_argument("--realign-steps", type=int, default=48)
    ap.add_argument("--exposure-init-frac", type=float, default=0.75)
    ap.add_argument("--crf-lr", type=float, default=1e-3)
    # coarse-to-fine (losses.gaussian_blur): round-3 finding — loss-blur
    # c2f destabilized at-spec runs (fat-splat explosion, exposure
    # divergence); OFF by default in round 4, replaced by the multi-
    # resolution curriculum below.
    ap.add_argument("--c2f-steps", type=int, default=0)
    ap.add_argument("--c2f-sigma", type=float, default=10.0)
    # Multi-resolution curriculum (round 4): train the first
    # --coarse-steps steps on a --coarse-downscale'd dataset (area-average
    # box filter, intrinsics scaled), then promote the SAME params/
    # optimizer/ADC state to full resolution.  Widens the photometric
    # pose basin at 1/k^2 the step cost.
    ap.add_argument("--coarse-steps", type=int, default=0)
    ap.add_argument("--coarse-downscale", type=int, default=2)
    # full-resolution-rung footprint budget (see make_trainer below).
    # r05 finding: 128 cells (~180 px bbox) is UNDERSIZED for the
    # converged structured scene at 800² — legitimately-large wall/floor
    # splats clip, the corrupted gradient fattens them further
    # (JOINT_RECOVERY §1), and after densify stops the clipped counter
    # runs away (8k→112k between prune rounds, train loss 0.010→0.043).
    ap.add_argument("--mtpg-full", type=int, default=256)
    # screen prune radius (fraction of width): with an adequate mtpg the
    # prune should only catch truly pathological splats, not the legit
    # large ones the budget admits (0.10 at mtpg 128 thrashed: prune and
    # re-fatten every 100 steps).
    ap.add_argument("--prune-screen-radius", type=float, default=0.20)
    ap.add_argument("--pose-anchor-w", type=float, default=0.0)
    # r04 pose-divergence findings (probe series, outputs/probe_logs/):
    # momentum-free pose Adam — sparse per-frame knot grads + stale b1
    # momentum random-walked the trajectory (trans ATE 3x in 500 steps
    # with translation updates FROZEN); b1=0 held it flat.
    ap.add_argument("--pose-b1", type=float, default=0.0)
    # Keep pose refinement ALIVE through the full-resolution leg: the
    # stock 3DGS-style 1e-3 -> 1e-5 decay leaves ~1e-4 by mid-run, right
    # when promotion to 800^2 finally gives the pose gradient its
    # fine-detail signal (step-2000 eval: rot error flat at 2.13 deg with
    # the schedule already down 10x).
    ap.add_argument("--pose-lr-final", type=float, default=1e-4)
    # Restart the pose decay clock at curriculum promotion (full pose lr
    # exactly when the gradient first sees full-resolution detail) —
    # docs/JOINT_RECOVERY.md "next quality lever".
    ap.add_argument("--pose-rewarm", action="store_true")
    ap.add_argument("--densify-start", type=int, default=500)
    ap.add_argument("--antialias", action="store_true")
    # Hold out every k-th frame from training and score TRUE novel-view
    # synthesis on them (pose from the spline, exposure interpolated from
    # neighboring train frames — SURVEY.md §6; VERDICT r2 Weak #5).
    ap.add_argument("--holdout-every", type=int, default=6)
    # Fixture blur severity: within-exposure motion scales with the
    # exposure upper bound (run 7's (0.25, 1.0) => ~26 px max streak;
    # (0.12, 0.5) probes at ~13 px / input-vs-sharp ~26 dB).
    ap.add_argument("--exposure-lo", type=float, default=0.5)
    ap.add_argument("--exposure-hi", type=float, default=1.0)
    # Binning regime: per-view (exact, expensive — run 7) vs shared
    # (~6x cheaper walk, depth order approximated across virtual views;
    # needs the Chebyshev-inflated stream budget to fit, so only viable
    # when within-exposure motion is moderate — see outputs/quality/README).
    ap.add_argument("--shared-binning", action="store_true")
    ap.add_argument("--stream-factor", type=int, default=12)
    ap.add_argument("--max-minutes", type=float, default=0.0,
                    help="cooperative wall-clock stop (0 = unbounded): "
                         "checked between steps like the stop file, so the "
                         "report/checkpoint are still written")
    # TIME-based evals (VERDICT r4 Weak #2 / next-step 2): step-based
    # evals every 1000 lost round 4's entire report when the session
    # ended at step 972.  Like the 5-min checkpoints, an eval (and the
    # report that follows it) now also fires on wall-clock, so the first
    # eval lands within ~eval-every-s of launch and EVERY session leaves
    # a scored curve point.
    ap.add_argument("--eval-every-s", type=float, default=300.0)
    ap.add_argument("--run-label", default="")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore an existing checkpoint/progress and "
                         "restart from step 0 (default: resume — the TPU "
                         "session wall-clock is shorter than a full run, "
                         "so runs accumulate across sessions)")
    args = ap.parse_args()

    # One chip client at a time (VERDICT r3 next-step 3): hold the
    # advisory flock for the process lifetime so benches/probes can never
    # interleave with (and contaminate or wedge) this run.  Taken in
    # main(), not at import — eval_aligned imports this module for its
    # fixture builder while already holding the lock itself.
    acquire_chip("quality_run", timeout_s=120.0)

    t_start = time.time()
    ckpt_root = os.path.abspath(os.path.join(args.render_dir, "ckpt"))
    if args.fresh and os.path.exists(args.out + ".progress"):
        os.remove(args.out + ".progress")
    # Fixture provenance guard (ADVICE r2): the checkpoint under ckpt_root
    # is only resumable into the SAME fixture/raster regime.  These knobs
    # are persisted beside the checkpoint; on resume a mismatch refuses
    # instead of silently continuing a different run under the current
    # args (which write_report would then misattribute).
    fixture_knobs = {
        "size": args.size, "gt_gaussians": args.gt_gaussians,
        "frames": args.frames, "capacity": args.capacity,
        "virtual_views": args.virtual_views,
        "exposure_range": [args.exposure_lo, args.exposure_hi],
        "shared_binning": bool(args.shared_binning),
        "stream_factor": args.stream_factor,
        "fixture": args.fixture,
        "shake": [args.shake_rot, args.shake_trans],
        "knots_per_frame": args.knots_per_frame,
        "antialias": bool(args.antialias),
        "pose_warmup": args.pose_warmup,
        "pose_trans_lr_scale": args.pose_trans_lr_scale,
        "exposure_lr": args.exposure_lr,
        "exposure_init_frac": args.exposure_init_frac,
        "crf_lr": args.crf_lr,
        "c2f": [args.c2f_steps, args.c2f_sigma],
        "holdout_every": args.holdout_every,
        "coarse": [args.coarse_steps, args.coarse_downscale],
        "pose_anchor_w": args.pose_anchor_w,
        "densify_start": args.densify_start,
        "pose_b1": args.pose_b1,
        "gt_exposure_init": bool(args.gt_exposure_init),
    }
    print("generating GT fixture...", flush=True)
    # Fixture tuned with AT-SPEC 800^2 probes (scripts/probe_fixture.py —
    # world-unit scales are NOT resolution-invariant: tile footprint grows
    # with focal^2): splat radii median ~7 px / p99 ~17 px so the binning
    # demand sits at ~0.5x the training stream budget at 131k capacity,
    # mean LDR ~0.58 with ~2% saturated highlights (HDR/CRF content), and
    # blurry-input-vs-sharp-GT PSNR ~21 dB (max within-exposure motion
    # ~26 px) — genuinely heavy casual blur with deblurring headroom.  The
    # first cut (scale .01-.04 @ span 2.0) overflowed every static budget
    # at 800^2 and the bottom of every training render went empty.
    video, ds = build_fixture(fixture_knobs)
    kpf = args.knots_per_frame
    n = video.images.shape[0]
    gt_gen_s = time.time() - t_start
    print(f"fixture: {n} frames @ {args.size}^2, {gt_gen_s:.0f}s", flush=True)

    cfg = config.TrainConfig(name="quality-r03")
    cfg.model.max_gaussians = args.capacity
    cfg.model.sh_degree = 3
    cfg.model.num_virtual_views = args.virtual_views
    cfg.model.knots_per_frame = kpf
    cfg.model.crf.kind = "mlp"
    cfg.optim.pose_warmup_steps = args.pose_warmup
    cfg.optim.pose_trans_lr_scale = args.pose_trans_lr_scale
    cfg.optim.exposure_lr = args.exposure_lr
    cfg.optim.exposure_b1 = args.exposure_b1
    cfg.optim.crf_lr = args.crf_lr
    cfg.model.exposure_init_frac = args.exposure_init_frac
    cfg.loss.coarse_to_fine_steps = args.c2f_steps
    cfg.loss.coarse_sigma0 = args.c2f_sigma
    cfg.loss.pose_anchor_weight = args.pose_anchor_w
    cfg.optim.pose_b1 = args.pose_b1
    cfg.optim.pose_lr_final = args.pose_lr_final
    if args.pose_rewarm and args.coarse_steps > 0:
        cfg.optim.pose_lr_rewarm_step = args.coarse_steps
    elif args.pose_rewarm:
        # ADVICE r4: without a curriculum there is no promotion step to
        # re-warm at — refuse rather than silently run the stock schedule
        # under a flag that claims otherwise.
        raise SystemExit("--pose-rewarm requires --coarse-steps > 0 "
                         "(the rewarm fires at curriculum promotion)")
    # Binning regime is flag-driven (--shared-binning / --stream-factor);
    # both regimes were tuned against at-spec probes in round 2:
    # - PER-VIEW (exact): run 7 measured ~0.94M rows/view demand at full
    #   131k capacity, so stream_factor=12 (1.57M rows/view) leaves ~65%
    #   headroom; the kernel walks views x 1.57M rows.
    # - SHARED (default for moderate blur): one Chebyshev-inflated stream
    #   for all views; viable only when within-exposure motion is
    #   moderate (run 6: at ~26 px motion the inflation multiplied demand
    #   ~5x and HALF of all contributions were waterfill-dropped).
    # chunk=256 keeps the SMEM chunk-metadata count bounded
    # (c_budget = rows/256 + tiles + 1 per stream); chunk=128 doubles it
    # and re-overflows SMEM at 131k capacity (the run-2 OOM).
    # max_tiles_per_gaussian=64 (round 4): at mtpg=32 the GT-sized
    # near-camera splats of the structured fixture exceed their binning
    # footprint — the center-clamp truncates VISIBLE coverage (black
    # border bands in every training render), the corrupted gradients
    # drive a fat-splat runaway, and even a scene-only fit at GT poses
    # diverges (r04 ceiling probe: 17.9 -> 14.2 dB).  mtpg=64 is the
    # budget the GT renderer uses (zero clipped cells on the fixture
    # cloud); with it the same fit reaches 45 dB / +12.9 dB gain.
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=16, tile_w=16, tile_capacity=1024, max_tiles_per_gaussian=64,
        chunk=256, backend="auto", stream_factor=args.stream_factor,
        shared_binning=args.shared_binning, antialias=args.antialias,
    )
    cfg.densify.enabled = True
    cfg.densify.start_iter = args.densify_start
    cfg.densify.interval = 100
    cfg.densify.stop_iter = int(args.steps * 0.6)
    # raw-threshold doubled: the advisor's pixel-scale fix made the stock
    # 2e-4 threshold saturate the 131k capacity by step 2000, which both
    # exhausts densification headroom and inflates binning demand.
    cfg.densify.grad_threshold = 4e-4
    # No opacity resets inside a short run: each reset costs ~1000 steps
    # of recovery (the step-3000/6000 PSNR craters in runs 2/4).
    cfg.densify.opacity_reset_interval = 10 * args.steps
    # ...but opacity resets are what normally arm the max-screen-radius
    # prune; arm it explicitly so oversized splats cannot blow up the
    # binning budget (they are the mtpg-clip tail the `clipped` counter
    # tracks).
    cfg.densify.screen_prune_from = 600
    cfg.densify.prune_screen_radius = args.prune_screen_radius
    cfg.optim.max_steps = args.steps
    cfg.data.eval_every = args.holdout_every
    cfg.log_every = 100
    cfg.eval_every = 0  # evals driven from here (curve below)
    cfg.checkpoint_every = 0
    cfg.out_dir = args.render_dir

    def make_trainer(active_ds):
        # Footprint budget scales with focal^2 (docs/TUNING.md): splats
        # legitimately sized for the coarse rung can exceed mtpg at full
        # resolution (measured at promotion: 197/24.6k visible splats
        # clipped at 800^2 under mtpg=64, clipped counter 100 -> 172k).
        # The stream budget (stream_factor x capacity) is unchanged by
        # mtpg, so give the full-res rung the headroom it needs.
        rung_full = active_ds.width >= args.size
        cfg.model.rasterize = dataclasses.replace(
            cfg.model.rasterize,
            max_tiles_per_gaussian=args.mtpg_full if rung_full else 64,
        )
        tt = Trainer(cfg, active_ds)
        # COLMAP-on-blurry-frames initial poses are noisy: perturb the
        # knots so the run demonstrates JOINT pose estimation, not
        # pose-given fit.  (Applied before any resume-load: rot0/trans0
        # describe the same deterministic perturbed init on every launch.)
        tt.params["knot_deltas"] = 0.002 * jax.random.normal(
            jax.random.PRNGKey(3), tt.params["knot_deltas"].shape
        )
        if args.gt_exposure_init:
            tt.params["log_exposures"] = jnp.log(
                jnp.asarray(video.exposures, jnp.float32)
            )
        return tt

    # Multi-resolution curriculum: which rung does this launch start on?
    # (Resume peeks the checkpointed step first — the param/optimizer
    # pytrees are resolution-independent, only images/intrinsics differ.)
    from casualhdrsplat_tpu.train import checkpoint as ckpt_mod

    ds_coarse = (
        ds.downscaled(args.coarse_downscale) if args.coarse_steps > 0 else None
    )
    peek = 0
    if not args.fresh:
        latest = ckpt_mod.latest_step_dir(
            os.path.abspath(os.path.join(args.render_dir, "ckpt"))
        )
        if latest:
            peek = int(os.path.basename(latest).split("_")[1])
    on_coarse = ds_coarse is not None and peek < args.coarse_steps
    t = make_trainer(ds_coarse if on_coarse else ds)

    def promote_to_full():
        """Coarse -> full-resolution promotion: same params/opt/ADC state,
        new dataset/intrinsics (one recompile)."""
        nonlocal t, on_coarse
        print(
            f"coarse phase done at step {t.step} — promoting to "
            f"{args.size}^2", flush=True,
        )
        tnew = make_trainer(ds)
        tnew.params, tnew.opt_state = t.params, t.opt_state
        tnew.adc, tnew.step = t.adc, t.step
        t, on_coarse = tnew, False

    _traj_times = jnp.asarray(metrics_mod.exposure_window_times(
        video.timestamps, video.exposures
    ), jnp.float32)

    def traj_errors():
        """Pose error at SAMPLED trajectory times (exposure windows) —
        dense-grid knots outside the windows are an objective null space,
        so knot-space errors are meaningless there."""
        return metrics_mod.trajectory_recovery_errors(
            video.knots, video.knot_t0, video.knot_dt,
            imf.effective_knots(t.params, t.scene),
            t.scene.knot_t0, t.scene.knot_dt, _traj_times,
        )

    rot0, trans0 = traj_errors()

    fixture_path = os.path.join(ckpt_root, "fixture.json")

    def recovery_now():
        """Gauge-aligned pose + exposure recovery snapshot — appended to
        every eval entry so divergence is a TIME SERIES, not a before/
        after pair (VERDICT r2 Weak #6: a mean over knots hides end-knot
        blowups; report max too).  Pose error is measured at the SAMPLED
        trajectory times (exposure windows): on dense sub-frame knot
        grids the unsampled knots are a null space of the objective."""
        rot, trans = traj_errors()
        got = np.asarray(t.params["log_exposures"])
        gt = np.log(np.asarray(video.exposures))
        err = np.abs((got - got.mean()) - (gt - gt.mean()))
        # per-frame rot error (times are 5 samples per exposure window in
        # frame order — exposure_window_times): names WHICH windows carry
        # the rot_max outlier (VERDICT r4 next-step 3 per-window diagnosis).
        # The error arrays can be SHORTER than n*5 (a window endpoint past
        # the spline support is dropped by interpolate), so group by index
        # rather than reshape.
        rot_np = np.asarray(rot)
        frame_of = np.repeat(np.arange(n), len(_traj_times) // n)[: len(rot_np)]
        per_frame = np.asarray([
            rot_np[frame_of == f].mean() if np.any(frame_of == f) else 0.0
            for f in range(n)
        ])
        return {
            "rot_deg_mean": float(rot.mean()), "rot_deg_max": float(rot.max()),
            "trans_mean": float(trans.mean()), "trans_max": float(trans.max()),
            "exp_err_mean": float(err.mean()), "exp_err_max": float(err.max()),
            "rot_per_frame": [round(float(x), 3) for x in per_frame],
        }

    # deblur/fit metrics are scored on TRAIN frames only: a held-out
    # frame's own exposure entry never receives gradients, so its
    # deblurred render would be tone-mapped at a garbage dt (held-out
    # frames are scored by the novel-view metric instead).
    tr = list(t.dataset.train_indices)
    eval_idx = [tr[i] for i in range(0, len(tr), max(1, len(tr) // 6))]
    curve = []
    if not args.fresh:
        # Resume: the fixture is deterministic (seeded rng), so restoring
        # {params, opt_state, adc, step} continues the SAME run.  The
        # curve so far comes from the .progress JSONL the last launch
        # appended to.
        from casualhdrsplat_tpu.parallel.distributed import resume_or_start

        if os.path.exists(fixture_path):
            with open(fixture_path) as f:
                saved = json.load(f)
            # Compare on SHARED keys only: a knob that no longer exists
            # (e.g. the round-5 removal of the stage/alt/inc-frames levers,
            # all of which were at their off-defaults in every committed
            # run) must not strand an otherwise-identical checkpoint; any
            # asymmetric key is still reported loudly.
            shared = set(saved) & set(fixture_knobs)
            diff = {k: (saved[k], fixture_knobs[k]) for k in shared
                    if saved[k] != fixture_knobs[k]}
            if diff:
                raise SystemExit(
                    f"checkpoint at {ckpt_root} was trained with different "
                    f"fixture knobs {diff} ((saved, requested)) — pass "
                    "--fresh to restart, or match the original flags"
                )
            dropped = set(saved) - set(fixture_knobs)
            added = set(fixture_knobs) - set(saved)
            if dropped or added:
                print(f"fixture-knob schema drift on resume: dropped="
                      f"{sorted(dropped)} added={sorted(added)} "
                      "(values compared on shared keys only)", flush=True)
        resumed = resume_or_start(t, ckpt_root)
        if resumed:
            if os.path.exists(args.out + ".progress"):
                with open(args.out + ".progress") as f:
                    curve = [json.loads(ln) for ln in f if ln.strip()]
                curve = [e for e in curve if e["step"] <= resumed]
            print(f"resumed from step {resumed} "
                  f"({len(curve)} eval points restored)", flush=True)
        elif os.path.exists(args.out + ".progress"):
            os.remove(args.out + ".progress")  # stale: no ckpt to match it

    if args.realign_windows > 0:
        # Per-window pose restart at launch (docs/JOINT_RECOVERY.md r05:
        # a few windows plateau degrees off while the rest converge):
        # pick the K worst TRAIN frames by blurred-recon L1 (no GT used)
        # and block-coordinate-refine each one's window against its
        # blurry input, scene frozen; training then continues jointly.
        from casualhdrsplat_tpu.train.pose_align import make_window_realigner

        deg = t.active_sh_degree()

        @jax.jit
        def _frame_l1(params, fid):
            out = imf.render_frame(params, t.scene, fid, cfg.model,
                                   sh_degree=deg)
            return jnp.mean(jnp.abs(out.blurred_ldr - t.images[fid]))

        tr_idx = list(t.dataset.train_indices)
        scored = sorted(
            ((float(_frame_l1(t.params, jnp.asarray(int(f)))), int(f))
             for f in tr_idx), reverse=True,
        )
        worst = scored[: args.realign_windows]
        print(json.dumps({"realign_candidates":
                          [(f, round(l, 5)) for l, f in worst]}), flush=True)
        realign = make_window_realigner(
            cfg.model, steps=args.realign_steps, lr=2e-3, sh_degree=deg
        )
        for _, f in worst:
            kd, d, curve_r = realign(
                t.params, t.scene, jnp.asarray(f), t.images[int(f)]
            )
            t.params["knot_deltas"] = kd
            dn = np.asarray(d)
            print(json.dumps({
                "realigned_frame": int(f),
                "rot_deg": round(float(np.degrees(np.linalg.norm(dn[:3]))), 4),
                "trans": round(float(np.linalg.norm(dn[3:])), 5),
                "l1_before": round(float(curve_r[0]), 5),
                "l1_after": round(float(curve_r[-1]), 5),
            }), flush=True)
        print(json.dumps({"post_realign": recovery_now()}), flush=True)
    renders_at = -1
    saved_at = t.step
    saved_t = time.time()
    t_train = time.time()
    stop_file = os.path.join("outputs", "quality.stop")

    best_path = os.path.join(ckpt_root, "BEST.json")
    best = {"step": -1, "eval_sharp_psnr": -1.0}
    if os.path.exists(best_path):
        with open(best_path) as f:
            best = json.load(f)

    def save_ckpt():
        nonlocal saved_at, saved_t
        t.save(ckpt_root)
        os.makedirs(ckpt_root, exist_ok=True)
        with open(fixture_path, "w") as f:
            json.dump(fixture_knobs, f, indent=1)
        # 5-minute mid-interval checkpoints otherwise grow the ckpt root
        # without bound (ADVICE r3, low); keep a small resume window and
        # sweep orbax tmp leftovers from abrupt session ends — but NEVER
        # the best-eval checkpoint (r05: the newest-3 policy destroyed
        # the quality peak while the tail diverged).
        from casualhdrsplat_tpu.train import checkpoint as ckpt_mod

        ckpt_mod.prune_step_dirs(ckpt_root, keep=3, protect=best["step"])
        saved_at = t.step
        saved_t = time.time()

    m_round = __import__("re").search(r"r(\d+)", os.path.basename(args.out))
    round_no = int(m_round.group(1)) if m_round else 0

    def write_report():
        """Full report from the curve so far — called after EVERY eval AND
        on every exit path, even with an empty curve (round 4's at-spec
        report evaporated on an `if not curve: return` bail after a
        session ended at step 972 of step-based 1000-eval cadence).
        NEVER kill this process mid-step (it wedges the axon terminal for
        everyone): `touch outputs/quality.stop` instead."""
        got = np.asarray(t.params["log_exposures"])
        gt = np.log(np.asarray(video.exposures))
        got_c, gt_c = got - got.mean(), gt - gt.mean()
        exposure_rec = {
            "max_abs_log_ratio_err": float(np.abs(got_c - gt_c).max()),
            "mean_abs_log_ratio_err": float(np.abs(got_c - gt_c).mean()),
        }
        crf_rec = crf_recovery_rmse(t.params["crf"], cfg.model.crf, gamma=2.2)
        hdr_rec = hdr_recovery_metrics(
            t, video, eval_idx, t.active_sh_degree(), cfg.model.crf
        )
        rot1, trans1 = traj_errors()
        pose_rec = {
            "init_rot_deg_mean": float(rot0.mean()),
            "final_rot_deg_mean": float(rot1.mean()),
            "init_trans_mean": float(trans0.mean()),
            "final_trans_mean": float(trans1.mean()),
        }
        final = curve[-1] if curve else None
        report = {
            "round": round_no,
            "run_label": args.run_label,
            "fixture": dict(fixture_knobs),
            "scale": {
                "image": [args.size, args.size],
                "frames": n,
                "gt_gaussians": args.gt_gaussians,
                "capacity": args.capacity,
                "final_alive": (
                    final["alive"] if final
                    else int(jnp.sum(t.params["gaussians"]["alive"]))
                ),
                "steps": args.steps,
                "steps_done": int(t.step),
                "virtual_views": args.virtual_views,
            },
            "wall_s": {"gt_gen": round(gt_gen_s, 1),
                       "train": round(time.time() - t_train, 1)},
            "exposure_recovery": exposure_rec,
            "crf_recovery": crf_rec,
            "hdr_recovery": hdr_rec,
            "pose_recovery": pose_rec,
            "psnr_curve": [
                {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in e.items()} for e in curve
            ],
        }
        if final is not None:
            report["final_eval"] = {k: v for k, v in final.items()
                                    if k.startswith("eval")}
            report["deblurring_gain_db"] = round(
                final["eval_sharp_psnr"] - final["eval_sharp_psnr_input"], 3
            )
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, args.out)

    def dump_renders():
        """Deblur/input/GT triplets + exposure sweep — called after evals
        (not only at the end) so a wedged TPU still leaves the visual
        evidence of the latest scored state."""
        os.makedirs(args.render_dir, exist_ok=True)
        deg = t.active_sh_degree()
        for i in eval_idx[:3]:
            fid = jnp.asarray(int(i))
            deb = t._eval_render_deblurred(t.params, fid, deg)
            metrics_mod.save_image(
                os.path.join(args.render_dir, f"deblur_{i:03d}.png"), deb)
            metrics_mod.save_image(
                os.path.join(args.render_dir, f"input_{i:03d}.png"),
                jnp.asarray(ds.images[int(i)]))
            metrics_mod.save_image(
                os.path.join(args.render_dir, f"gt_sharp_{i:03d}.png"),
                jnp.asarray(ds.sharp_images[int(i)]))
        # exposure-editing sweep (teaser.png c.1)
        mid = t.scene.timestamps[2] + 0.5 * imf.exposure_of(t.params, 2)
        vm = imf.poses_at(t.params, t.scene, jnp.array([mid]), cfg.model)[0]
        for j, dt_v in enumerate([0.25, 1.0, 4.0]):
            ldr, _, _ = imf.render_pose(
                t.params, t.scene, vm, cfg.model, exposure=jnp.asarray(dt_v))
            metrics_mod.save_image(
                os.path.join(args.render_dir, f"sweep_{j}.png"), ldr)
        print("renders under", args.render_dir, flush=True)

    last_eval_t = time.time()
    last_out = None

    def do_eval(out):
        """Score the current state, append to the curve, write the report
        and a checkpoint — the unit of evidence a session leaves behind."""
        nonlocal renders_at, last_eval_t
        m = t.evaluate(indices=eval_idx)
        if args.holdout_every > 0:
            m.update({k: v for k, v in t.evaluate().items()
                      if k.startswith("eval_novel")})
        alive = int(jnp.sum(t.params["gaussians"]["alive"]))
        entry = {"step": t.step, "res": t.scene.width,
                 "loss": out["loss"] if out else None, "alive": alive,
                 "dropped": out["dropped"] if out else 0.0,
                 "clipped": out["clipped"] if out else 0.0,
                 **m, **recovery_now()}
        curve.append(entry)
        print(json.dumps(entry), flush=True)
        with open(args.out + ".progress", "a") as f:
            f.write(json.dumps(entry) + "\n")
        write_report()
        if m.get("eval_sharp_psnr", -1.0) > best["eval_sharp_psnr"]:
            best.update(step=int(t.step),
                        eval_sharp_psnr=float(m["eval_sharp_psnr"]))
            os.makedirs(ckpt_root, exist_ok=True)
            with open(best_path, "w") as f:
                json.dump(best, f)
        save_ckpt()  # resume point for the next TPU session
        last_eval_t = time.time()
        if t.step % 2000 == 0:
            dump_renders()
            renders_at = t.step

    while t.step < cfg.optim.max_steps:
        out = t.run_step()
        last_out = out
        if on_coarse and t.step >= args.coarse_steps:
            promote_to_full()
        if t.step % 200 == 0 and t.step % 1000 != 0:
            # cheap heartbeat between evals: overflow health at a glance
            print(json.dumps({"step": t.step, "loss": round(out["loss"], 5),
                              "dropped": out["dropped"],
                              "clipped": out["clipped"]}), flush=True)
        if time.time() - saved_t > 300.0:
            # mid-interval checkpoint (no eval), TIME-based: an abrupt
            # session end — the driver's wall-clock, not the cooperative
            # stop file — loses at most ~5 min of chip time regardless of
            # the step rate (2.9 s/step at heavy blur made the old
            # every-500-steps rule a ~25-min exposure).
            save_ckpt()
        if (t.step % 1000 == 0 or t.step == cfg.optim.max_steps
                or time.time() - last_eval_t > args.eval_every_s):
            do_eval(out)
        if os.path.exists(stop_file):
            print("stop file seen — finishing early", flush=True)
            break
        if args.max_minutes and (time.time() - t_start) > args.max_minutes * 60:
            print(f"max-minutes ({args.max_minutes}) reached — finishing "
                  "early", flush=True)
            break

    # Exit paths (stop file, max-minutes, or a resume that was already at
    # max_steps): score THIS session's endpoint and leave the report +
    # checkpoint current, whatever got us here.
    if not curve or curve[-1]["step"] != t.step:
        do_eval(last_out)
    elif t.step != saved_at:
        save_ckpt()
    print("wrote", args.out, flush=True)
    # Renders are EXPENSIVE at spec (eager 800² renders + sweep ≈ 15 min
    # of chip): dump on completion only — the 2000-step eval marks keep
    # mid-run visual evidence, and with time-based sessions an every-exit
    # dump was costing a session-length of chip time per relaunch (r05).
    if t.step >= cfg.optim.max_steps and renders_at != t.step:
        dump_renders()

    if t.step >= cfg.optim.max_steps:
        # HEADLINE metric (VERDICT r3 next-step 2): test-time pose-aligned
        # deblur gain — run at completion so every finished QUALITY report
        # carries the aligned keys without a separate eval_aligned launch.
        from casualhdrsplat_tpu.models import losses
        from casualhdrsplat_tpu.train.pose_align import make_aligner

        deg = t.active_sh_degree()
        align = make_aligner(cfg.model, steps=64, lr=2e-3, sh_degree=deg)
        raw_p, al_p, al_s, in_p, deltas = [], [], [], [], []
        for i in eval_idx:
            fid = jnp.asarray(int(i))
            gt = jnp.asarray(t.dataset.sharp_images[int(i)])
            dt = imf.exposure_of(t.params, fid)
            t_mid = t.scene.timestamps[fid] + 0.5 * dt
            vm = imf.poses_at(t.params, t.scene, jnp.array([t_mid]),
                              cfg.model)[0]
            raw, _, _ = imf.render_pose(
                t.params, t.scene, vm, cfg.model, exposure=dt, sh_degree=deg
            )
            aligned, delta, _ = align(t.params, t.scene, vm, dt, gt)
            raw_p.append(float(losses.psnr(raw, gt)))
            al_p.append(float(losses.psnr(aligned, gt)))
            al_s.append(float(losses.ssim(aligned, gt)))
            in_p.append(float(losses.psnr(jnp.asarray(t.dataset.images[int(i)]), gt)))
            d = np.asarray(delta)
            deltas.append({
                "frame": int(i),
                "rot_deg": round(float(np.degrees(np.linalg.norm(d[:3]))), 4),
                "trans": round(float(np.linalg.norm(d[3:])), 5),
            })
        block = {
            "protocol": "per-frame 6-DoF test-time pose alignment, scene/"
                        "CRF/exposure frozen (BARF / BAD-NeRF protocol); "
                        "64 Adam steps @ lr 2e-3",
            "at_step": int(t.step),
            "eval_sharp_psnr_raw": round(float(np.mean(raw_p)), 4),
            "eval_sharp_psnr_aligned": round(float(np.mean(al_p)), 4),
            "eval_sharp_ssim_aligned": round(float(np.mean(al_s)), 4),
            "eval_sharp_psnr_input": round(float(np.mean(in_p)), 4),
            "align_deltas": deltas,
        }
        # Aligned TRUE novel-view synthesis (VERDICT r3 Weak #6): held-out
        # frames, spline pose at the interpolated-exposure midpoint, same
        # 6-DoF test-time alignment — at non-zero trajectory error the raw
        # novel metric measures gauge, not synthesis quality.
        holdout = list(t.dataset.eval_indices)
        if holdout:
            nv_raw, nv_al, nv_ssim = [], [], []
            for i in holdout:
                fid = jnp.asarray(int(i))
                gt = jnp.asarray(t.dataset.sharp_images[int(i)])
                log_e = imf.interpolated_log_exposure(
                    t.params, t.dataset.timestamps,
                    t.dataset.train_indices, int(i),
                )
                dt = jnp.asarray(np.exp(log_e), jnp.float32)
                t_mid = t.scene.timestamps[fid] + 0.5 * dt
                vm = imf.poses_at(t.params, t.scene, jnp.array([t_mid]),
                                  cfg.model)[0]
                raw, _, _ = imf.render_pose(
                    t.params, t.scene, vm, cfg.model, exposure=dt,
                    sh_degree=deg,
                )
                aligned, _, _ = align(t.params, t.scene, vm, dt, gt)
                nv_raw.append(float(losses.psnr(raw, gt)))
                nv_al.append(float(losses.psnr(aligned, gt)))
                nv_ssim.append(float(losses.ssim(aligned, gt)))
            block["eval_novel_psnr_raw"] = round(float(np.mean(nv_raw)), 4)
            block["eval_novel_psnr_aligned"] = round(float(np.mean(nv_al)), 4)
            block["eval_novel_ssim_aligned"] = round(float(np.mean(nv_ssim)), 4)
        with open(args.out) as f:
            report = json.load(f)
        report["final_eval_aligned"] = block
        report["deblurring_gain_db_aligned"] = round(
            block["eval_sharp_psnr_aligned"] - block["eval_sharp_psnr_input"],
            3,
        )
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, args.out)
        print(
            f"aligned deblurring gain "
            f"{report['deblurring_gain_db_aligned']:+.2f} dB", flush=True,
        )


if __name__ == "__main__":
    main()
