"""Training orchestration (SURVEY.md C18, §3.1).

One jitted `train_step` spans the full differentiable chain — virtual-pose
spline sampling, HDR rasterization of all n virtual views in one launch,
CRF tone-mapping, blur synthesis, photometric + prior losses, per-group
Adam — so each iteration is a single device program (no per-virtual-view
Python loop, unlike the reference lineage's per-launch CUDA boundary at
every C1-C5 call, SURVEY.md §3.1).  ADC runs as a second jitted program on
its interval.  The screen-space gradient statistics ADC needs are taken
from the `means2d_offset` gradient tap (a zeros input added to projected
means, so autodiff surfaces d loss / d means2d without any bookkeeping in
the rasterizer).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.config import TrainConfig
from casualhdrsplat_tpu.data.dataset import Dataset, load_dataset
from casualhdrsplat_tpu.models import crf as crf_mod
from casualhdrsplat_tpu.models import image_formation as imf
from casualhdrsplat_tpu.models import losses
from casualhdrsplat_tpu.train import checkpoint as ckpt_mod
from casualhdrsplat_tpu.train import densify as densify_mod
from casualhdrsplat_tpu.train import metrics as metrics_mod
from casualhdrsplat_tpu.train import optim as optim_mod


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        dataset: Optional[Dataset] = None,
        devices=None,
    ):
        # `devices`: explicit mesh devices (virtual-CPU dryruns / tests);
        # default = jax.devices() via parallel.mesh.make_mesh.
        self.cfg = cfg
        self.dataset = dataset if dataset is not None else load_dataset(cfg.data)
        self.dataset.split(cfg.data.eval_every)
        self.scene = imf.build_scene(self.dataset, cfg.model)
        self.scene_extent = self.dataset.scene_extent()
        self.params = imf.init_params(
            self.scene,
            self.dataset.points_xyz,
            self.dataset.points_rgb,
            cfg.model,
            jax.random.PRNGKey(cfg.seed),
        )
        # mesh-parallel when the parallel config asks for >1 device
        # (SURVEY.md P1-P5): params/optimizer shard over (data, gauss) and
        # the train step renders through the shard_map path.
        self.mesh = None
        if cfg.parallel.data * cfg.parallel.gauss > 1:
            from casualhdrsplat_tpu.parallel import mesh as mesh_mod
            from casualhdrsplat_tpu.parallel import sharding as shard_mod

            self.mesh = mesh_mod.make_mesh(cfg.parallel, devices=devices)
            self.params = shard_mod.shard_params(self.params, self.mesh)
        self.opt = optim_mod.make_optimizer(cfg.optim, self.scene_extent)
        self.opt_state = self.opt.init(self.params)
        if self.mesh is not None:
            from casualhdrsplat_tpu.parallel import sharding as shard_mod

            self.opt_state = shard_mod.shard_opt_state(
                self.opt_state, self.params, self.mesh
            )
        self.adc = densify_mod.AdcState.zero(cfg.model.max_gaussians)
        self._init_log_exposures = jnp.asarray(self.params["log_exposures"])
        # oversized-splat watchdog state (_watch_overflow)
        self._clip_floor = float("inf")
        self._clip_warn_at = 0.0
        self._screen_prune_armed = False
        self._guard_shared_binning()
        self._guard_footprint_budget()
        self.images = jnp.asarray(self.dataset.images)
        self.step = 0
        self.key = jax.random.PRNGKey(cfg.seed + 1)
        self._rng = np.random.default_rng(cfg.seed + 2)
        self.logger: Optional[metrics_mod.MetricsLogger] = None
        self._image_diag = float(np.hypot(self.dataset.width, self.dataset.height))

    def _guard_shared_binning(self) -> None:
        """Startup self-guard (VERDICT r2 next-step 6): shared binning's
        Chebyshev radius inflation can multiply binning demand past the
        stream budget when within-exposure motion is large — the run then
        silently waterfills away a large fraction of every step's
        contributions and the fit plateaus (run 6).  Measure the inflated
        demand on a mid-sequence frame BEFORE compiling the train step and
        fall back to exact per-view binning, loudly, if it does not fit."""
        r = self.cfg.model.rasterize
        if not (r.packed and r.shared_binning
                and self.cfg.model.num_virtual_views > 1
                and self.cfg.model.optimize_poses):
            return
        probe = jax.jit(
            lambda p, s, f: imf.shared_binning_demand(p, s, f, self.cfg.model)
        )
        # max over frames: within-exposure motion varies along the video
        # (end segments of the padded spline move least), so one frame
        # under-estimates; the jit compiles once, frames are executions.
        shared = per_view = 0
        for f in range(self.dataset.timestamps.shape[0]):
            sh, pv, budget = probe(self.params, self.scene, jnp.asarray(f))
            shared, per_view = max(shared, int(sh)), max(per_view, int(pv))
        budget = int(budget)
        if shared <= budget:
            return
        if per_view <= budget:
            print(
                f"WARNING: shared binning disabled — motion-inflated "
                f"binning demand ({shared} rows) exceeds the stream "
                f"budget ({budget}); exact per-view binning fits "
                f"({per_view} rows/view) and is used instead. Raise "
                f"model.rasterize.stream_factor to keep shared binning "
                f"(docs/TUNING.md).",
                flush=True,
            )
            import dataclasses

            self.cfg.model.rasterize = dataclasses.replace(
                r, shared_binning=False
            )
        else:
            print(
                f"WARNING: binning demand exceeds the stream budget in "
                f"BOTH regimes (shared {shared}, per-view {per_view}, "
                f"budget {budget} rows) — training will waterfill-drop "
                f"contributions. Raise model.rasterize.stream_factor or "
                f"shrink footprints (docs/TUNING.md).",
                flush=True,
            )

    def _guard_footprint_budget(self) -> None:
        """Startup guard (round-4 root cause): if the INITIAL scene
        already exceeds max_tiles_per_gaussian, the center-clamp truncates
        VISIBLE coverage of splats the data requires — renders carry black
        bands, those splats' gradients are corrupted, and training enters
        a fatten-to-compensate runaway (measured: scene-only fit at GT
        poses diverged 17.9 -> 14.2 dB at mtpg=32; converged to 45 dB at
        mtpg=64 with nothing else changed).  One projection pass at the
        first frame pose; loud warning when >0.1% of visible splats clip.
        docs/TUNING.md 'clipped at step 0 is a correctness smell'."""
        import numpy as np

        from casualhdrsplat_tpu.models import gaussians as gauss_mod
        from casualhdrsplat_tpu.ops.binning import tile_grid
        from casualhdrsplat_tpu.ops.projection import (
            cull_invisible, project_gaussians,
        )

        r = self.cfg.model.rasterize
        g = {k: jnp.asarray(np.asarray(v))
             for k, v in self.params["gaussians"].items()}
        act = gauss_mod.activate(g)
        proj = cull_invisible(
            project_gaussians(
                act.means3d, act.quats, act.scales,
                jnp.asarray(self.dataset.viewmats[0]),
                self.scene.fx, self.scene.fy, self.scene.cx, self.scene.cy,
                self.scene.width, self.scene.height,
                near_plane=r.near_plane, antialias=r.antialias,
            ),
            act.opacities,
        )
        m2 = np.asarray(proj.means2d)
        rad = np.asarray(proj.radii)
        val = np.asarray(proj.valid)
        ntx, nty = tile_grid(self.scene.width, self.scene.height,
                             r.tile_h, r.tile_w)
        tx0 = np.clip(np.floor((m2[:, 0] - rad) / r.tile_w), 0, ntx - 1)
        tx1 = np.clip(np.floor((m2[:, 0] + rad) / r.tile_w), 0, ntx - 1)
        ty0 = np.clip(np.floor((m2[:, 1] - rad) / r.tile_h), 0, nty - 1)
        ty1 = np.clip(np.floor((m2[:, 1] + rad) / r.tile_h), 0, nty - 1)
        area = ((tx1 - tx0 + 1) * (ty1 - ty0 + 1))[val]
        n_vis = max(len(area), 1)
        n_over = int((area > r.max_tiles_per_gaussian).sum())
        if n_over > max(1, int(1e-3 * n_vis)):
            cut = int(np.maximum(area - r.max_tiles_per_gaussian, 0).sum())
            print(
                f"WARNING: {n_over}/{n_vis} visible splats of the INITIAL "
                f"scene exceed max_tiles_per_gaussian={r.max_tiles_per_gaussian} "
                f"({cut} bbox cells truncated at frame 0) — their visible "
                f"coverage will be cut and training can enter a fat-splat "
                f"runaway. Raise model.rasterize.max_tiles_per_gaussian "
                f"(docs/TUNING.md: 'clipped at step 0 is a correctness "
                f"smell').",
                flush=True,
            )

    # -- jitted programs ---------------------------------------------------

    def _c2f_sigma(self) -> float:
        """Coarse-to-fine blur sigma for the CURRENT step (host-side;
        passed traced so the schedule costs zero recompiles)."""
        n = self.cfg.loss.coarse_to_fine_steps
        if n <= 0:
            return 0.0
        return float(self.cfg.loss.coarse_sigma0) * max(
            0.0, 1.0 - self.step / n
        )

    @functools.partial(jax.jit, static_argnames=("self", "sh_degree"))
    def _train_step(self, params, opt_state, adc, images, frame_id,
                    blur_sigma, sh_degree):
        # `images` is an explicit device-resident arg (NOT read off `self`)
        # so the frame stack is not baked into the executable as a constant.
        # ADC stat accumulation runs INSIDE the step: eager per-step
        # dispatches each cost a host->device round trip on the tunneled
        # TPU backend (measured ~180 ms/step of pure dispatch overhead at
        # 131k capacity).
        cfg = self.cfg
        target = images[frame_id]
        offset = jnp.zeros((cfg.model.max_gaussians, 2))

        def loss_fn(p, off):
            if self.mesh is not None:
                from casualhdrsplat_tpu.parallel import render as prender

                out = prender.render_frame_sharded(
                    p, self.scene, frame_id, cfg.model, self.mesh,
                    sh_degree=sh_degree, means2d_offset=off,
                )
            else:
                out = imf.render_frame(
                    p, self.scene, frame_id, cfg.model,
                    sh_degree=sh_degree, means2d_offset=off,
                )
            pred, tgt = out.blurred_ldr, target
            if cfg.loss.coarse_to_fine_steps > 0:
                # kernel must cover ~3 sigma at the schedule's START
                k = int(3 * cfg.loss.coarse_sigma0) * 2 + 1
                pred = losses.gaussian_blur(pred, blur_sigma, k=k)
                tgt = losses.gaussian_blur(tgt, blur_sigma, k=k)
            photo = losses.photometric(pred, tgt, cfg.loss.ssim_lambda)
            loss = photo
            if cfg.loss.pose_anchor_weight > 0.0 and cfg.model.optimize_poses:
                # co-warp brake (VERDICT r3 next-step 1c): pin knot deltas
                # to the SfM init; see LossConfig.pose_anchor_weight
                kd = p["knot_deltas"]
                loss = loss + cfg.loss.pose_anchor_weight * jnp.mean(
                    jnp.sum(kd * kd, axis=-1)
                )
            if cfg.model.optimize_exposure:
                # gauge anchor at the INIT estimate (not log dt = 0: with
                # exposure_init_frac set, init already encodes the
                # plausible-shutter prior)
                loss = loss + cfg.loss.exposure_prior_weight * losses.exposure_prior(
                    p["log_exposures"], self._init_log_exposures
                )
            if cfg.model.crf.kind == "mlp":
                loss = loss + cfg.loss.crf_smoothness_weight * crf_mod.smoothness_prior(
                    p["crf"], cfg.model.crf
                )
                if cfg.loss.crf_chroma_weight > 0.0:
                    loss = loss + cfg.loss.crf_chroma_weight * crf_mod.chroma_prior(
                        p["crf"], cfg.model.crf
                    )
            aux = {
                "photo": photo,
                "psnr": losses.psnr(out.blurred_ldr, target),
                "radii": out.aux.radii,
                "num_dropped": out.aux.num_dropped,
                "num_clipped": out.aux.num_clipped,
            }
            return loss, aux

        (loss, aux), (grads, g2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True, allow_int=True
        )(params, offset)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: p + u if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params,
            updates,
        )
        adc = densify_mod.accumulate(
            adc, g2d, aux["radii"],
            image_size=(self.dataset.width, self.dataset.height),
        )
        # one fused scalar vector -> ONE host readback per step in run_step
        scalars = jnp.stack(
            [loss, aux["psnr"], aux["num_dropped"].astype(jnp.float32),
             aux["num_clipped"].astype(jnp.float32)]
        )
        return params, opt_state, adc, scalars

    @functools.partial(
        jax.jit, static_argnames=("self", "screen_prune", "prune_only")
    )
    def _densify(self, params, opt_state, adc, key, screen_prune,
                 prune_only=False):
        if self.mesh is not None:
            gauss, opt_state, adc, report = densify_mod.densify_and_prune_sharded(
                params["gaussians"], opt_state, adc, key,
                self.cfg.densify, self.scene_extent, self._image_diag,
                self.mesh, screen_prune=screen_prune, prune_only=prune_only,
            )
        else:
            gauss, opt_state, adc, report = densify_mod.densify_and_prune(
                params["gaussians"], opt_state, adc, key,
                self.cfg.densify, self.scene_extent, self._image_diag,
                screen_prune=screen_prune, prune_only=prune_only,
            )
        params = dict(params, gaussians=gauss)
        return params, opt_state, adc, report

    @functools.partial(jax.jit, static_argnames=("self",))
    def _rebalance(self, params, opt_state, adc):
        from casualhdrsplat_tpu.parallel.mesh import GAUSS_AXIS

        gauss, opt_state, adc = densify_mod.rebalance_store(
            params["gaussians"], opt_state, adc,
            self.mesh.shape[GAUSS_AXIS], mesh=self.mesh,
        )
        return dict(params, gaussians=gauss), opt_state, adc

    def _maybe_rebalance(self) -> bool:
        """After a sharded ADC round: repack the store across shards when
        per-shard alive counts drifted past the configured imbalance."""
        thr = self.cfg.densify.rebalance_threshold
        if self.mesh is None or thr <= 0:
            return False
        from casualhdrsplat_tpu.parallel.mesh import GAUSS_AXIS

        n_shards = self.mesh.shape[GAUSS_AXIS]
        if n_shards <= 1:
            return False
        counts = np.asarray(
            densify_mod.shard_alive_counts(
                self.params["gaussians"]["alive"], n_shards
            )
        )
        block = self.params["gaussians"]["alive"].shape[0] // n_shards
        if counts.max() - counts.min() <= thr * block:
            return False
        self.params, self.opt_state, self.adc = self._rebalance(
            self.params, self.opt_state, self.adc
        )
        return True

    # -- loop --------------------------------------------------------------

    def active_sh_degree(self) -> int:
        if not self.cfg.densify.enabled:
            return self.cfg.model.sh_degree
        return min(
            self.step // self.cfg.densify.sh_degree_interval,
            self.cfg.model.sh_degree,
        )

    def run_step(self) -> Dict[str, float]:
        pool = self.dataset.train_indices
        frame = int(self._rng.choice(pool))
        self.params, self.opt_state, self.adc, scalars = self._train_step(
            self.params, self.opt_state, self.adc, self.images,
            jnp.asarray(frame), jnp.asarray(self._c2f_sigma(), jnp.float32),
            self.active_sh_degree(),
        )
        self.step += 1
        d = self.cfg.densify
        in_window = d.enabled and d.start_iter <= self.step <= d.stop_iter
        if in_window and self.step % d.interval == 0:
            self.key, sub = jax.random.split(self.key)
            self.params, self.opt_state, self.adc, report = self._densify(
                self.params, self.opt_state, self.adc, sub,
                densify_mod.screen_prune_active(self.step, d)
                or self._screen_prune_armed,
            )
            self._maybe_rebalance()
        elif (
            d.enabled
            and not in_window
            and (
                self._screen_prune_armed
                or densify_mod.screen_prune_active(self.step, d)
            )
            and self.step % d.interval == 0
        ):
            # Oversized-splat response OUTSIDE the ADC window (VERDICT r3
            # Weak #2): prune-only rounds — no clone/split growth after
            # densify.stop_iter, just screen-radius pruning.  Runs
            # whenever the screen prune is armed — by the clipped-counter
            # watchdog OR by the explicit screen_prune_from config (r05
            # at-spec: pruning stopped with the window at step 2400 and
            # the clipped counter ran away 8k->74k in 700 steps, -4 dB of
            # train fit, while the watchdog's 2%-of-budget trigger sat
            # 36x higher; a no-op prune round is cheap insurance).
            self.key, sub = jax.random.split(self.key)
            self.params, self.opt_state, self.adc, report = self._densify(
                self.params, self.opt_state, self.adc, sub,
                True, prune_only=True,
            )
        else:
            report = None
        # Reset only while densification is active: the lineage stops at
        # stop_iter, else the FINAL checkpoint could be saved with every
        # opacity clamped near-transparent (ADVICE r1, high).
        if (
            d.enabled
            and self.step < d.stop_iter
            and self.step % d.opacity_reset_interval == 0
        ):
            self.params = dict(
                self.params,
                gaussians=densify_mod.reset_opacity(self.params["gaussians"]),
            )
        loss_v, psnr_v, dropped_v, clipped_v = np.asarray(scalars)
        # binning-budget overflow is an APPROXIMATION (waterfilled far-tail
        # drop per tile) — surfaced so a blown budget is never silent
        out = {
            "loss": float(loss_v),
            "psnr": float(psnr_v),
            "dropped": float(dropped_v),
            "clipped": float(clipped_v),
        }
        if report is not None:
            out.update(
                cloned=int(report.num_cloned),
                split=int(report.num_split),
                pruned=int(report.num_pruned),
                alive=int(report.num_alive),
            )
        self._watch_overflow(out)
        return out

    def _watch_overflow(self, out: Dict[str, float]) -> None:
        """Oversized-splat watchdog (VERDICT r3 Weak #2): `clipped` (bbox
        cells cut by the max_tiles_per_gaussian clamp) is the on-device
        symptom of splats blowing past their binning footprint — the r03
        at-spec divergence grew it 410k -> 2.6M over 3000 steps and
        nothing reacted.  Warn (once per doubling) when it rises well past
        its observed floor AND a meaningful fraction of the bbox budget,
        and arm the automatic screen-size prune."""
        clipped = out["clipped"]
        self._clip_floor = min(self._clip_floor, clipped)
        r = self.cfg.model.rasterize
        n_streams = (
            1
            if (r.packed and r.shared_binning
                and self.cfg.model.num_virtual_views > 1)
            else self.cfg.model.num_virtual_views
        )
        budget = float(
            r.max_tiles_per_gaussian * self.cfg.model.max_gaussians * n_streams
        )
        trigger = max(
            3.0 * self._clip_floor, 0.02 * budget, self._clip_warn_at
        )
        if clipped > trigger:
            print(
                f"WARNING step {self.step}: {clipped:.0f} bbox cells "
                f"clipped by the max_tiles_per_gaussian clamp "
                f"({clipped / budget:.1%} of the bbox budget, floor was "
                f"{self._clip_floor:.0f}) — splats are outgrowing their "
                f"binning footprint; arming the automatic screen-size "
                f"prune (densify.prune_screen_radius="
                f"{self.cfg.densify.prune_screen_radius}). See "
                f"docs/TUNING.md.",
                flush=True,
            )
            self._clip_warn_at = 2.0 * clipped
            self._screen_prune_armed = True

    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        out_dir = os.path.join(cfg.out_dir, cfg.name)
        self.logger = self.logger or metrics_mod.MetricsLogger(out_dir)
        timer = metrics_mod.Timer()
        last: Dict[str, float] = {}
        # Persistent stream-budget overflow corrupts gradients (the fit
        # plateaus; see docs/TUNING.md) — make it LOUD, once.
        r = cfg.model.rasterize
        # shared binning = ONE stream per frame; per-view = one per view
        n_streams = (
            1
            if (r.packed and r.shared_binning
                and cfg.model.num_virtual_views > 1)
            else cfg.model.num_virtual_views
        )
        stream_budget = (
            min(r.stream_factor, r.max_tiles_per_gaussian)
            * cfg.model.max_gaussians
            * n_streams
        )
        overflow_warned = False
        while self.step < cfg.optim.max_steps:
            last = self.run_step()
            if not overflow_warned and last["dropped"] > 0.05 * stream_budget:
                print(
                    f"WARNING step {self.step}: {last['dropped']:.0f} "
                    f"intersections dropped (> 5% of the "
                    f"{stream_budget}-row stream budget). Training "
                    "gradients are being truncated — raise "
                    "model.rasterize.stream_factor or reduce footprint "
                    "demand (docs/TUNING.md).",
                    flush=True,
                )
                overflow_warned = True
            if self.step % cfg.log_every == 0:
                dt = timer.lap()
                mpix = (
                    cfg.log_every
                    * self.dataset.width
                    * self.dataset.height
                    * cfg.model.num_virtual_views
                    / max(dt, 1e-9)
                    / 1e6
                )
                self.logger.log(self.step, mpix_s=mpix, **last)
            if cfg.eval_every and self.step % cfg.eval_every == 0:
                self.logger.log(self.step, **self.evaluate())
            if cfg.checkpoint_every and self.step % cfg.checkpoint_every == 0:
                self.save(out_dir)
        self.save(out_dir)
        return last

    # -- eval / io ---------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "sh_degree"))
    def _eval_render(self, params, frame_id, sh_degree):
        # jit on the method (self static) so repeated evaluate() calls hit
        # the executable cache instead of re-tracing a fresh lambda each
        # interval (VERDICT r1 weak-4).
        if self.mesh is not None:
            from casualhdrsplat_tpu.parallel import render as prender

            return prender.render_frame_sharded(
                params, self.scene, frame_id, self.cfg.model,
                self.mesh, sh_degree=sh_degree,
            )
        return imf.render_frame(
            params, self.scene, frame_id, self.cfg.model, sh_degree=sh_degree
        )

    @functools.partial(jax.jit, static_argnames=("self", "sh_degree"))
    def _eval_render_novel(self, params, frame_id, exposure, sh_degree):
        """Held-out novel-view render: deblurred single-pose render at an
        EXPLICIT exposure (interpolated from neighboring train frames —
        the held-out frame's own exposure entry never trained)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            params = jax.tree.map(lambda x: jax.sharding.reshard(x, rep), params)
        ldr, _, _ = imf.render_deblurred(
            params, self.scene, frame_id, self.cfg.model,
            sh_degree=sh_degree, exposure=exposure,
        )
        return ldr

    @functools.partial(jax.jit, static_argnames=("self", "sh_degree"))
    def _eval_render_deblurred(self, params, frame_id, sh_degree):
        if self.mesh is not None:
            # one all-gather of the store per eval render: the deblurred
            # path is a single-pose render, cheap enough replicated
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            # reshard (not with_sharding_constraint): only reshard updates
            # the sharding-in-types spec that downstream dynamic_slices see
            params = jax.tree.map(lambda x: jax.sharding.reshard(x, rep), params)
        ldr, _, _ = imf.render_deblurred(
            params, self.scene, frame_id, self.cfg.model, sh_degree=sh_degree
        )
        return ldr

    @functools.partial(jax.jit, static_argnames=("self", "sh_degree"))
    def _eval_render_deblurred_hdr(self, params, frame_id, sh_degree):
        """Deblurred mid-exposure render in LINEAR HDR radiance (CRF
        skipped) — the 'render HDR images' output (Readme.md:54), used by
        the gauge-aligned HDR-recovery metric (VERDICT r3 next-step 5)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            params = jax.tree.map(lambda x: jax.sharding.reshard(x, rep), params)
        hdr, _, _ = imf.render_deblurred(
            params, self.scene, frame_id, self.cfg.model,
            hdr_output=True, sh_degree=sh_degree,
        )
        return hdr

    @functools.partial(jax.jit, static_argnames=("self",))
    def _metric_vector(self, pred, target):
        """[psnr, ssim, ms_ssim] as ONE device vector — evaluate() reads
        each frame's metrics in a single host readback instead of ~3-8
        blocking float() calls per frame (VERDICT r2 Weak #7)."""
        return jnp.stack([
            losses.psnr(pred, target),
            losses.ssim(pred, target),
            losses.ms_ssim(pred, target),
        ])

    def evaluate(self, indices=None) -> Dict[str, float]:
        """Score the model on held-out frames.

        Always: PSNR/SSIM/MS-SSIM (and LPIPS when available) of the synthesized
        blurred frame B_i vs the captured frame.  When the dataset carries
        ground-truth sharp frames (synthetic fixtures), additionally scores
        the DEBLURRED mid-exposure render vs sharp GT (`eval_sharp_psnr`,
        the paper's headline deblurring metric, teaser.png c.2) alongside
        the captured blurry input's own PSNR vs sharp GT
        (`eval_sharp_psnr_input`) — the deblurring gain is their gap."""
        idx = indices if indices is not None else self.dataset.eval_indices
        if len(idx) == 0:
            idx = self.dataset.train_indices[:2]
        deg = self.active_sh_degree()
        from casualhdrsplat_tpu.models import perceptual

        psnrs, ssims, msssims, lpips_vals = [], [], [], []
        sharp_psnrs, sharp_in_psnrs, sharp_ssims, sharp_msssims = [], [], [], []
        sharp_gt = self.dataset.sharp_images
        for i in idx:
            fid = jnp.asarray(int(i))
            out = self._eval_render(self.params, fid, deg)
            target = self.images[int(i)]
            pm, sm, mm = np.asarray(
                self._metric_vector(out.blurred_ldr, target)
            )
            psnrs.append(pm)
            ssims.append(sm)
            msssims.append(mm)
            lp = perceptual.lpips(np.asarray(out.blurred_ldr), np.asarray(target))
            if lp is not None:
                lpips_vals.append(lp)
            if sharp_gt is not None:
                gt = jnp.asarray(sharp_gt[int(i)])
                deb = self._eval_render_deblurred(self.params, fid, deg)
                spm, ssm, smm = np.asarray(self._metric_vector(deb, gt))
                sharp_psnrs.append(spm)
                sharp_ssims.append(ssm)
                sharp_msssims.append(smm)
                sharp_in_psnrs.append(float(losses.psnr(target, gt)))
        metrics = {
            "eval_psnr": float(np.mean(psnrs)),
            "eval_ssim": float(np.mean(ssims)),
            "eval_ms_ssim": float(np.mean(msssims)),
        }
        # TRUE held-out novel-view eval (SURVEY.md §6): frames excluded
        # from training, rendered at the spline pose with an exposure
        # interpolated from neighboring train frames, scored against GT
        # sharp frames.  Only meaningful when a holdout exists and the
        # dataset carries sharp GT.
        if (
            indices is None
            and len(self.dataset.eval_indices) > 0
            and len(self.dataset.train_indices) > 0
            and sharp_gt is not None
        ):
            novel_psnrs, novel_ssims = [], []
            for i in self.dataset.eval_indices:
                log_e = imf.interpolated_log_exposure(
                    self.params, self.dataset.timestamps,
                    self.dataset.train_indices, int(i),
                )
                ldr = self._eval_render_novel(
                    self.params, jnp.asarray(int(i)),
                    jnp.asarray(np.exp(log_e), jnp.float32), deg,
                )
                gt = jnp.asarray(sharp_gt[int(i)])
                npm, nsm, _ = np.asarray(self._metric_vector(ldr, gt))
                novel_psnrs.append(npm)
                novel_ssims.append(nsm)
            metrics["eval_novel_psnr"] = float(np.mean(novel_psnrs))
            metrics["eval_novel_ssim"] = float(np.mean(novel_ssims))
        if lpips_vals:
            metrics["eval_lpips"] = float(np.mean(lpips_vals))
        if sharp_psnrs:
            metrics["eval_sharp_psnr"] = float(np.mean(sharp_psnrs))
            metrics["eval_sharp_ssim"] = float(np.mean(sharp_ssims))
            metrics["eval_sharp_ms_ssim"] = float(np.mean(sharp_msssims))
            metrics["eval_sharp_psnr_input"] = float(np.mean(sharp_in_psnrs))
        return metrics

    def save(self, out_dir: str) -> str:
        out_abs = os.path.abspath(out_dir)
        path = os.path.join(out_abs, f"step_{self.step}")
        ckpt_mod.save(
            path,
            {
                "params": self.params,
                "opt_state": self.opt_state,
                "adc": self.adc._asdict(),
                "step": self.step,
            },
        )
        # Persist the resolved config beside the checkpoints: the param /
        # optimizer tree structure depends on it (CRF kind, capacity, ...),
        # so render/eval/export must reconstruct the SAME config or orbax
        # restore fails on a mismatched template (CLI auto-loads this).
        # Written on EVERY save, atomically: an exists-guard would keep a
        # stale (or truncated, after a crash mid-write) config.json from a
        # previous run into the same out_dir.
        cfg_path = os.path.join(out_abs, "config.json")
        import json

        from casualhdrsplat_tpu import config as config_mod

        tmp = cfg_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(config_mod.to_dict(self.cfg), f, indent=1)
        os.replace(tmp, cfg_path)
        return path

    def load(self, path: str) -> None:
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "adc": self.adc._asdict(),
            "step": self.step,
        }
        payload = ckpt_mod.restore(path, template)
        self.params = payload["params"]
        self.opt_state = payload["opt_state"]
        self.adc = densify_mod.AdcState(**payload["adc"])
        self.step = int(payload["step"])
