"""Deblurred-render evaluation harness (SURVEY.md C20; teaser.png c.2
"sharpen the train images"): on synthetic data with ground-truth sharp
frames, `Trainer.evaluate` must score the deblurred mid-exposure render
against sharp GT, and after training the deblurred render must be CLOSER
to sharp GT than the captured blurry input is."""

import numpy as np
import pytest

from casualhdrsplat_tpu import config
from casualhdrsplat_tpu.data import dataset as dataset_mod
from casualhdrsplat_tpu.train.trainer import Trainer


def _cfg(**model_kw):
    cfg = config.TrainConfig(name="sharp-eval-test")
    cfg.model.max_gaussians = 128
    cfg.model.sh_degree = 1
    cfg.model.num_virtual_views = 4
    cfg.model.crf.kind = "gamma"
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=16, tile_capacity=128, max_tiles_per_gaussian=32,
        chunk=32, backend="xla", packed=False,
    )
    cfg.densify.enabled = False
    cfg.data.eval_every = 0
    cfg.log_every = 10**9
    cfg.eval_every = 0
    cfg.checkpoint_every = 0
    for k, v in model_kw.items():
        setattr(cfg.model, k, v)
    return cfg


@pytest.fixture(scope="module")
def blurry_dataset():
    # strong blur so the sharp-GT-vs-input PSNR leaves the model headroom
    return dataset_mod.make_synthetic_dataset(
        seed=11, n_gaussians=60, n_frames=4, n_virtual=6, size=24,
        angle_span=0.8, exposure_range=(0.8, 1.3),
    )


def test_evaluate_reports_sharp_metrics(blurry_dataset):
    t = Trainer(_cfg(), blurry_dataset)
    m = t.evaluate()
    for key in ("eval_sharp_psnr", "eval_sharp_ssim", "eval_sharp_psnr_input"):
        assert key in m and np.isfinite(m[key]), m


def test_evaluate_without_sharp_gt_omits_metrics(blurry_dataset):
    import dataclasses

    ds = dataclasses.replace(blurry_dataset, sharp_images=None)
    t = Trainer(_cfg(), ds)
    m = t.evaluate()
    assert "eval_sharp_psnr" not in m


def test_eval_render_jits_are_cached(blurry_dataset):
    t = Trainer(_cfg(), blurry_dataset)
    t.evaluate()
    misses0 = t._eval_render._cache_size()
    t.evaluate()
    assert t._eval_render._cache_size() == misses0


@pytest.mark.slow
def test_deblurred_beats_blurry_input_after_training(rng):
    """With the scene frozen at GT (gaussian lrs = 0) and the spline knots
    perturbed, pose-refinement training must produce deblurred renders
    that score HIGHER against sharp GT than the blurry captures do — the
    measurable deblurring gain of Readme.md:54 'sharpen the train
    images'."""
    import jax
    import jax.numpy as jnp

    from casualhdrsplat_tpu.data import synthetic
    from casualhdrsplat_tpu.models import gaussians as gauss_mod  # noqa: F401
    from casualhdrsplat_tpu.ops import sh as sh_ops

    n = 40
    video = synthetic.make_casual_video(
        rng, n_gaussians=n, n_frames=4, n_virtual=6, size=24,
        angle_span=2.4, exposure_range=(1.0, 1.5),
    )
    ds = dataset_mod.Dataset(
        images=np.asarray(video.images),
        timestamps=np.asarray(video.timestamps),
        viewmats=np.asarray(
            [np.asarray(video.knots[2 + i]) for i in range(4)], np.float32
        ),
        fx=float(video.camera.fx), fy=float(video.camera.fy),
        cx=float(video.camera.cx), cy=float(video.camera.cy),
        width=video.camera.width, height=video.camera.height,
        points_xyz=np.asarray(video.cloud.means3d),
        points_rgb=np.clip(np.asarray(video.cloud.colors), 0, 1),
        sharp_images=np.asarray(video.sharp_ldr),
    )
    cfg = _cfg(num_virtual_views=6, optimize_exposure=False)
    cfg.model.max_gaussians = 64
    # freeze the Gaussian store: this rung isolates pose-driven deblurring
    cfg.optim.means_lr_init = cfg.optim.means_lr_final = 0.0
    cfg.optim.scales_lr = cfg.optim.quats_lr = 0.0
    cfg.optim.opacities_lr = cfg.optim.sh_dc_lr = 0.0
    cfg.optim.exposure_lr = 0.0
    cfg.optim.pose_lr_init = 2e-3
    cfg.optim.pose_lr_final = 2e-3
    cfg.optim.max_steps = 250
    t = Trainer(cfg, ds)
    g = t.params["gaussians"]
    g["means"] = g["means"].at[:n].set(video.cloud.means3d)
    g["quats"] = g["quats"].at[:n].set(video.cloud.quats)
    g["log_scales"] = g["log_scales"].at[:n].set(jnp.log(video.cloud.scales))
    g["opacity_logit"] = g["opacity_logit"].at[:n].set(
        jnp.log(video.cloud.opacities / (1 - video.cloud.opacities))
    )
    g["sh_dc"] = g["sh_dc"].at[:n, 0].set(sh_ops.rgb_to_sh_dc(video.cloud.colors))
    g["sh_rest"] = jnp.zeros_like(g["sh_rest"])
    t.params["log_exposures"] = jnp.log(jnp.asarray(video.exposures))
    t.params["knot_deltas"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(7), t.params["knot_deltas"].shape
    )
    m0 = t.evaluate(indices=t.dataset.train_indices)
    for _ in range(cfg.optim.max_steps):
        t.run_step()
    m = t.evaluate(indices=t.dataset.train_indices)
    # deblurring gain: the model's sharp render beats the blurry capture
    assert m["eval_sharp_psnr"] > m["eval_sharp_psnr_input"], (m0, m)
    # and pose refinement improved the sharp render itself
    assert m["eval_sharp_psnr"] > m0["eval_sharp_psnr"], (m0, m)


def test_eval_render_deblurred_hdr_linear_output():
    """HDR deblur render path (Readme.md:54 'render HDR images'): linear
    radiance, CRF skipped, nonnegative, can exceed 1.0 on HDR content."""
    import jax.numpy as jnp

    ds = dataset_mod.make_synthetic_dataset(
        seed=3, n_gaussians=50, n_frames=4, n_virtual=2, size=20, hdr_max=3.0
    )
    t = Trainer(_cfg(), ds)
    hdr = t._eval_render_deblurred_hdr(t.params, jnp.asarray(1), 1)
    assert hdr.shape == (20, 20, 3)
    assert bool(jnp.all(hdr >= 0.0))
    # same pose through the LDR path with gamma CRF: ldr = clip(hdr*dt)^(1/g)
    ldr = t._eval_render_deblurred(t.params, jnp.asarray(1), 1)
    from casualhdrsplat_tpu.models import image_formation as imf

    dt = imf.exposure_of(t.params, 1)
    want = jnp.clip(hdr * dt, 0.0, 1.0) ** (1.0 / t.cfg.model.crf.gamma)
    np.testing.assert_allclose(np.asarray(ldr), np.asarray(want), atol=1e-5)


def test_hdr_recovery_metrics_gauge_invariance():
    """quality_run.hdr_recovery_metrics: a radiance field that matches GT
    up to the global scale gauge scores near-perfect HDR PSNR and sweep
    consistency (the alignment is exactly one scalar)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import types

    import jax.numpy as jnp

    from quality_run import hdr_recovery_metrics

    rng = np.random.default_rng(0)
    gt = rng.uniform(0.05, 3.0, size=(2, 8, 8, 3)).astype(np.float32)

    class StubT:
        params = {"crf": {}}

        def _eval_render_deblurred_hdr(self, params, fid, deg):
            return jnp.asarray(gt[int(fid)] / 1.7)  # pure gauge offset

    video = types.SimpleNamespace(sharp_hdr=gt)
    crf_cfg = config.CRFConfig(kind="gamma", gamma=2.2)
    m = hdr_recovery_metrics(StubT(), video, [0, 1], 1, crf_cfg)
    assert m["eval_hdr_psnr"] > 60.0, m
    np.testing.assert_allclose(m["scale_gauge"], 1.7, rtol=1e-4)
    assert all(v > 60.0 for v in m["exposure_sweep_psnr"].values()), m
