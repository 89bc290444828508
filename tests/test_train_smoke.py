"""End-to-end training smoke tests (SURVEY.md §4.3 golden runs): short
trainings on tiny synthetic scenes asserting loss decrease / PSNR rise,
plus checkpoint round-trips through the Trainer."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from casualhdrsplat_tpu import config
from casualhdrsplat_tpu.data import dataset as dataset_mod
from casualhdrsplat_tpu.train.trainer import Trainer


def tiny_cfg(**model_kw):
    cfg = config.TrainConfig(name="smoke")
    cfg.model.max_gaussians = 128
    cfg.model.sh_degree = 1
    cfg.model.num_virtual_views = 2
    cfg.model.crf.kind = "identity"
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=16, tile_capacity=64, max_tiles_per_gaussian=32,
        chunk=32, backend="xla",
    )
    cfg.densify.enabled = False
    cfg.optim.max_steps = 25
    cfg.log_every = 10**9
    cfg.eval_every = 0
    cfg.checkpoint_every = 0
    for k, v in model_kw.items():
        setattr(cfg.model, k, v)
    return cfg


@pytest.fixture(scope="module")
def tiny_dataset():
    return dataset_mod.make_synthetic_dataset(
        seed=3, n_gaussians=50, n_frames=4, n_virtual=2, size=20
    )


def test_loss_decreases(tiny_dataset, tmp_path):
    cfg = tiny_cfg()
    cfg.out_dir = str(tmp_path)
    t = Trainer(cfg, tiny_dataset)
    first = [t.run_step()["loss"] for _ in range(5)]
    for _ in range(30):
        last = t.run_step()
    assert last["loss"] < np.mean(first), (first, last)


def test_densify_in_loop(tiny_dataset):
    cfg = tiny_cfg()
    cfg.densify.enabled = True
    cfg.densify.start_iter = 2
    cfg.densify.interval = 5
    cfg.densify.grad_threshold = 1e-8  # force clones/splits
    cfg.densify.opacity_reset_interval = 10**9
    t = Trainer(cfg, tiny_dataset)
    alive0 = int(jnp.sum(t.params["gaussians"]["alive"]))
    stats = None
    for _ in range(11):
        s = t.run_step()
        stats = s if "alive" in s else stats
    assert stats is not None
    assert stats["alive"] > alive0


def test_checkpoint_roundtrip(tiny_dataset, tmp_path):
    cfg = tiny_cfg()
    cfg.out_dir = str(tmp_path)
    t = Trainer(cfg, tiny_dataset)
    for _ in range(3):
        t.run_step()
    path = t.save(str(tmp_path / "ckpt"))
    t2 = Trainer(cfg, tiny_dataset)
    t2.load(path)
    assert t2.step == t.step
    np.testing.assert_allclose(
        t2.params["gaussians"]["means"], t.params["gaussians"]["means"]
    )
    # resumed training continues bit-identically (same rng seed path)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(t2.params["log_exposures"] - t.params["log_exposures"])),
        0.0,
    )


def test_evaluate_returns_metrics(tiny_dataset):
    cfg = tiny_cfg()
    t = Trainer(cfg, tiny_dataset)
    m = t.evaluate()
    assert "eval_psnr" in m and np.isfinite(m["eval_psnr"])


def test_hdr_rgbe_round_trip(tmp_path):
    """Radiance .hdr writer (C20 'render HDR images' interop): RGBE
    round-trips linear radiance within the format's ~0.4% mantissa
    quantization, across several exposure stops."""
    import numpy as np

    from casualhdrsplat_tpu.train import metrics

    rng = np.random.default_rng(0)
    img = (rng.uniform(0.0, 1.0, size=(7, 11, 3)) ** 2).astype(np.float32)
    img *= np.logspace(-3, 2, 7)[:, None, None]  # HDR dynamic range
    img[0, 0] = 0.0  # exact-black pixel
    path = str(tmp_path / "x.hdr")
    metrics.save_hdr(path, img)
    back = metrics.load_hdr(path)
    assert back.shape == img.shape
    # RGBE error bound: the 8-bit mantissa is shared per pixel, so the
    # absolute error is ~1/256 of the pixel's BRIGHTEST channel
    bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-30
    assert np.all(np.abs(back - img) <= bound)
    with open(path, "rb") as f:
        assert f.read(10) == b"#?RADIANCE"


def test_dense_knot_grid_trains(tiny_dataset, tmp_path):
    # knots_per_frame > 1: build_scene resamples the frame-rate init onto
    # the sub-frame grid; the whole joint step must remain jittable.
    cfg = tiny_cfg(knots_per_frame=3)
    cfg.out_dir = str(tmp_path)
    t = Trainer(cfg, tiny_dataset)
    f = tiny_dataset.timestamps.shape[0]
    assert t.params["knot_deltas"].shape[0] == (f - 1) * 3 + 3 + 4 + 1
    first = [t.run_step()["loss"] for _ in range(5)]
    for _ in range(25):
        last = t.run_step()
    assert last["loss"] < np.mean(first), (first, last)


def test_shared_binning_self_guard(capsys):
    # High within-exposure camera-frame wobble (long exposures + strong
    # shake between frame poses) whose Chebyshev inflation exceeds the
    # stream budget while exact per-view binning still fits: the startup
    # guard must fall back LOUDLY instead of silently waterfilling
    # (VERDICT r2 next-step 6 / run-6 failure mode).
    def build(shake):
        ds = dataset_mod.make_synthetic_dataset(
            seed=5, n_gaussians=2000, n_frames=4, n_virtual=3, size=64,
            angle_span=0.2, exposure_range=(0.8, 1.0),
            scale_range=(0.005, 0.02), shake_rot=shake, shake_trans=shake / 6,
        )
        cfg = tiny_cfg(num_virtual_views=3, max_gaussians=2048)
        cfg.model.rasterize = config.RasterizeConfig(
            tile_h=8, tile_w=8, tile_capacity=64, max_tiles_per_gaussian=16,
            chunk=32, backend="xla", packed=True, shared_binning=True,
            stream_factor=8,
        )
        return Trainer(cfg, ds)

    t = build(shake=0.3)
    out = capsys.readouterr().out
    assert not t.cfg.model.rasterize.shared_binning
    assert "shared binning disabled" in out

    # ...and a becalmed fixture keeps shared binning on
    t2 = build(shake=0.0)
    assert t2.cfg.model.rasterize.shared_binning


def test_footprint_budget_guard_warns_at_startup(capsys):
    """Round-4 guard: an initial scene whose splats exceed the
    max_tiles_per_gaussian footprint must be flagged BEFORE training (the
    truncated-coverage runaway diverged even a GT-pose fit)."""
    ds = dataset_mod.make_synthetic_dataset(
        seed=3, n_gaussians=60, n_frames=4, n_virtual=2, size=64
    )
    cfg = tiny_cfg()
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=8, tile_capacity=128, max_tiles_per_gaussian=2,
        chunk=32, backend="xla",
    )
    Trainer(cfg, ds)
    out = capsys.readouterr().out
    assert "max_tiles_per_gaussian" in out and "INITIAL" in out

    # ...and a sufficient budget stays quiet
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=8, tile_capacity=128, max_tiles_per_gaussian=64,
        chunk=32, backend="xla",
    )
    Trainer(cfg, ds)
    assert "INITIAL" not in capsys.readouterr().out


def test_pose_anchor_pulls_deltas_to_init(tiny_dataset):
    """LossConfig.pose_anchor_weight (co-warp brake): a dominant anchor
    drives perturbed knot deltas back toward the SfM init."""
    cfg = tiny_cfg()
    cfg.loss.pose_anchor_weight = 10.0
    cfg.optim.pose_lr_init = 1e-2
    cfg.optim.pose_warmup_steps = 0
    t = Trainer(cfg, tiny_dataset)
    t.params["knot_deltas"] = jnp.full_like(t.params["knot_deltas"], 0.05)
    n0 = float(jnp.linalg.norm(t.params["knot_deltas"]))
    for _ in range(10):
        t.run_step()
    n1 = float(jnp.linalg.norm(t.params["knot_deltas"]))
    assert n1 < 0.5 * n0, (n0, n1)


def test_clipped_watchdog_arms_screen_prune(capsys):
    """Oversized-splat watchdog (VERDICT r3 Weak #2 / next-step 4): when
    the `clipped` counter blows past its observed floor, the trainer must
    warn loudly AND start prune-only ADC rounds even though the densify
    window is over — r03 carried a 6x clipped explosion silently for 3000
    steps."""
    ds = dataset_mod.make_synthetic_dataset(
        seed=3, n_gaussians=60, n_frames=4, n_virtual=2, size=64
    )
    cfg = tiny_cfg()
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=8, tile_capacity=128, max_tiles_per_gaussian=4,
        chunk=32, backend="xla",
    )
    cfg.densify.enabled = True
    cfg.densify.start_iter = 1
    cfg.densify.stop_iter = 2  # ADC window ends immediately
    cfg.densify.interval = 2
    cfg.densify.grad_threshold = 1e9  # no clone/split noise
    cfg.densify.prune_screen_radius = 0.10
    cfg.densify.opacity_reset_interval = 10**9
    t = Trainer(cfg, ds)
    # small splats (kNN init on 60 sparse points is coarse): the clipped
    # floor must start near zero for growth to be observable
    t.params["gaussians"] = dict(
        t.params["gaussians"],
        log_scales=jnp.full_like(
            t.params["gaussians"]["log_scales"], np.log(0.01)
        ),
    )
    for _ in range(4):
        t.run_step()  # establish a low clipped floor
    assert not t._screen_prune_armed
    # blow up a third of the splats far past their binning footprint
    ls = np.array(t.params["gaussians"]["log_scales"])
    ls[:20] = np.log(2.0)
    t.params["gaussians"] = dict(
        t.params["gaussians"], log_scales=jnp.asarray(ls)
    )
    alive0 = int(jnp.sum(t.params["gaussians"]["alive"]))
    seen_prune = False
    for _ in range(6):
        out = t.run_step()
        if out.get("pruned", 0) > 0:
            seen_prune = True
    assert t._screen_prune_armed
    assert "clipped" in capsys.readouterr().out  # loud warning
    assert seen_prune, "prune-only round never fired past stop_iter"
    assert int(jnp.sum(t.params["gaussians"]["alive"])) < alive0


def test_novel_view_eval_with_interpolated_exposure(tmp_path):
    from casualhdrsplat_tpu.models import image_formation as imf

    ds = dataset_mod.make_synthetic_dataset(
        seed=3, n_gaussians=50, n_frames=6, n_virtual=2, size=20
    )
    cfg = tiny_cfg()
    cfg.data.eval_every = 3  # frames {0, 3} held out
    cfg.out_dir = str(tmp_path)
    t = Trainer(cfg, ds)
    assert list(t.dataset.eval_indices) == [0, 3]
    for _ in range(3):
        t.run_step()
    m = t.evaluate()
    assert np.isfinite(m["eval_novel_psnr"]) and m["eval_novel_psnr"] > 5.0
    assert "eval_novel_ssim" in m

    # interpolation math: held-out frame 3 sits between train frames 2,4
    t.params["log_exposures"] = jnp.asarray(
        [9.0, 0.1, 0.2, 9.0, 0.4, 0.5]  # held-out entries poisoned
    )
    got = imf.interpolated_log_exposure(
        t.params, ds.timestamps, t.dataset.train_indices, 3
    )
    np.testing.assert_allclose(got, 0.3, atol=1e-6)  # mean of 0.2 and 0.4
