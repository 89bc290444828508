"""Test-time pose alignment (train/pose_align.py): with the scene frozen,
a short se(3) descent against the eval target must remove a small known
pose offset — aligned error far below unaligned, recovered delta ≈ the
inverse of the injected one."""

import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu import config
from casualhdrsplat_tpu.data import dataset as dataset_mod
from casualhdrsplat_tpu.geometry import lie
from casualhdrsplat_tpu.models import image_formation as imf
from casualhdrsplat_tpu.train.pose_align import make_aligner
from casualhdrsplat_tpu.train.trainer import Trainer


def _cfg():
    cfg = config.TrainConfig(name="pose-align-test")
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
    return cfg


def test_align_removes_known_pose_offset():
    ds = dataset_mod.make_synthetic_dataset(
        seed=7, n_gaussians=60, n_frames=4, n_virtual=4, size=32,
        angle_span=0.8, exposure_range=(0.3, 0.5),
    )
    cfg = _cfg()
    t = Trainer(cfg, ds)
    dt = imf.exposure_of(t.params, 1)
    t_mid = t.scene.timestamps[1] + 0.5 * dt
    vm_true = imf.poses_at(t.params, t.scene, jnp.array([t_mid]), cfg.model)[0]
    target, _, _ = imf.render_pose(
        t.params, t.scene, vm_true, cfg.model, exposure=dt
    )
    # inject a small pose offset (≈1.1 deg rot + trans) and align it away
    xi = jnp.asarray([0.012, -0.009, 0.015, 0.01, -0.008, 0.012], jnp.float32)
    vm_off = lie.mat_mul(lie.se3_exp(xi), vm_true)
    off_render, _, _ = imf.render_pose(
        t.params, t.scene, vm_off, cfg.model, exposure=dt
    )
    err_before = float(jnp.mean(jnp.square(off_render - target)))
    align = make_aligner(cfg.model, steps=120, lr=3e-3)
    aligned, delta, curve = align(t.params, t.scene, vm_off, dt, target)
    err_after = float(jnp.mean(jnp.square(aligned - target)))
    assert err_after < 0.05 * err_before, (err_before, err_after)
    # the recovered correction must invert the injected offset
    resid = lie.se3_log(
        lie.mat_mul(lie.se3_exp(delta), lie.se3_exp(xi))
    )
    # rotation must be inverted; view-axis translation is only weakly
    # photometrically observable, so the full 6-vector is not asserted
    assert float(jnp.linalg.norm(resid[:3])) < 0.35 * float(
        jnp.linalg.norm(xi[:3])
    ), (np.asarray(delta), np.asarray(resid))
    assert float(curve[-1]) < float(curve[0])


def test_window_realigner_recovers_injected_window_offset():
    """make_window_realigner: perturb the knots of ONE frame's exposure
    window, then realign that window against the frame's BLURRY render
    from the unperturbed params — the baked correction must undo most of
    the injected offset (loss curve falls, final L1 far below initial)."""
    ds = dataset_mod.make_synthetic_dataset(
        seed=9, n_gaussians=60, n_frames=4, n_virtual=4, size=32,
        angle_span=0.8, exposure_range=(0.3, 0.5),
    )
    cfg = _cfg()
    t = Trainer(cfg, ds)
    fid = jnp.asarray(1)
    clean = imf.render_frame(t.params, t.scene, fid, cfg.model)
    target = clean.blurred_ldr

    # inject a rigid offset into the window's knots (left-composed, the
    # same composition the realigner bakes)
    from casualhdrsplat_tpu.train.pose_align import make_window_realigner

    xi = jnp.asarray([0.02, -0.015, 0.02, 0.01, -0.01, 0.015], jnp.float32)
    t_i = t.scene.timestamps[1]
    j0 = int(np.floor((float(t_i) - t.scene.knot_t0) / t.scene.knot_dt)) - 1
    idx = np.clip(np.arange(j0, j0 + 7), 0, t.params["knot_deltas"].shape[0] - 1)
    kd = t.params["knot_deltas"]
    rows = kd[jnp.asarray(idx)]
    pert = jnp.stack([
        lie.se3_log(lie.mat_mul(lie.se3_exp(xi), lie.se3_exp(r))) for r in rows
    ])
    t.params["knot_deltas"] = kd.at[jnp.asarray(idx)].set(pert)

    broken = imf.render_frame(t.params, t.scene, fid, cfg.model)
    l1_broken = float(jnp.mean(jnp.abs(broken.blurred_ldr - target)))

    realign = make_window_realigner(cfg.model, steps=96, lr=5e-3)
    kd2, d, curve = realign(t.params, t.scene, fid, target)
    t.params["knot_deltas"] = kd2
    fixed = imf.render_frame(t.params, t.scene, fid, cfg.model)
    l1_fixed = float(jnp.mean(jnp.abs(fixed.blurred_ldr - target)))

    assert l1_fixed < 0.35 * l1_broken, (l1_broken, l1_fixed)
    # the recovered correction points against the injected offset
    assert float(jnp.dot(d[:3], -xi[:3])) > 0
