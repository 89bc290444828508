"""Optimizer schedule/group tests (SURVEY.md C17): pose warmup freeze and
the per-half translation lr scale added for joint-stability (VERDICT r2
Missing #2)."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.config import OptimConfig
from casualhdrsplat_tpu.models import crf as crf_mod
from casualhdrsplat_tpu.train import optim
from casualhdrsplat_tpu.config import CRFConfig


def tiny_params():
    return {
        "gaussians": {
            "means": jnp.zeros((4, 3)),
            "quats": jnp.zeros((4, 4)),
            "log_scales": jnp.zeros((4, 3)),
            "opacity_logit": jnp.zeros((4,)),
            "sh_dc": jnp.zeros((4, 3)),
            "sh_rest": jnp.zeros((4, 8, 3)),
            "alive": jnp.ones((4,), bool),
        },
        "knot_deltas": jnp.zeros((5, 6)),
        "log_exposures": jnp.zeros((3,)),
        "crf": crf_mod.create(CRFConfig(kind="identity"), jax.random.PRNGKey(0)),
    }


def ones_like_grads(params):
    return jax.tree.map(
        lambda p: jnp.ones_like(p) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )


def test_pose_warmup_freezes_then_releases():
    cfg = OptimConfig(pose_warmup_steps=3, max_steps=10)
    opt = optim.make_optimizer(cfg)
    params = tiny_params()
    state = opt.init(params)
    grads = ones_like_grads(params)
    for step in range(5):
        updates, state = opt.update(grads, state, params)
        pose_u = np.asarray(updates["knot_deltas"])
        if step < 3:
            assert np.all(pose_u == 0.0), (step, pose_u)
            # ...while other groups still move
            assert np.any(np.asarray(updates["gaussians"]["means"]) != 0.0)
        else:
            assert np.any(pose_u != 0.0), step


def test_pose_trans_lr_scale_halves_translation_only():
    cfg = OptimConfig(pose_trans_lr_scale=0.25)
    opt = optim.make_optimizer(cfg)
    cfg_ref = OptimConfig()
    opt_ref = optim.make_optimizer(cfg_ref)
    params = tiny_params()
    grads = ones_like_grads(params)
    u, _ = opt.update(grads, opt.init(params), params)
    u_ref, _ = opt_ref.update(grads, opt_ref.init(params), params)
    got = np.asarray(u["knot_deltas"])
    ref = np.asarray(u_ref["knot_deltas"])
    np.testing.assert_allclose(got[:, :3], ref[:, :3], rtol=1e-6)
    np.testing.assert_allclose(got[:, 3:], 0.25 * ref[:, 3:], rtol=1e-6)

def test_pose_b1_zero_freezes_unsampled_knots():
    """OptimConfig.pose_b1=0: a knot whose gradient is zero this step gets
    a zero update (no stale momentum) — per-frame sampling makes knot
    grads sparse, and default Adam keeps pushing unsampled knots with the
    momentum of their last visit."""
    cfg = OptimConfig(pose_b1=0.0, max_steps=20)
    opt = optim.make_optimizer(cfg)
    params = tiny_params()
    st = opt.init(params)
    g1 = ones_like_grads(params)
    u, st = opt.update(g1, st, params)
    assert float(np.abs(np.asarray(u["knot_deltas"])).max()) > 0
    # next step: knot grads all zero -> update must be exactly zero
    g2 = jax.tree.map(jnp.zeros_like, g1)
    u, st = opt.update(g2, st, params)
    np.testing.assert_array_equal(np.asarray(u["knot_deltas"]), 0.0)
    # default b1 keeps moving on stale momentum (the contrast)
    opt_m = optim.make_optimizer(OptimConfig(max_steps=20))
    st_m = opt_m.init(params)
    _, st_m = opt_m.update(g1, st_m, params)
    u_m, _ = opt_m.update(g2, st_m, params)
    assert float(np.abs(np.asarray(u_m["knot_deltas"])).max()) > 0

def test_pose_lr_rewarm_restarts_decay_at_promotion():
    """pose_lr_rewarm_step restarts the exp-decay clock: full
    pose_lr_init at the rewarm boundary, identical decay shape after
    (docs/JOINT_RECOVERY.md promotion re-warm)."""
    cfg = OptimConfig(
        pose_warmup_steps=10, max_steps=100, pose_lr_init=1e-3,
        pose_lr_final=1e-5, pose_lr_rewarm_step=50,
    )
    sched = optim.pose_schedule(cfg)
    base = optim.pose_schedule(
        OptimConfig(pose_warmup_steps=10, max_steps=100,
                    pose_lr_init=1e-3, pose_lr_final=1e-5)
    )
    # before the boundary: untouched (incl. the warmup freeze)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(30)), float(base(30)), rtol=1e-6)
    # the step before the boundary has decayed well below init
    assert float(sched(49)) < 0.7 * cfg.pose_lr_init
    # at the boundary: back to full init
    np.testing.assert_allclose(
        float(sched(50)), cfg.pose_lr_init, rtol=1e-5)
    # after: same decay law, shifted — sched(50+d) == base(10+d)
    for d in (1, 13, 40):
        np.testing.assert_allclose(
            float(sched(50 + d)), float(base(10 + d)), rtol=1e-6)


def test_exposure_b1_zero_freezes_unsampled_frames():
    """OptimConfig.exposure_b1=0: per-frame exposure grads are sparse
    (one frame per step), so stale Adam momentum walks every unsampled
    frame's exposure; b1=0 must produce exactly-zero updates on zero
    grads (r05 heavy-probe finding, mirrors pose_b1)."""
    opt = optim.make_optimizer(OptimConfig(exposure_b1=0.0, max_steps=20))
    params = tiny_params()
    st = opt.init(params)
    g1 = ones_like_grads(params)
    _, st = opt.update(g1, st, params)
    g2 = jax.tree.map(jnp.zeros_like, g1)
    u, st = opt.update(g2, st, params)
    np.testing.assert_array_equal(np.asarray(u["log_exposures"]), 0.0)
    # contrast: default b1 keeps pushing on stale momentum
    opt_m = optim.make_optimizer(OptimConfig(max_steps=20))
    st_m = opt_m.init(params)
    _, st_m = opt_m.update(g1, st_m, params)
    u_m, _ = opt_m.update(g2, st_m, params)
    assert float(np.abs(np.asarray(u_m["log_exposures"])).max()) > 0
