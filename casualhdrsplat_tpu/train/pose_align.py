"""Test-time pose alignment for deblurred-render evaluation.

The joint CasualHDRSplat problem (reference Readme.md:44 — trajectory,
exposures, CRF and scene all free) converges to a self-consistent
reconstruction whose camera trajectory can sit a few degrees off the GT
trajectory in a NON-similarity deformation (scene and spline co-warp);
the deblurred render is then geometrically misaligned with the GT sharp
frame and raw PSNR measures the misalignment, not sharpness.  The
standard protocol in pose-free novel-view synthesis (BARF §5, BAD-NeRF
§4.3 "camera pose optimization at test time", BAD-Gaussians eval) is to
optimize a small per-image camera correction against the evaluation
target before scoring, with the scene FROZEN — 6 DoF against ~2M pixel
constraints cannot manufacture sharpness, only remove the gauge offset.

`make_aligner` builds that as one jitted `lax.scan` Adam descent on an
se(3) delta applied to the eval viewmat (scene/CRF/exposure frozen, no
per-step host sync).  Report BOTH the raw and the aligned PSNR; the
delta magnitude is returned so the report can show the correction stayed
small."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from casualhdrsplat_tpu.geometry import lie
from casualhdrsplat_tpu.models import image_formation as imf


def make_window_realigner(
    cfg, steps: int = 48, lr: float = 2e-3, sh_degree=None,
    knot_support: int = 7,
):
    """Per-window pose restart (docs/JOINT_RECOVERY.md r05: a few exposure
    windows plateau several degrees off while the rest converge).

    Block-coordinate refinement of ONE frame's trajectory window against
    its BLURRY captured frame — TRAINING data only, unlike the eval-time
    aligner below which scores against GT sharps.  A single se(3)
    correction `d` is left-composed (camera frame) onto the
    `knot_support` knots whose cubic support overlaps the frame's
    exposure window, with scene/CRF/exposure frozen; 6 DoF against a
    full blurred-frame residual cannot fake sharpness, only move the
    window onto the photometric basin joint descent missed.  The
    correction is BAKED into the returned knot_deltas rows
    (new_delta = log(exp(d) @ exp(delta)) — same left-composition as
    image_formation.effective_knots), so ordinary joint training
    continues from the restarted window.

    Returns `realign(params, scene, frame_id, target) ->
    (knot_deltas, d, loss_curve)`, jitted once."""
    from casualhdrsplat_tpu.models import image_formation as imf2

    @jax.jit
    def realign(params, scene, frame_id, target):
        t_i = scene.timestamps[frame_id]
        n_knots = params["knot_deltas"].shape[0]
        j0 = jnp.floor(
            (t_i - scene.knot_t0) / scene.knot_dt
        ).astype(jnp.int32) - 1
        idx = jnp.clip(j0 + jnp.arange(knot_support), 0, n_knots - 1)

        def with_delta(d):
            kd = params["knot_deltas"]
            rows = kd[idx]  # [K,6]
            upd = jax.vmap(
                lambda r: lie.se3_log(lie.mat_mul(lie.se3_exp(d), lie.se3_exp(r)))
            )(rows)
            return {**params, "knot_deltas": kd.at[idx].set(upd)}

        def loss_fn(d):
            out = imf2.render_frame(
                with_delta(d), scene, frame_id, cfg, sh_degree=sh_degree
            )
            return jnp.mean(jnp.abs(out.blurred_ldr - target))

        opt = optax.adam(lr)
        d0 = jnp.zeros((6,), jnp.float32)

        def step(carry, _):
            d, st = carry
            val, grad = jax.value_and_grad(loss_fn)(d)
            upd, st = opt.update(grad, st, d)
            return (optax.apply_updates(d, upd), st), val

        (d, _), curve = jax.lax.scan(
            step, (d0, opt.init(d0)), None, length=steps
        )
        return with_delta(d)["knot_deltas"], d, curve

    return realign


def make_aligner(cfg, steps: int = 48, lr: float = 2e-3, sh_degree=None):
    """Returns `align(params, scene, viewmat0, exposure, target) ->
    (aligned_ldr, delta, loss_curve)`, jitted once — keep the returned
    function to reuse the executable across eval frames.  `cfg` is the
    ModelConfig (closed over: the dataclass is unhashable so it cannot be
    a static jit arg)."""

    @jax.jit
    def align(params, scene, viewmat0, exposure, target):
        def render(delta):
            vm = lie.mat_mul(lie.se3_exp(delta), viewmat0)
            ldr, _, _ = imf.render_pose(
                params, scene, vm, cfg, exposure=exposure,
                sh_degree=sh_degree,
            )
            return ldr

        def loss_fn(delta):
            return jnp.mean(jnp.square(render(delta) - target))

        opt = optax.adam(lr)
        delta0 = jnp.zeros((6,), jnp.float32)

        def step(carry, _):
            delta, st = carry
            val, grad = jax.value_and_grad(loss_fn)(delta)
            upd, st = opt.update(grad, st, delta)
            return (optax.apply_updates(delta, upd), st), val

        (delta, _), curve = jax.lax.scan(
            step, (delta0, opt.init(delta0)), None, length=steps
        )
        return render(delta), delta, curve

    return align
