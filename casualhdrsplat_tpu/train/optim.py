"""Per-group optimizers and schedules (SURVEY.md C17).

Reference lineage: one torch Adam per parameter group with 3DGS learning
rates (means exp-decayed and scene-scale-scaled, SH rest / 20, etc.).
Here: a single optax.multi_transform over the parameter pytree — one
jittable update, pytree-aligned optimizer state (which densification can
edit with the same masked scatters it applies to the parameters, and which
shards over the mesh like the parameters themselves — SURVEY.md P5).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from casualhdrsplat_tpu.config import OptimConfig


def _label_tree(params: Dict[str, Any]):
    """Pytree of group labels matching the param structure."""

    def label_gauss(k):
        return {
            "means": "means",
            "quats": "quats",
            "log_scales": "scales",
            "opacity_logit": "opacities",
            "sh_dc": "sh_dc",
            "sh_rest": "sh_rest",
            "alive": "frozen",
        }[k]

    return {
        "gaussians": {k: label_gauss(k) for k in params["gaussians"]},
        "knot_deltas": "pose",
        "log_exposures": "exposure",
        "crf": jax.tree.map(lambda _: "crf", params["crf"]),
    }


def _exp_sched(init: float, final: float, steps: int):
    """Exponential decay init -> final; a zero init freezes the group."""
    if init <= 0.0:
        return 0.0
    return optax.exponential_decay(
        init_value=init, transition_steps=steps, decay_rate=final / init
    )


def _scale_se3_trans(scale: float):
    """Multiply the translation half (columns 3:6) of [M,6] knot-delta
    updates by `scale` — a per-half learning rate for the pose group
    (rotation-dominated blur observes translation weakly; see
    OptimConfig.pose_trans_lr_scale)."""

    def update_fn(updates, state, params=None):
        del params
        return (
            jax.tree.map(lambda u: u.at[..., 3:].multiply(scale), updates),
            state,
        )

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def pose_schedule(cfg: OptimConfig):
    """Pose-group lr schedule: warmup-at-zero, exp decay, and (optional)
    a decay-clock restart at cfg.pose_lr_rewarm_step — the curriculum
    promotion re-warm (docs/JOINT_RECOVERY.md "next quality lever")."""
    pose_sched = _exp_sched(
        cfg.pose_lr_init, cfg.pose_lr_final,
        max(cfg.max_steps - cfg.pose_warmup_steps, 1),
    )
    if cfg.pose_warmup_steps > 0 and cfg.pose_lr_init > 0.0:
        pose_sched = optax.join_schedules(
            [optax.constant_schedule(0.0), pose_sched],
            [cfg.pose_warmup_steps],
        )
    if cfg.pose_lr_rewarm_step > 0 and callable(pose_sched):
        # A boundary at/inside the warmup window would make the rewarmed
        # branch return nonzero lr for steps the warmup should freeze
        # (ADVICE r4): refuse the silent misconfiguration.
        if cfg.pose_lr_rewarm_step <= cfg.pose_warmup_steps:
            raise ValueError(
                f"pose_lr_rewarm_step ({cfg.pose_lr_rewarm_step}) must be "
                f"> pose_warmup_steps ({cfg.pose_warmup_steps})"
            )
        base, boundary = pose_sched, cfg.pose_lr_rewarm_step

        def rewarmed(step):
            s = jnp.asarray(step)
            # past the boundary, evaluate the base schedule as if the
            # warmup had just ended `s - boundary` steps ago
            restarted = base(cfg.pose_warmup_steps + (s - boundary))
            return jnp.where(s < boundary, base(s), restarted)

        pose_sched = rewarmed
    return pose_sched


def make_optimizer(cfg: OptimConfig, scene_extent: float = 1.0):
    """Returns an optax GradientTransformation over the full param pytree."""
    means_sched = _exp_sched(
        cfg.means_lr_init * scene_extent,
        cfg.means_lr_final * scene_extent,
        cfg.max_steps,
    )
    pose_sched = pose_schedule(cfg)
    adam = lambda lr: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)
    scene = adam
    pose_opt = optax.adam(
        pose_sched, b1=cfg.pose_b1, b2=0.999, eps=1e-15,
    )
    if cfg.pose_trans_lr_scale != 1.0:
        pose_opt = optax.chain(
            pose_opt, _scale_se3_trans(cfg.pose_trans_lr_scale)
        )
    groups = {
        "means": scene(means_sched),
        "quats": scene(cfg.quats_lr),
        "scales": scene(cfg.scales_lr),
        "opacities": scene(cfg.opacities_lr),
        "sh_dc": scene(cfg.sh_dc_lr),
        "sh_rest": scene(cfg.sh_dc_lr / cfg.sh_rest_lr_div),
        "pose": pose_opt,
        "exposure": optax.adam(
            cfg.exposure_lr, b1=cfg.exposure_b1, b2=0.999, eps=1e-15
        ),
        "crf": adam(cfg.crf_lr),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(groups, _label_tree)


def zero_state_at(opt_state, param_path: str, mask: jnp.ndarray):
    """Zero Adam moments at masked Gaussian slots after clone/split/prune
    (the lineage's 'optimizer state surgery', SURVEY.md C9) — applied to
    every state leaf whose leading dim matches the Gaussian capacity."""

    def visit(leaf):
        if (
            isinstance(leaf, jnp.ndarray)
            and leaf.ndim >= 1
            and leaf.shape[0] == mask.shape[0]
            and jnp.issubdtype(leaf.dtype, jnp.floating)
        ):
            shaped = mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
            return jnp.where(shaped, 0.0, leaf)
        return leaf

    del param_path  # uniform over gaussian-capacity leaves
    return jax.tree.map(visit, opt_state)
