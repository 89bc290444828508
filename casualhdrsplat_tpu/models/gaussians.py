"""Gaussian parameter store (SURVEY.md C8) with fixed-capacity padding.

Reference lineage: `GaussianModel` / splatfacto `gauss_params` torch
tensors whose length N changes on every densify/prune.  XLA needs static
shapes, so the TPU store is allocated once at `max_gaussians` capacity
with an `alive` mask; adaptive density control (train/densify.py) moves
Gaussians between slots with masked scatters — no recompilation, and the
same dense layout shards cleanly over the `gauss` mesh axis (SURVEY.md
P2/P5).

Activation conventions (match the lineage): scales = exp(log_scales),
opacity = sigmoid(logit), quats normalized on use, SH -> linear HDR
radiance via ops/sh.py.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.ops import sh as sh_ops

Params = Dict[str, jnp.ndarray]


def inverse_sigmoid(x: float) -> float:
    return float(np.log(x / (1.0 - x)))


def create(
    xyz: np.ndarray,
    rgb: np.ndarray,
    max_gaussians: int,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    scale_clip=(1e-7, 1e2),
) -> Params:
    """Initialize from SfM points (SURVEY.md §3.5: dataparser output)."""
    from casualhdrsplat_tpu.ops.knn import knn_mean_dist

    n = min(len(xyz), max_gaussians)
    k = sh_ops.num_sh_bases(sh_degree)
    xyz = np.asarray(xyz, np.float32)[:n]
    rgb = np.asarray(rgb, np.float32)[:n]
    dist = np.clip(knn_mean_dist(xyz, 3), *scale_clip)

    means = np.zeros((max_gaussians, 3), np.float32)
    means[:n] = xyz
    log_scales = np.full((max_gaussians, 3), -10.0, np.float32)
    log_scales[:n] = np.log(dist)[:, None]
    quats = np.zeros((max_gaussians, 4), np.float32)
    quats[:, 0] = 1.0
    opacity = np.full((max_gaussians,), -15.0, np.float32)  # dead slots ~ 0
    opacity[:n] = inverse_sigmoid(init_opacity)
    sh_dc = np.zeros((max_gaussians, 1, 3), np.float32)
    sh_dc[:n, 0] = np.asarray(sh_ops.rgb_to_sh_dc(jnp.asarray(rgb)))
    sh_rest = np.zeros((max_gaussians, k - 1, 3), np.float32)
    alive = np.zeros((max_gaussians,), bool)
    alive[:n] = True

    return {
        "means": jnp.asarray(means),
        "quats": jnp.asarray(quats),
        "log_scales": jnp.asarray(log_scales),
        "opacity_logit": jnp.asarray(opacity),
        "sh_dc": jnp.asarray(sh_dc),
        "sh_rest": jnp.asarray(sh_rest),
        "alive": jnp.asarray(alive),
    }


class Activated(NamedTuple):
    means3d: jnp.ndarray  # [N,3]
    quats: jnp.ndarray  # [N,4] (normalized downstream)
    scales: jnp.ndarray  # [N,3] positive
    opacities: jnp.ndarray  # [N] in (0,1), 0 for dead slots
    sh: jnp.ndarray  # [N,K,3]


def activate(params: Params) -> Activated:
    alive = params["alive"]
    return Activated(
        means3d=params["means"],
        quats=params["quats"],
        scales=jnp.exp(params["log_scales"]),
        opacities=jax.nn.sigmoid(params["opacity_logit"]) * alive,
        sh=jnp.concatenate([params["sh_dc"], params["sh_rest"]], axis=1),
    )


def num_alive(params: Params) -> jnp.ndarray:
    return jnp.sum(params["alive"].astype(jnp.int32))


def colors_for_view(act: Activated, camtoworld: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Per-Gaussian linear HDR radiance for one camera pose [N,3]."""
    from casualhdrsplat_tpu.ops.projection import view_directions

    dirs = view_directions(act.means3d, camtoworld)
    return sh_ops.eval_sh(degree, act.sh, dirs)
