"""Readable pure-jnp reference renderer — the `allclose` oracle.

This mirrors the role of gsplat's `_torch_impl.py` in the reference lineage
(SURVEY.md §4.1): a small, obviously-correct, fully-autodiffable
implementation of project -> depth sort -> alpha-composite that every
production kernel (ops/rasterize_pallas.py) is tested against, forward and
backward.  Dense over [N_gaussians, H*W]; use only on small scenes.

Compositing semantics (the framework's behavioral contract):
  alpha_k = min(alpha_clip, opacity_k * exp(-sigma_k)),  zeroed when
            alpha_k < alpha_threshold or the Gaussian is culled;
  over all Gaussians in ascending depth order:
  C(u)    = sum_k c_k alpha_k T_k,  T_k = prod_{j<k} (1 - alpha_j)
  out     = C + T_final * background
There is NO per-pixel early-stop in the math; production kernels may skip
work only where it changes the result by < transmittance_eps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from casualhdrsplat_tpu.ops.projection import Projected, project_gaussians


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # [H, W, 3] linear HDR radiance
    alpha: jnp.ndarray  # [H, W] 1 - final transmittance
    # aux (non-differentiated): per-Gaussian max composited weight — used by
    # adaptive density control's visibility pruning.
    max_weight: jnp.ndarray  # [N]


def composite(
    proj: Projected,
    colors: jnp.ndarray,  # [N, 3]
    opacities: jnp.ndarray,  # [N] activated, in (0, 1)
    width: int,
    height: int,
    background: jnp.ndarray | None = None,
    alpha_clip: float = 0.99,
    alpha_threshold: float = 1.0 / 255.0,
) -> RenderOutput:
    n = proj.means2d.shape[0]
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    valid = proj.valid[order]
    op = (opacities * proj.compensation)[order]
    col = colors[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    # Pixel centers at integer coordinates + 0.5.
    px = (xs + 0.5).astype(jnp.float32).reshape(-1)
    py = (ys + 0.5).astype(jnp.float32).reshape(-1)

    dx = px[None, :] - means2d[:, 0:1]  # [N, P]
    dy = py[None, :] - means2d[:, 1:2]
    sigma = 0.5 * (
        conics[:, 0:1] * dx * dx + conics[:, 2:3] * dy * dy
    ) + conics[:, 1:2] * dx * dy
    alpha = op[:, None] * jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(alpha, alpha_clip)
    alpha = jnp.where((alpha >= alpha_threshold) & valid[:, None], alpha, 0.0)

    # Exclusive product of (1 - alpha) down the depth order.
    one_minus = 1.0 - alpha
    T = jnp.concatenate(
        [jnp.ones((1, alpha.shape[1])), jnp.cumprod(one_minus, axis=0)[:-1]], axis=0
    )
    w = alpha * T  # [N, P]
    img = (w[:, :, None] * col[:, None, :]).sum(axis=0)  # [P, 3]
    t_final = T[-1] * one_minus[-1] if n > 0 else jnp.ones_like(px)
    if background is not None:
        img = img + t_final[:, None] * background[None, :]
    inv_order = jnp.argsort(order)
    max_w = w.max(axis=1)[inv_order] if n > 0 else jnp.zeros((0,))
    return RenderOutput(
        image=img.reshape(height, width, 3),
        alpha=(1.0 - t_final).reshape(height, width),
        max_weight=max_w,
    )


def render(
    means3d,
    quats,
    scales,
    opacities,
    colors,
    camera,
    background=None,
    near_plane: float = 0.05,
    antialias: bool = False,
) -> RenderOutput:
    """Full oracle pipeline: project then composite.  `colors` are [N,3]
    per-Gaussian radiance (SH already evaluated by the caller)."""
    proj = project_gaussians(
        means3d,
        quats,
        scales,
        camera.viewmat,
        camera.fx,
        camera.fy,
        camera.cx,
        camera.cy,
        camera.width,
        camera.height,
        near_plane=near_plane,
        antialias=antialias,
    )
    return composite(
        proj, colors, opacities, camera.width, camera.height, background
    )
