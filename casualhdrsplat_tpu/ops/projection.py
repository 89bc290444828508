"""EWA Gaussian projection (SURVEY.md C1) as a fused jnp computation.

Reference lineage: gsplat `project_gaussians_forward/backward` CUDA kernels
(~600 LoC of hand-written forward+backward).  On TPU the whole projection
is elementwise over Gaussians — XLA fuses it into a handful of VPU loops
and autodiff supplies an exact backward — so the idiomatic implementation
is a plain jitted function, not a Pallas kernel (SURVEY.md §7 M1: "XLA is
already near-optimal").

Math (gsplat mathematical supplement, PAPERS.md entry 4):
  t        = R_view p + t_view                    (camera-space mean)
  Sigma    = R(q) diag(s)^2 R(q)^T                (world covariance)
  J        = [[fx/tz, 0, -fx tx/tz^2],
              [0, fy/tz, -fy ty/tz^2]]            (perspective Jacobian)
  Sigma2d  = J W Sigma W^T J^T + blur I           (EWA + low-pass, blur=0.3)
  conic    = Sigma2d^{-1}  (upper triangle xx, xy, yy)
  radius   = ceil(3 sqrt(lambda_max(Sigma2d)))
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from casualhdrsplat_tpu.geometry.lie import quat_to_rotmat

BLUR_2D = 0.3


class Projected(NamedTuple):
    """Per-Gaussian screen-space packet (the all-gather payload under
    Gaussian model-parallelism, SURVEY.md P2)."""

    means2d: jnp.ndarray  # [N, 2] pixel coordinates
    depths: jnp.ndarray  # [N] camera-space z
    conics: jnp.ndarray  # [N, 3] inverse 2D covariance (xx, xy, yy)
    radii: jnp.ndarray  # [N] 3-sigma screen radius (float; 0 = culled)
    valid: jnp.ndarray  # [N] bool — in front of near plane & non-degenerate
    compensation: jnp.ndarray  # [N] optional AA opacity compensation


def quat_scale_to_cov3d(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T, R from (possibly unnormalized) quaternion."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]  # R @ diag(s)
    # full fp32: bf16-default matmuls put ~1e-2 relative error into the
    # covariance (oracle/reference path only; the production projection
    # is scalar-expanded in _cov2d_components)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def _cov2d_components(quats, scales, R):
    """Upper-triangle world->camera 2D-precursor covariance components,
    fully scalar-expanded.

    Batched [N,3,3] matmuls look natural here but are catastrophic on the
    MXU: each 3x3 gets padded to the 128-lane tile, turning ~14 MB of real
    data into GB of padded traffic (measured: 2.9 GB accessed, 22 ms).
    Expanding into [N]-vector elementwise arithmetic keeps everything on
    the VPU and fuses into one pass.

    Returns the 6 unique components of W Sigma W^T as [N] arrays.
    """
    rot = quat_to_rotmat(quats)  # [N,3,3] (built from elementwise ops)
    # m[i][j] = rot_ij * s_j  (columns scaled)
    m = [[rot[:, i, j] * scales[:, j] for j in range(3)] for i in range(3)]
    # sigma_ij = sum_k m_ik m_jk (symmetric)
    sig = {}
    for i in range(3):
        for j in range(i, 3):
            sig[(i, j)] = sum(m[i][k] * m[j][k] for k in range(3))

    def s_at(i, j):
        return sig[(i, j)] if (i, j) in sig else sig[(j, i)]

    # a = W @ sigma: a_ij = sum_k W_ik sigma_kj  (W entries are scalars)
    a = [[sum(R[i, k] * s_at(k, j) for k in range(3)) for j in range(3)]
         for i in range(3)]
    # c = a @ W^T: c_ij = sum_k a_ik W_jk — only the unique 6
    def c_at(i, j):
        return sum(a[i][k] * R[j, k] for k in range(3))

    return c_at(0, 0), c_at(0, 1), c_at(0, 2), c_at(1, 1), c_at(1, 2), c_at(2, 2)


def project_gaussians(
    means3d: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3] (activated, positive)
    viewmat: jnp.ndarray,  # [4, 4] world->camera
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
    near_plane: float = 0.05,
    antialias: bool = False,
) -> Projected:
    R = viewmat[:3, :3]
    # NOTE: written as broadcast mul+sum, NOT `means3d @ R.T` — tall-skinny
    # dots (large N x tiny contraction) pathologically slow the TPU
    # compiler (minutes per dot); the elementwise form compiles instantly
    # and fuses into the surrounding VPU work anyway.
    t = jnp.sum(means3d[:, None, :] * R[None, :, :], axis=-1) + viewmat[:3, 3]
    tx, ty, tz = t[:, 0], t[:, 1], t[:, 2]
    in_front = tz > near_plane
    tz_safe = jnp.where(in_front, tz, 1.0)
    inv_z = 1.0 / tz_safe

    # Clamp the tangent-plane coordinates like gsplat does, to keep the
    # Jacobian bounded for points near the image border / behind margins.
    lim_x = 1.3 * (0.5 * width / fx + jnp.abs((cx - 0.5 * width) / fx))
    lim_y = 1.3 * (0.5 * height / fy + jnp.abs((cy - 0.5 * height) / fy))
    txz = jnp.clip(tx * inv_z, -lim_x, lim_x) * tz_safe
    tyz = jnp.clip(ty * inv_z, -lim_y, lim_y) * tz_safe

    # W Sigma W^T fully scalar-expanded (see _cov2d_components for why
    # neither einsum nor batched 3x3 matmuls are acceptable on TPU).
    c00, c01, c02, c11, c12, c22 = _cov2d_components(quats, scales, R)

    # J (2x3) rows; apply J Sigma_cam J^T via explicit expansion (keeps XLA
    # on cheap fused elementwise ops instead of [N,2,3]x[N,3,3] batched
    # matmuls with tiny inner dims).
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z * inv_z

    sxx = j00 * j00 * c00 + 2.0 * j00 * j02 * c02 + j02 * j02 * c22
    sxy = j00 * j11 * c01 + j00 * j12 * c02 + j02 * j11 * c12 + j02 * j12 * c22
    syy = j11 * j11 * c11 + 2.0 * j11 * j12 * c12 + j12 * j12 * c22

    det_raw = sxx * syy - sxy * sxy
    sxx_b = sxx + BLUR_2D
    syy_b = syy + BLUR_2D
    det = sxx_b * syy_b - sxy * sxy
    nondegenerate = det > 1e-10
    det_safe = jnp.where(nondegenerate, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([syy_b * inv_det, -sxy * inv_det, sxx_b * inv_det], axis=-1)

    # AA mode scales opacity by sqrt(det_raw/det) (gsplat "antialiased").
    compensation = jnp.where(
        nondegenerate, jnp.sqrt(jnp.maximum(det_raw, 0.0) * inv_det), 0.0
    )
    if not antialias:
        compensation = jnp.ones_like(compensation)

    # 3-sigma radius from the larger eigenvalue of the blurred covariance.
    mid = 0.5 * (sxx_b + syy_b)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radii = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    means2d = jnp.stack([fx * tx * inv_z + cx, fy * ty * inv_z + cy], axis=-1)

    # Cull: behind camera, degenerate, or entirely off-screen.
    on_screen = (
        (means2d[:, 0] + radii > 0)
        & (means2d[:, 0] - radii < width)
        & (means2d[:, 1] + radii > 0)
        & (means2d[:, 1] - radii < height)
    )
    valid = in_front & nondegenerate & on_screen
    radii = jnp.where(valid, radii, 0.0)

    return Projected(
        means2d=means2d,
        depths=tz,
        conics=conics,
        radii=radii,
        valid=valid,
        compensation=compensation,
    )


def cull_invisible(proj: Projected, opacities: jnp.ndarray) -> Projected:
    """Drop exactly-zero-opacity splats (dead capacity slots) from binning.

    The fixed-capacity store keeps dead slots at the origin with a
    sub-pixel scale; the EWA blur floor still gives them a ~1.6 px radius,
    so without this they are all binned into whichever tile contains the
    projected origin — wasting stream/tile budget, stealing waterfill
    slots from real far-tail contributions, and polluting the
    dropped-counter diagnostics.  Bit-exact: alpha = opacity * exp(...)
    is exactly 0 for them, so compositing never sees a difference.
    Broadcasting: valid may be [V, N] with opacities [N]."""
    vis = proj.valid & (opacities > 0.0)
    return proj._replace(valid=vis, radii=jnp.where(vis, proj.radii, 0.0))


def view_directions(means3d: jnp.ndarray, camtoworld: jnp.ndarray) -> jnp.ndarray:
    """Unit directions from the camera center to each Gaussian (for SH)."""
    campos = camtoworld[:3, 3]
    d = means3d - campos
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
