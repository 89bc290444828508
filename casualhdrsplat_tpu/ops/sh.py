"""Real spherical harmonics evaluation, degree 0..3 (SURVEY.md C5).

Reference lineage: gsplat `spherical_harmonics` CUDA kernel
(`compute_sh_forward/backward`).  On TPU this is a pure elementwise-over-
Gaussians computation that XLA fuses into the projection pass, so it is a
plain jnp function (autodiff gives the backward for free) — no custom
kernel needed, per SURVEY.md §7 M1 guidance.

Here the SH coefficients encode **linear HDR radiance** (Readme.md:54
"HDR radiance field"): the usual `+0.5` DC offset is applied and values
are clamped at 0 but NOT clamped above 1.
"""

from __future__ import annotations

import jax.numpy as jnp

# Real SH normalization constants (same basis as the 3DGS lineage).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(degree: int, coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH radiance.

    Args:
      degree: 0..3 (static).
      coeffs: [..., K, 3] with K >= num_sh_bases(degree); extra bases ignored.
      dirs: [..., 3] view directions (normalized by caller or here).

    Returns: [..., 3] linear radiance (>= 0, unbounded above).
    """
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    x, y, z = d[..., 0:1], d[..., 1:2], d[..., 2:3]

    result = _C0 * coeffs[..., 0, :]
    if degree >= 1:
        result = result + _C1 * (
            -y * coeffs[..., 1, :] + z * coeffs[..., 2, :] - x * coeffs[..., 3, :]
        )
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = result + (
            _C2[0] * xy * coeffs[..., 4, :]
            + _C2[1] * yz * coeffs[..., 5, :]
            + _C2[2] * (2.0 * zz - xx - yy) * coeffs[..., 6, :]
            + _C2[3] * xz * coeffs[..., 7, :]
            + _C2[4] * (xx - yy) * coeffs[..., 8, :]
        )
    if degree >= 3:
        result = result + (
            _C3[0] * y * (3 * xx - yy) * coeffs[..., 9, :]
            + _C3[1] * xy * z * coeffs[..., 10, :]
            + _C3[2] * y * (4 * zz - xx - yy) * coeffs[..., 11, :]
            + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[..., 12, :]
            + _C3[4] * x * (4 * zz - xx - yy) * coeffs[..., 13, :]
            + _C3[5] * z * (xx - yy) * coeffs[..., 14, :]
            + _C3[6] * x * (xx - 3 * yy) * coeffs[..., 15, :]
        )
    return jnp.maximum(result + 0.5, 0.0)


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term: rgb -> coeff such that eval_sh(0) == rgb."""
    return (rgb - 0.5) / _C0
