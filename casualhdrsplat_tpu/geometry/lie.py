"""Closed-form so(3)/se(3) Lie operations in pure jnp.

TPU-first replacement for the reference lineage's pypose `LieTensor`
machinery (SURVEY.md C10/C12; BAD-Gaussians `spline_functor.py` uses pypose
SE(3) ops).  Everything here is branch-free (Taylor-switched via
`jnp.where`), fully differentiable by plain JAX autodiff, and `vmap`-able.

Conventions:
- Rotations are 3x3 matrices; tangents are `omega` in R^3.
- SE(3) elements are 4x4 homogeneous matrices, `X_out = R @ X_in + t`.
- se(3) tangent `xi = (omega[3], v[3])` — rotation part first.
- All functions operate on a single element; use `jax.vmap` for batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Pose math must run in FULL float32: the TPU's default matmul precision
# multiplies in bfloat16, which puts ~1e-2 relative error into every 3x3 /
# 4x4 composition — measured ~1 DEGREE mean rotation error through one
# base @ exp(log(base^-1 gt)) roundtrip on the chip, i.e. several pixels
# of pose noise per render.  These tiny matmuls are negligible FLOPs, so
# pin them to HIGHEST everywhere in the trajectory path (the rasterizer's
# big MXU matmuls keep the fast default).  CPU tests force highest
# globally (conftest), so ONLY the chip ever saw this corruption.
PRECISION = jax.lax.Precision.HIGHEST


def mat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matrix product at float32 precision — use for ALL pose compositions."""
    return jnp.matmul(a, b, precision=PRECISION)


def mat_vec(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Matrix-vector product at float32 precision (batched: [..., i, j] x
    [..., j])."""
    return jnp.einsum("...ij,...j->...i", a, v, precision=PRECISION)


def lie_ww(W: jnp.ndarray) -> jnp.ndarray:
    """W @ W at float32 precision."""
    return mat_mul(W, W)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: w[3] -> skew-symmetric [3,3]."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `hat`."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jnp.ndarray):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3), Taylor-safe.

    The small-angle branch uses 4th-order Taylor series; the switch happens
    where both branches agree to float32 precision.
    """
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < 1e-8
    # Guard the arguments so the non-taken branch never produces NaN grads.
    safe_theta = jnp.where(small, 1.0, theta)
    safe_sq = jnp.where(small, 1.0, theta_sq)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_theta) / safe_theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_theta)) / safe_sq)
    C = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (safe_theta - jnp.sin(safe_theta)) / (safe_sq * safe_theta),
    )
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: w[3] -> R[3,3]."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + A[..., None, None] * W + B[..., None, None] * lie_ww(W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix log: R[3,3] -> w[3] (principal value, |w| <= pi).

    Uses the quaternion route (R -> q -> axis-angle), which stays
    well-conditioned near theta = pi where the classic
    theta/(2 sin theta) * vee(R - R^T) formula blows up.
    """
    q = rotmat_to_quat(R)  # (w, x, y, z), w >= 0
    qw, qv = q[..., 0], q[..., 1:]
    # guarded norm: grad of ||qv|| at qv = 0 is NaN (0/0); the max clamp
    # makes it exactly 0 there, which matters because identity relative
    # rotations DO occur (repeated boundary spline knots).
    nv = jnp.sqrt(jnp.maximum(jnp.sum(qv * qv, axis=-1), 1e-24))
    small = nv < 1e-6
    safe_nv = jnp.where(small, 1.0, nv)
    # theta = 2 atan2(|v|, w); scale = theta / |v|, Taylor 2(1 + |v|^2/6).
    scale = jnp.where(
        small,
        2.0 + nv * nv / 3.0,
        2.0 * jnp.arctan2(nv, qw) / safe_nv,
    )
    return scale[..., None] * qv


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V: exp(xi)=[R, V v] for se(3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + B[..., None, None] * W + C[..., None, None] * lie_ww(W)


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < 1e-8
    safe_theta = jnp.where(small, 1.0, theta)
    half = safe_theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / jnp.where(small, 1.0, theta_sq),
    )
    W = hat(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + cot_term[..., None, None] * lie_ww(W)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """xi[6]=(omega, v) -> T[4,4]."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = mat_vec(_left_jacobian(w), v)
    return rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """T[4,4] -> xi[6]=(omega, v)."""
    R, t = mat_to_rt(T)
    w = so3_log(R)
    v = mat_vec(_left_jacobian_inv(w), t)
    return jnp.concatenate([w, v], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def mat_to_rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R, t = mat_to_rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -mat_vec(Rt, t))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> R[3,3].  Normalizes the input."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """R[3,3] -> unit quaternion (w, x, y, z), w >= 0.

    Branch-free Shepperd-style: compute all four candidate constructions and
    select the best-conditioned one with `where` (vmap/jit friendly).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    q0 = mk(1 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = mk(m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = mk(m02 - m20, m01 + m10, 1 + m11 - m00 - m22, m12 + m21)
    q3 = mk(m10 - m01, m02 + m20, m12 + m21, 1 + m22 - m00 - m11)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# Batched aliases.
se3_exp_batch = jax.vmap(se3_exp)
se3_log_batch = jax.vmap(se3_log)
so3_exp_batch = jax.vmap(so3_exp)
so3_log_batch = jax.vmap(so3_log)
