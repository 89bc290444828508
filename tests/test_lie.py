"""Unit + finite-difference tests for closed-form Lie ops (SURVEY.md §7
"finite-difference test every Lie op")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casualhdrsplat_tpu.geometry import lie


def random_xi(rng, scale=1.0, n=None):
    shape = (6,) if n is None else (n, 6)
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


def test_so3_exp_log_roundtrip(rng):
    # keep |w| < pi: log returns the principal value
    w = rng.normal(size=(32, 3))
    w *= (rng.uniform(0.01, 3.0, size=(32, 1))) / np.linalg.norm(w, axis=-1, keepdims=True)
    w = jnp.asarray(w, jnp.float32)
    R = lie.so3_exp_batch(w)
    # R is orthonormal with det 1
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    w2 = lie.so3_log_batch(R)
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_small_angle(rng):
    w = jnp.asarray(rng.normal(size=(8, 3)) * 1e-6, jnp.float32)
    R = lie.so3_exp_batch(w)
    np.testing.assert_allclose(
        lie.so3_log_batch(R), w, atol=1e-7
    )
    # gradient is finite at zero
    g = jax.grad(lambda x: jnp.sum(lie.so3_exp(x)))(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_se3_exp_log_roundtrip(rng):
    xi = np.array(random_xi(rng, 1.0, n=32))
    # keep rotation angle < pi for principal-value roundtrip
    wn = np.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
    xi[:, :3] *= np.minimum(1.0, 3.0 / wn)
    xi = jnp.asarray(xi)
    T = lie.se3_exp_batch(xi)
    np.testing.assert_allclose(lie.se3_log_batch(T), xi, atol=2e-3)


def test_exp_log_exp_consistency(rng):
    """For any R (including theta>pi inputs), exp(log(R)) == R."""
    w = jnp.asarray(rng.normal(size=(16, 3)) * 2.0, jnp.float32)
    R = lie.so3_exp_batch(w)
    R2 = lie.so3_exp_batch(lie.so3_log_batch(R))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_se3_inverse(rng):
    xi = random_xi(rng, 1.0, n=8)
    T = lie.se3_exp_batch(xi)
    TI = jax.vmap(lie.se3_inverse)(T)
    prod = jnp.einsum("nij,njk->nik", T, TI)
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5
    )


def test_se3_exp_matches_finite_difference(rng):
    """d/d_eps f(exp(xi + eps)) via autodiff == central differences."""
    xi = random_xi(rng, 0.7)
    p = jnp.asarray(rng.normal(size=3), jnp.float32)

    def f(x):
        T = lie.se3_exp(x)
        return T[:3, :3] @ p + T[:3, 3]

    J = jax.jacobian(f)(xi)
    eps = 1e-3
    J_fd = np.zeros((3, 6), np.float64)
    for i in range(6):
        d = np.zeros(6, np.float32)
        d[i] = eps
        J_fd[:, i] = (np.asarray(f(xi + d)) - np.asarray(f(xi - d))) / (2 * eps)
    np.testing.assert_allclose(J, J_fd, atol=5e-3)


def test_quat_rotmat_roundtrip(rng):
    q = jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    R = lie.quat_to_rotmat(q)
    q2 = lie.rotmat_to_quat(R)
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_quat_to_rotmat_unnormalized_input_ok(rng):
    q = jnp.asarray(rng.normal(size=(8, 4)) * 3.0, jnp.float32)
    R = lie.quat_to_rotmat(q)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)


def test_hat_vee(rng):
    w = jnp.asarray(rng.normal(size=3), jnp.float32)
    np.testing.assert_allclose(lie.vee(lie.hat(w)), w)
    v = jnp.asarray(rng.normal(size=3), jnp.float32)
    np.testing.assert_allclose(
        lie.hat(w) @ v, jnp.cross(w, v), atol=1e-6
    )
