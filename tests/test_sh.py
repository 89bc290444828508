"""SH evaluation tests (SURVEY.md C5)."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.ops import sh


def test_num_bases():
    assert [sh.num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]


def test_degree0_is_constant(rng):
    coeffs = jnp.asarray(rng.normal(size=(5, 16, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    out = sh.eval_sh(0, coeffs, dirs)
    expect = np.maximum(0.28209479177387814 * np.asarray(coeffs[:, 0]) + 0.5, 0.0)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_dc_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(0.1, 3.0, size=(7, 3)), jnp.float32)  # HDR > 1 ok
    coeffs = jnp.zeros((7, 16, 3)).at[:, 0].set(sh.rgb_to_sh_dc(rgb))
    dirs = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    np.testing.assert_allclose(sh.eval_sh(3, coeffs, dirs), rgb, atol=1e-5)


def test_parseval_orthonormality(rng):
    """Integral of each basis^2 over the sphere == 1 (Monte-Carlo check)
    — validates the normalization constants."""
    n = 200_000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    for basis in range(16):
        coeffs = jnp.zeros((1, 16, 3)).at[0, basis].set(1.0)
        vals = sh.eval_sh(3, jnp.broadcast_to(coeffs, (n, 16, 3)), dirs)[:, 0]
        # remove the +0.5 offset and the clamp by using the raw projection:
        raw = vals - 0.5
        raw = np.asarray(raw)
        mask = np.abs(raw) > 0  # clamp only bites when raw < -0.5; rare for unit coeff
        integral = (raw**2).mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.05, (basis, integral)


def test_rotation_invariance_deg1(rng):
    """Degree-1 SH of a rotated direction with rotated coeffs is invariant."""
    from casualhdrsplat_tpu.geometry import lie

    coeffs = jnp.zeros((1, 4, 3))
    vec = np.asarray(rng.normal(size=3), np.float32)
    coeffs = coeffs.at[0, 1, :].set(vec[0]).at[0, 2, :].set(vec[1]).at[0, 3, :].set(vec[2])
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    v1 = sh.eval_sh(1, coeffs, jnp.asarray(d, jnp.float32))
    # deg-1 SH is linear in direction: basis ~ (-y, z, -x)
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3), jnp.float32)))
    dr = R @ d
    # rotate the (-y, z, -x) coefficient vector consistently
    # eval_sh deg1: f(d) = C1*(-y c1 + z c2 - x c3) = (A @ vec) . d with
    # A mapping coeff order (c1,c2,c3) to the linear form in (x,y,z).
    A = np.array([[0, 0, -1], [-1, 0, 0], [0, 1, 0]], np.float32)
    w = A @ vec  # underlying linear form (up to the C1 constant)
    w_r = R @ w
    vec_r = A.T @ w_r  # A is a signed permutation: A^-1 == A.T
    coeffs_r = jnp.zeros((1, 4, 3))
    coeffs_r = (
        coeffs_r.at[0, 1, :].set(vec_r[0]).at[0, 2, :].set(vec_r[1]).at[0, 3, :].set(vec_r[2])
    )
    v2 = sh.eval_sh(1, coeffs_r, jnp.asarray(dr, jnp.float32))
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_grad_finite(rng):
    coeffs = jnp.asarray(rng.normal(size=(4, 16, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    g = jax.grad(lambda c: jnp.sum(sh.eval_sh(3, c, dirs)))(coeffs)
    assert np.all(np.isfinite(g))
