"""Loss tests (SURVEY.md C16)."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.models import losses


def test_ssim_identity(rng):
    a = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
    assert abs(float(losses.ssim(a, a)) - 1.0) < 1e-5
    assert abs(float(losses.d_ssim(a, a))) < 1e-5


def test_ssim_decreases_with_noise(rng):
    a = jnp.asarray(rng.uniform(size=(48, 48, 3)), jnp.float32)
    n1 = a + 0.05 * jnp.asarray(rng.normal(size=a.shape), jnp.float32)
    n2 = a + 0.3 * jnp.asarray(rng.normal(size=a.shape), jnp.float32)
    s1, s2 = float(losses.ssim(a, n1)), float(losses.ssim(a, n2))
    assert 1.0 > s1 > s2


def test_ssim_matches_reference_structure(rng):
    """Constant-shifted image: SSIM dominated by luminance term only."""
    a = jnp.asarray(rng.uniform(0.2, 0.6, size=(40, 40, 3)), jnp.float32)
    b = a + 0.1
    s = float(losses.ssim(a, b))
    assert 0.5 < s < 1.0


def test_ssim_grad_finite(rng):
    a = jnp.asarray(rng.uniform(size=(24, 24, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(24, 24, 3)), jnp.float32)
    g = jax.grad(lambda x: losses.d_ssim(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_photometric_weighting(rng):
    a = jnp.asarray(rng.uniform(size=(24, 24, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(24, 24, 3)), jnp.float32)
    l0 = float(losses.photometric(a, b, 0.0))
    np.testing.assert_allclose(l0, float(losses.l1(a, b)), rtol=1e-6)
    l1v = float(losses.photometric(a, b, 1.0))
    np.testing.assert_allclose(l1v, float(losses.d_ssim(a, b)), rtol=1e-6)


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, atol=1e-4)


def test_exposure_prior():
    le = jnp.array([0.2, -0.2, 0.1, -0.1])
    init = jnp.zeros(4)
    assert float(losses.exposure_prior(le, init)) == 0.0  # mean matches
    assert float(losses.exposure_prior(le + 1.0, init)) > 0.5


def test_ssim_bounded_on_flat_bright_windows():
    """f32 moment cancellation must not push reported SSIM above 1 (it
    reached 1.02 on 800^2 evals before the clamp); identical images score
    exactly 1."""
    import numpy as np

    rng = np.random.default_rng(0)
    base = 0.9 + 1e-4 * rng.standard_normal((128, 128, 3))
    a = jnp.asarray(base, jnp.float32)
    b = jnp.asarray(base + 1e-5 * rng.standard_normal(base.shape), jnp.float32)
    assert float(losses.ssim(a, b)) <= 1.0 + 1e-6
    assert abs(float(losses.ssim(a, a)) - 1.0) < 1e-5


def test_ms_ssim_identity_and_noise(rng):
    a = jnp.asarray(rng.uniform(size=(96, 96, 3)), jnp.float32)
    assert abs(float(losses.ms_ssim(a, a)) - 1.0) < 1e-4
    n1 = a + 0.05 * jnp.asarray(rng.normal(size=a.shape), jnp.float32)
    n2 = a + 0.3 * jnp.asarray(rng.normal(size=a.shape), jnp.float32)
    s1, s2 = float(losses.ms_ssim(a, n1)), float(losses.ms_ssim(a, n2))
    assert 1.0 > s1 > s2 > 0.0


def test_ms_ssim_small_image_drops_scales(rng):
    """A 16^2 image supports only scale 1 (16//2=8 < the 11-px window):
    must not crash, must renormalize to plain SSIM.  Uses a CORRELATED
    pair so the comparison is away from the 1e-6 clamp floor (an
    uncorrelated pair passes vacuously — both sides clamp)."""
    a = jnp.asarray(rng.uniform(size=(16, 16, 3)), jnp.float32)
    b = a + 0.05 * jnp.asarray(rng.normal(size=a.shape), jnp.float32)
    ms, s = float(losses.ms_ssim(a, b)), float(losses.ssim(a, b))
    assert 0.5 < ms < 1.0
    np.testing.assert_allclose(ms, s, rtol=1e-5)
    # and at 24^2 TWO scales fit, so MS-SSIM must differ from plain SSIM
    a2 = jnp.asarray(rng.uniform(size=(24, 24, 3)), jnp.float32)
    b2 = a2 + 0.05 * jnp.asarray(rng.normal(size=a2.shape), jnp.float32)
    assert abs(float(losses.ms_ssim(a2, b2)) - float(losses.ssim(a2, b2))) > 1e-4


def test_ms_ssim_prefers_blur_over_noise_vs_ssim(rng):
    """The multi-scale metric is more forgiving of mild blur (structure
    preserved at coarse scales) relative to equal-SSIM noise — a sanity
    check that the coarse scales actually participate."""
    x = np.linspace(0, 4 * np.pi, 96)
    img = 0.5 + 0.4 * np.sin(x)[:, None] * np.cos(x)[None, :]
    a = jnp.asarray(np.tile(img[..., None], (1, 1, 3)), jnp.float32)
    ab = jax.lax.reduce_window(a, 0.0, jax.lax.add, (5, 5, 1), (1, 1, 1),
                               "SAME") / 25.0  # 5x5 box blur
    noisy = a + 0.25 * jnp.asarray(rng.normal(size=a.shape), jnp.float32)
    assert float(losses.ms_ssim(a, ab)) > float(losses.ms_ssim(a, noisy))


def test_ms_ssim_grad_finite(rng):
    a = jnp.asarray(rng.uniform(size=(48, 48, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(48, 48, 3)), jnp.float32)
    g = jax.grad(lambda x: 1.0 - losses.ms_ssim(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_gaussian_blur_traced_sigma():
    import jax
    import jax.numpy as jnp

    from casualhdrsplat_tpu.models import losses

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(24, 20, 3)), jnp.float32)
    f = jax.jit(losses.gaussian_blur)
    # sigma 0 -> identity (delta kernel)
    np.testing.assert_allclose(np.asarray(f(img, 0.0)), np.asarray(img),
                               atol=1e-6)
    # larger sigma -> lower variance, mass approximately preserved
    out = np.asarray(f(img, 3.0))
    assert out.std() < 0.7 * float(np.asarray(img).std())
    inner = out[8:-8, 8:-8]  # away from SAME-padding borders
    np.testing.assert_allclose(
        inner.mean(), np.asarray(img).mean(), atol=0.05
    )
    # the whole schedule reuses ONE executable (traced sigma)
    assert f._cache_size() == 1
