"""Training losses (SURVEY.md C16): L1 + D-SSIM on the synthesized blurred
LDR frame vs the captured frame, plus the gauge-fixing priors that make
the joint HDR x exposure x CRF optimization well-posed."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def _ssim_cs(
    a: jnp.ndarray,
    b: jnp.ndarray,
    window: int = 11,
    sigma: float = 1.5,
    clamp: bool = True,
):
    """Shared SSIM internals: mean SSIM and mean contrast-structure (cs)
    over an [H,W,3] pair.  cs is the luminance-free factor MS-SSIM needs
    at its coarse scales."""
    c1, c2 = 0.01**2, 0.03**2
    half = window // 2
    x = jnp.arange(window, dtype=jnp.float32) - half
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()

    def blur(img):
        # separable depthwise convolution, NHWC with C groups
        img4 = img[None].transpose(0, 3, 1, 2)  # [1,C,H,W]
        kh = jnp.tile(g[None, None, :, None], (3, 1, 1, 1))  # [C,1,W,1]
        kw = jnp.tile(g[None, None, None, :], (3, 1, 1, 1))
        dn = jax.lax.conv_dimension_numbers(img4.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
        # fp32 convs: the TPU's bf16 matmul/conv default makes the
        # E[x^2]-E[x]^2 cancellation CATASTROPHIC (measured SSIM > 1.3
        # and garbage pose gradients on the chip; CPU tests force fp32
        # globally so only TPU runs saw it)
        out = jax.lax.conv_general_dilated(
            img4, kh, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=3, precision=jax.lax.Precision.HIGHEST,
        )
        out = jax.lax.conv_general_dilated(
            out, kw, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=3, precision=jax.lax.Precision.HIGHEST,
        )
        return out.transpose(0, 2, 3, 1)[0]

    mu_a, mu_b = blur(a), blur(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = blur(a * a) - mu_aa
    var_b = blur(b * b) - mu_bb
    cov = blur(a * b) - mu_ab
    if clamp:
        # E[x^2] - E[x]^2 cancels catastrophically in f32 on near-flat
        # bright windows, producing negative variances / inflated
        # covariances and per-pixel SSIM > 1 (observed up to 1.02 on
        # 800^2 evals).  Clamp variances at zero, covariance by
        # Cauchy-Schwarz; stop_gradient because the bound is a numerical
        # projection, not a term to differentiate through.
        var_a = jnp.maximum(var_a, 0.0)
        var_b = jnp.maximum(var_b, 0.0)
        lim = jax.lax.stop_gradient(
            jnp.sqrt(jnp.maximum(var_a * var_b, 1e-24))
        )
        cov = jnp.clip(cov, -lim, lim)
    cs = (2 * cov + c2) / (var_a + var_b + c2)
    lum = (2 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    return jnp.mean(lum * cs), jnp.mean(cs)


@functools.partial(jax.jit, static_argnames=("window", "sigma", "clamp"))
def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    window: int = 11,
    sigma: float = 1.5,
    clamp: bool = True,
):
    """Mean SSIM over an [H,W,3] pair (Gaussian 11x11 window, the standard
    constants of the 3DGS lineage). Differentiable.

    clamp=True (reported metrics) bounds the f32 moment cancellation that
    otherwise yields SSIM > 1 on near-flat bright windows.  The TRAINING
    loss uses clamp=False: that is the lineage's exact formulation (3DGS/
    fused-ssim don't clamp either), the tiny overshoot is harmless in a
    gradient, and the clamps cost several full-image ops in fwd+bwd."""
    return _ssim_cs(a, b, window, sigma, clamp)[0]


# Wang et al. 2003 per-scale weights, the convention every MS-SSIM
# implementation shares (interop constant, not copied code).
MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.partial(jax.jit, static_argnames=("scales",))
def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, scales: int = 5):
    """Multi-scale SSIM over an [H,W,3] pair — the standard 5-scale
    Wang-2003 formulation: contrast-structure at every scale, luminance
    only at the coarsest, combined as a weighted geometric mean.

    Serves as the perceptual metric in this image: LPIPS needs pretrained
    CNN weights that no package here ships (models/perceptual.py stays
    gated), while MS-SSIM is self-contained, deterministic, and
    differentiable.  Scales that the image is too small to support
    (min side < 11 px after halving) are dropped and the weights are
    renormalized — shapes are static under jit, so this is trace-time
    Python, not data-dependent control flow."""
    feasible = 1
    side = min(a.shape[0], a.shape[1])
    while feasible < scales and (side // 2) >= 11:
        side //= 2
        feasible += 1
    scales = min(scales, feasible)
    weights = jnp.asarray(MS_SSIM_WEIGHTS[:scales])
    weights = weights / weights.sum()

    def half(img):
        # 2x2 average pool, VALID — the lineage's downsampling
        return jax.lax.reduce_window(
            img, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
        ) * 0.25

    vals = []
    for s in range(scales):
        full, cs = _ssim_cs(a, b, clamp=True)
        vals.append(full if s == scales - 1 else cs)
        if s != scales - 1:
            a, b = half(a), half(b)
    # cs can be slightly negative on adversarial pairs; clamp before the
    # fractional power (same guard as the reference implementations).
    vals = jnp.maximum(jnp.stack(vals), 1e-6)
    return jnp.exp(jnp.sum(weights * jnp.log(vals)))


def d_ssim(a, b):
    return (1.0 - ssim(a, b, clamp=False)) / 2.0


def photometric(pred, target, ssim_lambda: float):
    """(1-l) L1 + l D-SSIM — the 3DGS photometric loss."""
    return (1.0 - ssim_lambda) * l1(pred, target) + ssim_lambda * d_ssim(pred, target)


def gaussian_blur(img: jnp.ndarray, sigma, k: int = 33) -> jnp.ndarray:
    """Separable Gaussian blur of an [H, W, 3] image with a TRACED sigma
    (one compiled program covers the whole coarse-to-fine schedule —
    sigma <= 1e-3 degenerates to an exact delta kernel / identity).

    Purpose (round-3 joint-recovery finding): with handheld-shake pose
    error of ~10-20 px, the photometric pose gradient is dominated by
    misaligned fine texture whose pulls average to noise, drowning the
    weak-but-correct pull of the smooth shading — the joint fit stalls
    with poses stuck at their init.  Blurring BOTH the render and the
    target early widens the alignment basin to ~sigma pixels; annealing
    sigma to 0 restores the full-detail objective."""
    kk = k if k % 2 == 1 else k + 1
    r = (kk - 1) // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    sig = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-3)
    w = jnp.where(
        sig > 1e-2,
        jnp.exp(-0.5 * (x / sig) ** 2),
        (x == 0).astype(jnp.float32),
    )
    w = w / jnp.sum(w)
    # [3,1,H,W] feature-map layout; two 1-D convs (separable)
    chw = img.transpose(2, 0, 1)[:, None]
    prec = jax.lax.Precision.HIGHEST  # bf16 conv default corrupts on TPU
    out = jax.lax.conv_general_dilated(
        chw, w.reshape(1, 1, kk, 1), (1, 1), "SAME", precision=prec)
    out = jax.lax.conv_general_dilated(
        out, w.reshape(1, 1, 1, kk), (1, 1), "SAME", precision=prec)
    return out[:, 0].transpose(1, 2, 0)


def exposure_prior(log_exposures: jnp.ndarray, log_init: jnp.ndarray) -> jnp.ndarray:
    """Pin the global exposure scale: the product HDR x dt x CRF has a
    gauge freedom; anchoring mean log-exposure to its init removes it."""
    return jnp.mean(log_exposures - log_init) ** 2


def psnr(a, b, max_val: float = 1.0):
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
