"""Learnable camera response function F_theta (SURVEY.md C14).

pipeline.png: "F_theta: implicit CRF representation", shared across all
virtual cameras ("shared parameters" arrows), mapping virtual sharp HDR
radiance x exposure time -> LDR in [0,1].

TPU-native design: a per-channel MONOTONE mlp over normalized
log-exposure — weights are softplus-reparameterized to be nonnegative and
activations are monotone, so the learned response is a valid CRF by
construction (the reference lineage's HDR-NeRF-style MLP relies on soft
penalties instead).  Applied pointwise to [..., 3] images; everything is
elementwise + tiny matmuls that XLA fuses into the render graph.

Kinds: "identity" (clip(E, 0, 1) — degenerate config that reproduces
BAD-Gaussians-style LDR deblurring, SURVEY.md §0.2), "gamma" (fixed
gamma curve), "mlp" (learnable).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.config import CRFConfig

Params = Dict[str, jnp.ndarray]

_EPS = 1e-8


def _inv_softplus(y: float) -> float:
    return float(np.log(np.expm1(y)))


def create(cfg: CRFConfig, rng_key: Optional[jax.Array] = None) -> Params:
    """Initialize the monotone mixture near a plausible camera curve.

    cfg.init_gamma > 0 (default 2.2): pre-fit the mixture to that gamma
    curve (sRGB-like — the universal camera-encoding prior) with a short
    jitted Adam loop; deterministic.  0: legacy s-curve approximating
    clip(E, 0, 1) (identity tone-mapping)."""
    if cfg.kind != "mlp":
        return {}
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    c, h = 3, cfg.hidden
    # sigmoid(gain*(x - x0)) with gain ~ 1.32*span, x0 at E~0.35
    # approximates clip(E, 0, 1) over the normalized log range.
    span = cfg.log_max - cfg.log_min
    gain = 1.32 * span
    x0 = (np.log(0.35) - cfg.log_min) / span
    params = {
        # per-channel sigmoid units: slopes k, centers c, weights w (raw,
        # softplus-reparameterized nonneg; near-zero at init)
        "unit_k": jnp.ones((c, h)),
        "unit_c": jnp.tile(jnp.linspace(0.05, 0.95, h)[None], (c, 1)),
        "unit_w": jnp.full((c, h), -4.0)
        + 0.01 * jax.random.normal(rng_key, (c, h)),
        "gain": jnp.full((c,), _inv_softplus(gain)),
        "bias": jnp.full((c,), -gain * x0),
    }
    if cfg.init_gamma > 0.0:
        params = _prefit_to_gamma(params, cfg)
    return params


def _prefit_to_gamma(params: Params, cfg: CRFConfig, steps: int = 1200) -> Params:
    """Fit the mixture to clip(E,0,1)^(1/init_gamma) on log-spaced samples
    (one-time, jitted fori_loop — runs in well under a second)."""
    import optax

    e = jnp.exp(jnp.linspace(cfg.log_min, cfg.log_max, 256))
    target = jnp.clip(e, 0.0, 1.0) ** (1.0 / cfg.init_gamma)
    e3 = jnp.tile(e[:, None], (1, 3))
    opt = optax.adam(1e-2)

    def loss_fn(p):
        return jnp.mean((apply(p, e3, cfg) - target[:, None]) ** 2)

    @jax.jit
    def fit(p):
        state = opt.init(p)

        def body(_, carry):
            p, state = carry
            g = jax.grad(loss_fn)(p)
            updates, state = opt.update(g, state, p)
            return optax.apply_updates(p, updates), state

        p, _ = jax.lax.fori_loop(0, steps, body, (p, state))
        return p

    return fit(params)


def apply(params: Params, hdr_exposed: jnp.ndarray, cfg: CRFConfig) -> jnp.ndarray:
    """Map exposed HDR radiance E = H * dt to LDR in [0, 1].

    hdr_exposed: [..., 3] linear, >= 0.
    """
    e = jnp.maximum(hdr_exposed, 0.0)
    if cfg.kind == "identity":
        return jnp.clip(e, 0.0, 1.0)
    if cfg.kind == "gamma":
        # linear ramp below eps: d/dx x^(1/g) -> inf at 0 (NaN training
        # gradients on background pixels); the ramp matches value and
        # keeps the curve monotone/continuous
        y = jnp.clip(e, 0.0, 1.0)
        eps = 1e-4
        inv_g = 1.0 / cfg.gamma
        safe = jnp.maximum(y, eps)
        return jnp.where(y > eps, safe**inv_g, y * eps ** (inv_g - 1.0))
    x = _norm_log(e, cfg)  # [..., 3] in ~[0, 1]
    return _monotone_mlp(params, x)


def response_curve(params: Params, cfg: CRFConfig, num: int = 256):
    """Sampled CRF for logging/priors: log-spaced exposures -> LDR."""
    e = jnp.exp(jnp.linspace(cfg.log_min, cfg.log_max, num))
    e3 = jnp.tile(e[:, None], (1, 3))
    return e, apply(params, e3, cfg)


def _norm_log(e: jnp.ndarray, cfg: CRFConfig) -> jnp.ndarray:
    x = (jnp.log(e + _EPS) - cfg.log_min) / (cfg.log_max - cfg.log_min)
    return x


def _monotone_mlp(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel monotone one-hidden-layer MLP: a positive mixture of
    sigmoid units sigma(k_j (x - c_j)) plus a positive linear skip, pushed
    through an output sigmoid — monotone by construction, and pure
    elementwise VPU work (no matmuls: tall-skinny dots stall the TPU
    compiler, see the note in ops/projection.py)."""
    batch_shape = x.shape[:-1]
    xc = x.reshape(-1, 3).T[:, :, None]  # [3, B, 1]
    k = jax.nn.softplus(params["unit_k"])[:, None, :] * 20.0  # [3,1,H]
    w = jax.nn.softplus(params["unit_w"])[:, None, :]
    c = params["unit_c"][:, None, :]
    y = jnp.sum(w * jax.nn.sigmoid(k * (xc - c)), axis=-1)  # [3,B]
    gain = jax.nn.softplus(params["gain"])[:, None]
    y = y + gain * xc[..., 0] + params["bias"][:, None]
    # Stretch slightly past [0,1] then clip so the curve can reach exact
    # black/white (a bare sigmoid needs logit -> inf to hit 0 or 1).
    out = jax.nn.sigmoid(y) * 1.004 - 0.002
    return jnp.clip(out, 0.0, 1.0).T.reshape(*batch_shape, 3)


def smoothness_prior(params: Params, cfg: CRFConfig, num: int = 64) -> jnp.ndarray:
    """Second-difference penalty on the response curve (C16 regularizer)."""
    if cfg.kind != "mlp":
        return jnp.zeros(())
    _, ldr = response_curve(params, cfg, num)
    d2 = ldr[2:] - 2.0 * ldr[1:-1] + ldr[:-2]
    return jnp.mean(d2 * d2) * num**2


def chroma_prior(params: Params, cfg: CRFConfig, num: int = 64) -> jnp.ndarray:
    """Penalize divergence between the per-channel response curves.

    The joint model has a CHROMATIC gauge: a CRF whose channels drift
    apart (e.g. green-heavy) can be compensated by oppositely-tinted
    per-splat SH colors, leaving training renders unchanged while both
    estimates walk away from the truth.  Real camera CRFs are per-channel
    but nearly identical; penalizing the cross-channel variance of the
    sampled curve pins the gauge without constraining the SHAPE."""
    if cfg.kind != "mlp":
        return jnp.zeros(())
    _, ldr = response_curve(params, cfg, num)  # [num, 3]
    dev = ldr - jnp.mean(ldr, axis=-1, keepdims=True)
    return jnp.mean(dev * dev)
