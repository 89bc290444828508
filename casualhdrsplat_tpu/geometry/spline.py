"""Continuous-time SE(3) camera trajectories (SURVEY.md C10/C11).

The reference lineage (BAD-Gaussians `spline_functor.py`) implements linear
interpolation and the cumulative cubic B-spline on pypose LieTensors.  Here
both are pure-jnp functions over 4x4 matrices, differentiable w.r.t. the
knots through closed-form exp/log (geometry/lie.py), and `vmap`-ed over
query times so the n virtual camera poses of one frame evaluate as a single
batched computation (TPU-friendly: no per-pose Python loop).

Knot layout: `knots[M, 4, 4]` world-to-camera (or camera-to-world — the
spline is convention-agnostic), associated with uniformly spaced knot times
`t_j = t0 + j * dt`.  Queries are continuous times `t`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from casualhdrsplat_tpu.geometry import lie


def _segment_and_u(t, t0, dt, num_knots, order):
    """Map continuous time -> (base knot index, local parameter u in [0,1])."""
    s = (t - t0) / dt
    max_base = num_knots - order  # highest valid starting knot index
    base = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, max_base)
    u = s - base.astype(s.dtype)
    return base, u


def linear_interpolation(knots: jnp.ndarray, t0, dt, t: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-geodesic interpolation between adjacent knots.

    T(u) = T_j @ exp(u * log(T_j^-1 @ T_{j+1}))
    """

    def one(ti):
        base, u = _segment_and_u(ti, t0, dt, knots.shape[0], order=2)
        Ta = knots[base]
        Tb = knots[base + 1]
        rel = lie.se3_log(lie.mat_mul(lie.se3_inverse(Ta), Tb))
        return lie.mat_mul(Ta, lie.se3_exp(u * rel))

    return jax.vmap(one)(jnp.atleast_1d(t))


def cubic_bspline_interpolation(
    knots: jnp.ndarray, t0, dt, t: jnp.ndarray
) -> jnp.ndarray:
    """Cumulative cubic B-spline on SE(3) (C^2 trajectory).

    T(u) = T_j @ exp(B1(u) W1) @ exp(B2(u) W2) @ exp(B3(u) W3)
    with W_k = log(T_{j+k-1}^-1 @ T_{j+k}) and the cumulative basis
      B1 = (5 + 3u - 3u^2 + u^3)/6, B2 = (1 + 3u + 3u^2 - 2u^3)/6, B3 = u^3/6.

    Matches the spline of the reference lineage (BAD-NeRF eq. 5) evaluated
    here with closed-form jnp Lie ops.
    """

    def one(ti):
        base, u = _segment_and_u(ti, t0, dt, knots.shape[0], order=4)
        T0 = knots[base]
        u2 = u * u
        u3 = u2 * u
        b1 = (5.0 + 3.0 * u - 3.0 * u2 + u3) / 6.0
        b2 = (1.0 + 3.0 * u + 3.0 * u2 - 2.0 * u3) / 6.0
        b3 = u3 / 6.0
        out = T0
        for k, b in ((1, b1), (2, b2), (3, b3)):
            rel = lie.se3_log(
                lie.mat_mul(lie.se3_inverse(knots[base + k - 1]), knots[base + k])
            )
            out = lie.mat_mul(out, lie.se3_exp(b * rel))
        return out

    return jax.vmap(one)(jnp.atleast_1d(t))


def interpolate(knots, t0, dt, t, mode: str = "cubic"):
    if mode == "linear":
        return linear_interpolation(knots, t0, dt, t)
    if mode == "cubic":
        return cubic_bspline_interpolation(knots, t0, dt, t)
    raise ValueError(f"unknown spline mode {mode!r}")


def sample_virtual_times(t_start, delta_t, n: int):
    """n timestamps uniformly spanning the exposure window [t, t+delta_t].

    Mirrors the virtual-camera sampler of the pipeline figure (n yellow
    poses inside the blue exposure-time range).
    """
    frac = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    return t_start + frac * delta_t


def dense_grid(num_frames: int, per_frame: int, pad: int = 2, tail: float = 1.0):
    """Uniform SUB-FRAME knot grid: knot times for `per_frame` knots per
    frame interval, covering frame times [0, num_frames-1] plus `tail`
    frame intervals of exposure overhang (the last frame's blur window
    extends past its timestamp) plus `pad` knots beyond each end for the
    cubic basis.  Returns (times [M], t0, dt) with dt = 1/per_frame.

    Sub-frame control points are what make fast handheld shake
    representable: with one knot per frame the cubic basis low-passes any
    within-exposure motion to a fraction of the inter-frame pose delta,
    so genuinely blurred casual footage (10-30 px streaks at 800^2) needs
    a trajectory the frame-rate grid cannot express (SURVEY.md C10)."""
    import math

    k = per_frame
    j = jnp.arange(
        -pad, (num_frames - 1) * k + math.ceil(tail * k) + pad + 1,
        dtype=jnp.float32,
    )
    return j / k, -pad / k, 1.0 / k


def resample_knots(
    knots: jnp.ndarray,
    t0,
    dt,
    num_frames: int,
    per_frame: int,
    pad: int = 2,
    tail: float = 1.0,
    mode: str = "cubic",
):
    """Resample a (typically frame-rate) knot grid onto the dense_grid:
    new knot j = spline(old knots; clamp(t_j, 0, num_frames-1)).  Clamping
    repeats the boundary poses across the pad/tail region — the same
    semantics as knots_for_frames' repeated end knots.  Exactness is not
    required (curve samples of a cumulative B-spline re-used as knots give
    a slightly smoothed curve): this initializes a FINER learnable grid
    from coarse SfM poses, which the optimizer then refines.

    Returns (knots' [M',4,4], t0', dt')."""
    times, t0n, dtn = dense_grid(num_frames, per_frame, pad=pad, tail=tail)
    q = jnp.clip(times, 0.0, float(num_frames - 1))
    new = interpolate(knots, t0, dt, q, mode=mode)
    return new, t0n, dtn


def knots_for_frames(frame_poses: jnp.ndarray, pad: int = 2):
    """Initialize spline knots from per-frame SfM poses.

    Repeats the boundary poses `pad` times so a cubic spline with uniform
    knot spacing covers every frame time; returns (knots[M,4,4], t0, dt)
    for frame timestamps 0..N-1 (caller rescales dt for real timestamps).
    """
    first = jnp.repeat(frame_poses[:1], pad, axis=0)
    last = jnp.repeat(frame_poses[-1:], pad, axis=0)
    knots = jnp.concatenate([first, frame_poses, last], axis=0)
    return knots, -float(pad), 1.0
