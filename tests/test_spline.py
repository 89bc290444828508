"""SE(3) spline interpolation tests (SURVEY.md C10; hard part #5)."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.geometry import lie, spline


def make_knots(rng, m=8, scale=0.3):
    # A smooth-ish random trajectory: compose small increments.
    T = jnp.eye(4)
    knots = []
    for _ in range(m):
        T = T @ lie.se3_exp(jnp.asarray(rng.normal(size=6) * scale, jnp.float32))
        knots.append(T)
    return jnp.stack(knots)


def test_linear_hits_knots(rng):
    knots = make_knots(rng)
    t = jnp.arange(knots.shape[0] - 1, dtype=jnp.float32)
    out = spline.linear_interpolation(knots, 0.0, 1.0, t)
    np.testing.assert_allclose(out, knots[:-1], atol=1e-5)


def test_linear_midpoint_on_geodesic(rng):
    knots = make_knots(rng, m=2)
    out = spline.linear_interpolation(knots, 0.0, 1.0, jnp.array([0.5]))
    rel = lie.se3_log(lie.se3_inverse(knots[0]) @ knots[1])
    expect = knots[0] @ lie.se3_exp(0.5 * rel)
    np.testing.assert_allclose(out[0], expect, atol=1e-5)


def test_cubic_constant_trajectory_is_exact(rng):
    T = lie.se3_exp(jnp.asarray(rng.normal(size=6), jnp.float32))
    knots = jnp.broadcast_to(T, (6, 4, 4))
    out = spline.cubic_bspline_interpolation(
        knots, 0.0, 1.0, jnp.array([0.0, 0.3, 1.7, 2.0])
    )
    np.testing.assert_allclose(out, np.broadcast_to(np.asarray(T), out.shape), atol=1e-5)


def test_cubic_translation_only_matches_euclidean_bspline(rng):
    """With identity rotations the Lie spline reduces to the Euclidean
    cumulative cubic B-spline on translations."""
    pts = np.asarray(rng.normal(size=(8, 3)), np.float32)
    knots = jnp.stack([lie.rt_to_mat(jnp.eye(3), jnp.asarray(p)) for p in pts])
    u = 0.4
    base = 2
    out = spline.cubic_bspline_interpolation(
        knots, 0.0, 1.0, jnp.array([base + u], jnp.float32)
    )[0]
    u2, u3 = u * u, u * u * u
    b1 = (5 + 3 * u - 3 * u2 + u3) / 6
    b2 = (1 + 3 * u + 3 * u2 - 2 * u3) / 6
    b3 = u3 / 6
    d = np.diff(pts, axis=0)
    expect = pts[base] + b1 * d[base] + b2 * d[base + 1] + b3 * d[base + 2]
    np.testing.assert_allclose(out[:3, 3], expect, atol=1e-5)
    np.testing.assert_allclose(out[:3, :3], np.eye(3), atol=1e-6)


def test_cubic_continuity(rng):
    """C0 continuity across a segment boundary."""
    knots = make_knots(rng)
    eps = 1e-4
    a = spline.cubic_bspline_interpolation(knots, 0.0, 1.0, jnp.array([2.0 - eps]))
    b = spline.cubic_bspline_interpolation(knots, 0.0, 1.0, jnp.array([2.0 + eps]))
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_spline_gradient_wrt_knots_finite_difference(rng):
    knots = make_knots(rng, m=6)
    t = jnp.array([1.3], jnp.float32)
    p = jnp.asarray(rng.normal(size=3), jnp.float32)

    def f(k):
        T = spline.cubic_bspline_interpolation(k, 0.0, 1.0, t)[0]
        return jnp.sum((T[:3, :3] @ p + T[:3, 3]) ** 2)

    g = jax.grad(f)(knots)
    eps = 1e-3
    # check a handful of entries by central differences
    for idx in [(1, 0, 3), (2, 1, 1), (3, 2, 3), (0, 0, 0)]:
        d = np.zeros(knots.shape, np.float32)
        d[idx] = eps
        fd = (float(f(knots + d)) - float(f(knots - d))) / (2 * eps)
        assert abs(float(g[idx]) - fd) < 5e-2 * max(1.0, abs(fd)), (idx, float(g[idx]), fd)


def test_sample_virtual_times():
    t = spline.sample_virtual_times(2.0, 0.5, 4)
    np.testing.assert_allclose(t, 2.0 + (np.arange(4) + 0.5) / 4 * 0.5)
    assert float(t[0]) > 2.0 and float(t[-1]) < 2.5


def test_knots_for_frames(rng):
    poses = make_knots(rng, m=5)
    knots, t0, dt = spline.knots_for_frames(poses, pad=2)
    assert knots.shape == (9, 4, 4)
    out = spline.cubic_bspline_interpolation(knots, t0, dt, jnp.array([0.0]))
    assert np.all(np.isfinite(out))


def test_dense_grid_covers_frames_and_tail():
    times, t0, dt = spline.dense_grid(num_frames=5, per_frame=3, pad=2)
    times = np.asarray(times)
    assert dt == 1.0 / 3.0 and t0 == -2.0 / 3.0
    np.testing.assert_allclose(times[0], t0)
    np.testing.assert_allclose(np.diff(times), dt, atol=1e-6)
    # covers the last frame time plus a full exposure overhang, with the
    # cubic's 2-knot margin on both sides
    assert times[2] <= 0.0 and times[-3] >= 5.0 - 1.0 + 1.0


def test_resample_knots_reproduces_smooth_trajectory(rng):
    # A gentle trajectory: the dense re-knotted spline should evaluate
    # close to the original at the frame times and in between.
    knots = make_knots(rng, m=10, scale=0.05)
    frames = knots[2:8]  # pretend these are 6 per-frame poses
    coarse, t0, dt = spline.knots_for_frames(frames, pad=2)
    dense, t0d, dtd = spline.resample_knots(coarse, t0, dt, 6, per_frame=4)
    q = jnp.linspace(0.0, 5.0, 21)
    a = spline.cubic_bspline_interpolation(coarse, t0, dt, q)
    b = spline.cubic_bspline_interpolation(dense, t0d, dtd, q)
    # positions within a small fraction of the inter-knot motion (re-
    # knotting a cumulative B-spline from curve samples smooths slightly)
    np.testing.assert_allclose(a, b, atol=3e-2)


def test_dense_knots_represent_subframe_motion(rng):
    # A fast wiggle with period ~1/3 frame is invisible to a 1-knot-per-
    # frame grid but representable on a 3-per-frame grid: check the dense
    # spline reproduces poses sampled WITHIN one frame interval.
    times, t0, dt = spline.dense_grid(num_frames=4, per_frame=3, pad=2)
    m = times.shape[0]
    deltas = jnp.asarray(rng.normal(size=(m, 6)) * 0.05, jnp.float32)
    base = jnp.broadcast_to(jnp.eye(4), (m, 4, 4))
    knots = jax.vmap(lambda b, d: b @ lie.se3_exp(d))(base, deltas)
    q = jnp.array([0.1, 0.45, 0.8])
    out = spline.cubic_bspline_interpolation(knots, t0, dt, q)
    # the three poses inside frame 0 must differ measurably from each
    # other (sub-frame motion) — a frame-rate grid would collapse them
    d01 = float(jnp.max(jnp.abs(out[0] - out[1])))
    d12 = float(jnp.max(jnp.abs(out[1] - out[2])))
    assert d01 > 1e-3 and d12 > 1e-3
