"""Gauge-aligned pose recovery metrics (train/metrics.py): the joint
scene+camera problem has a global sim(3) gauge, so the metric must score
a pure gauge transform as zero error while still seeing real noise."""

import numpy as np

from casualhdrsplat_tpu.train.metrics import pose_recovery_errors


def _expm(rng, s):
    w = rng.normal(size=3) * s
    th = np.linalg.norm(w)
    K = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
    ) / max(th, 1e-12)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _trajectory(rng, n=10):
    knots = []
    for _ in range(n):
        T = np.eye(4)
        T[:3, :3] = _expm(rng, 0.3)
        T[:3, 3] = rng.normal(size=3)
        knots.append(T)
    return np.stack(knots)


def _apply_sim3_gauge(knots, Rg, tg, s):
    """Camera-from-world viewmats under world gauge x' = s*Rg@x + tg."""
    out = knots.copy()
    for i in range(len(knots)):
        R, t = knots[i, :3, :3], knots[i, :3, 3]
        Rp = R @ Rg.T
        c = -R.T @ t
        cp = s * (Rg @ c) + tg
        out[i, :3, :3] = Rp
        out[i, :3, 3] = -Rp @ cp
    return out


def test_pure_gauge_scores_zero():
    rng = np.random.default_rng(0)
    knots = _trajectory(rng)
    gauged = _apply_sim3_gauge(knots, _expm(rng, 0.5), rng.normal(size=3), 1.7)
    rot, trans = pose_recovery_errors(knots, gauged)
    assert rot.max() < 1e-5, rot
    assert trans.max() < 1e-9, trans


def test_noise_is_detected_proportionally():
    rng = np.random.default_rng(1)
    knots = _trajectory(rng)
    gauged = _apply_sim3_gauge(knots, _expm(rng, 0.5), rng.normal(size=3), 1.3)
    noisy = gauged.copy()
    for i in range(len(knots)):
        noisy[i, :3, :3] = _expm(rng, 0.01) @ noisy[i, :3, :3]
    rot_small, _ = pose_recovery_errors(knots, noisy)
    noisier = gauged.copy()
    for i in range(len(knots)):
        noisier[i, :3, :3] = _expm(rng, 0.05) @ noisier[i, :3, :3]
    rot_big, _ = pose_recovery_errors(knots, noisier)
    assert 0.1 < rot_small.mean() < 3.0
    assert rot_big.mean() > 2.5 * rot_small.mean()


def test_center_noise_reaches_ate():
    rng = np.random.default_rng(2)
    knots = _trajectory(rng)
    noisy = knots.copy()
    for i in range(len(knots)):
        R = noisy[i, :3, :3]
        c = -R.T @ noisy[i, :3, 3] + rng.normal(size=3) * 0.05
        noisy[i, :3, 3] = -R @ c
    _, trans = pose_recovery_errors(knots, noisy)
    assert 0.01 < trans.mean() < 0.2


def test_trajectory_errors_ignore_null_space_knots():
    """Knots OUTSIDE the sampled windows may differ wildly without
    affecting the sampled-time trajectory error (the dense-grid null
    space that makes knot-space comparison meaningless)."""
    import jax.numpy as jnp

    from casualhdrsplat_tpu.geometry import lie, spline
    from casualhdrsplat_tpu.train import metrics

    times_k, t0, dt = spline.dense_grid(num_frames=4, per_frame=3, pad=2)
    m = times_k.shape[0]
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.normal(0, 0.05, (m, 6)), jnp.float32)
    gt = lie.se3_exp_batch(xi)

    # estimated = GT everywhere except a pad/tail knot far outside the
    # sampled range, wildly perturbed
    est = gt.at[0].set(gt[0] @ lie.se3_exp(jnp.asarray(
        [0.5, -0.4, 0.3, 1.0, -1.0, 0.5], jnp.float32)))
    # windows sample only t in [1.0, 2.5]
    q = jnp.asarray(metrics.exposure_window_times(
        [1.0, 2.0], [0.5, 0.5], per_frame=5), jnp.float32)
    rot, trans = metrics.trajectory_recovery_errors(
        gt, t0, dt, est, t0, dt, q)
    assert rot.max() < 0.05 and trans.max() < 1e-4, (rot.max(), trans.max())

    # ...while a perturbation INSIDE the window is detected
    mid = m // 2  # knot at t ~ 1.3 (inside [1, 2.5])
    est2 = gt.at[mid].set(gt[mid] @ lie.se3_exp(jnp.asarray(
        [0.1, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)))
    rot2, _ = metrics.trajectory_recovery_errors(gt, t0, dt, est2, t0, dt, q)
    assert rot2.max() > 0.5  # degrees


def test_exposure_window_times_cover_windows():
    from casualhdrsplat_tpu.train import metrics

    q = metrics.exposure_window_times([0.0, 1.0], [0.4, 0.2], per_frame=3)
    np.testing.assert_allclose(q, [0.0, 0.2, 0.4, 1.0, 1.1, 1.2], atol=1e-9)
