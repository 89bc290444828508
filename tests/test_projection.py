"""EWA projection unit tests (SURVEY.md C1; gsplat math supplement)."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.geometry.camera import Camera, look_at
from casualhdrsplat_tpu.ops import projection


def make_cam(w=64, h=48, f=60.0):
    viewmat = jnp.eye(4)
    return Camera.make(viewmat, f, f, w / 2, h / 2, w, h)


def test_center_projection():
    cam = make_cam()
    means = jnp.array([[0.0, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.full((1, 3), 0.1)
    p = projection.project_gaussians(
        means, quats, scales, cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height,
    )
    np.testing.assert_allclose(p.means2d[0], [cam.width / 2, cam.height / 2], atol=1e-5)
    np.testing.assert_allclose(p.depths[0], 2.0)
    assert bool(p.valid[0])


def test_offset_projection_pinhole():
    cam = make_cam()
    means = jnp.array([[0.5, -0.25, 2.0]])
    p = projection.project_gaussians(
        means, jnp.array([[1.0, 0, 0, 0]]), jnp.full((1, 3), 0.05),
        cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )
    expect = [60.0 * 0.25 + 32, 60.0 * (-0.125) + 24]
    np.testing.assert_allclose(p.means2d[0], expect, atol=1e-5)


def test_isotropic_cov2d():
    """Isotropic Gaussian on the optical axis: cov2d = (f*s/z)^2 I + blur."""
    cam = make_cam()
    s = 0.1
    z = 2.0
    p = projection.project_gaussians(
        jnp.array([[0.0, 0.0, z]]), jnp.array([[1.0, 0, 0, 0]]),
        jnp.full((1, 3), s), cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height,
    )
    var = (60.0 * s / z) ** 2 + projection.BLUR_2D
    conic_expect = np.array([1 / var, 0.0, 1 / var])
    np.testing.assert_allclose(p.conics[0], conic_expect, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(p.radii[0], np.ceil(3 * np.sqrt(var)), atol=1e-5)


def test_behind_camera_culled():
    cam = make_cam()
    p = projection.project_gaussians(
        jnp.array([[0.0, 0.0, -2.0], [0.0, 0.0, 0.01]]),
        jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
        jnp.full((2, 3), 0.1), cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height,
    )
    assert not bool(p.valid[0])
    assert not bool(p.valid[1])  # closer than near plane
    assert float(p.radii[0]) == 0.0


def test_offscreen_culled():
    cam = make_cam()
    p = projection.project_gaussians(
        jnp.array([[50.0, 0.0, 2.0]]), jnp.array([[1.0, 0, 0, 0]]),
        jnp.full((1, 3), 0.01), cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height,
    )
    assert not bool(p.valid[0])


def test_viewmat_rotation_consistency(rng):
    """Projecting through a rotated camera == rotating the points."""
    cam = make_cam()
    viewmat = look_at((1.0, 0.5, -3.0), (0.0, 0.0, 0.0))
    means = jnp.asarray(rng.uniform(-0.5, 0.5, size=(10, 3)), jnp.float32)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (10, 1))
    scales = jnp.full((10, 3), 0.05)
    p1 = projection.project_gaussians(
        means, quats, scales, viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height,
    )
    R, t = viewmat[:3, :3], viewmat[:3, 3]
    means_cam = means @ R.T + t
    p2 = projection.project_gaussians(
        means_cam, quats, scales, jnp.eye(4), cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height,
    )
    np.testing.assert_allclose(p1.means2d, p2.means2d, atol=1e-4)
    np.testing.assert_allclose(p1.depths, p2.depths, atol=1e-5)
    # covariances differ (quats not rotated) — but isotropic check on conics
    # would hold; skip.


def test_cov3d(rng):
    q = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.1, 1.0, size=(5, 3)), jnp.float32)
    cov = projection.quat_scale_to_cov3d(q, s)
    # symmetric PSD with det = prod(s^2)
    np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), -1, -2), atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.det(np.asarray(cov)), np.prod(np.asarray(s) ** 2, -1), rtol=1e-4
    )


def test_projection_grads_finite(rng):
    cam = make_cam()
    means = jnp.asarray(rng.uniform(-0.5, 0.5, size=(20, 3)) + [0, 0, 2.5], jnp.float32)
    quats = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.02, 0.1, size=(20, 3)), jnp.float32)

    def f(m, q, s):
        p = projection.project_gaussians(
            m, q, s, cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height,
        )
        return jnp.sum(p.means2d) + jnp.sum(p.conics) + jnp.sum(p.depths)

    gm, gq, gs = jax.grad(f, argnums=(0, 1, 2))(means, quats, scales)
    for g in (gm, gq, gs):
        assert np.all(np.isfinite(g))
