"""Oracle renderer correctness (SURVEY.md §4.1-4.2): analytic cases and
finite-difference gradient checks.  The oracle is in turn the allclose
target for the Pallas kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.data import synthetic
from casualhdrsplat_tpu.ops import oracle


def single_gaussian_scene(color=(1.0, 0.5, 0.25), opacity=0.8, z=2.0, s=0.15):
    return dict(
        means3d=jnp.array([[0.0, 0.0, z]]),
        quats=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        scales=jnp.full((1, 3), s),
        opacities=jnp.array([opacity]),
        colors=jnp.array([list(color)]),
    )


def test_single_gaussian_peak_value(rng):
    cam = synthetic.orbit_camera(0.0)  # radius 4 orbit looking at origin
    sc = single_gaussian_scene(z=0.0)  # at origin -> depth 4 from camera
    out = oracle.render(**sc, camera=cam)
    img = np.asarray(out.image)
    h, w = img.shape[:2]
    # peak at the image center, value ~ opacity * color (center alpha ~ o)
    cy, cx = np.unravel_index(img[..., 0].argmax(), img[..., 0].shape)
    assert abs(cy - h / 2) <= 1 and abs(cx - w / 2) <= 1
    # pixel-center offset means peak slightly below o*color
    assert img[cy, cx, 0] <= 0.8 + 1e-5
    assert img[cy, cx, 0] > 0.7
    np.testing.assert_allclose(
        img[cy, cx] / img[cy, cx, 0], np.array([1.0, 0.5, 0.25]) / 1.0, atol=1e-5
    )


def test_depth_ordering_front_occludes_back():
    cam = synthetic.orbit_camera(0.0, radius=4.0)
    # two gaussians on the optical axis: near red (opaque-ish), far green
    means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])  # cam at z=-4
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 3), 0.3)
    ops = jnp.array([0.95, 0.95])
    cols = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = oracle.render(means, quats, scales, ops, cols, cam)
    img = np.asarray(out.image)
    c = img[img.shape[0] // 2, img.shape[1] // 2]
    assert c[0] > 5 * max(c[1], 1e-6), c  # red dominates


def test_alpha_accumulation_and_background():
    cam = synthetic.orbit_camera(0.0)
    sc = single_gaussian_scene(opacity=0.5, z=0.0)
    bg = jnp.array([1.0, 1.0, 1.0])
    out_nobg = oracle.render(**sc, camera=cam)
    out_bg = oracle.render(**sc, camera=cam, background=bg)
    a = np.asarray(out_nobg.alpha)
    np.testing.assert_allclose(
        np.asarray(out_bg.image),
        np.asarray(out_nobg.image) + (1 - a[..., None]),
        atol=1e-5,
    )
    assert a.max() <= 0.5 + 1e-5


def test_empty_when_all_culled():
    cam = synthetic.orbit_camera(0.0)
    sc = single_gaussian_scene()
    sc["means3d"] = jnp.array([[0.0, 0.0, 100.0]])  # behind the camera rig? no:
    # camera at (0, .6, -4) looking at origin -> z=100 is far in front but
    # off... keep it simple: move it far off-screen laterally.
    sc["means3d"] = jnp.array([[1000.0, 0.0, 0.0]])
    out = oracle.render(**sc, camera=cam)
    np.testing.assert_allclose(out.image, 0.0, atol=1e-7)
    np.testing.assert_allclose(out.alpha, 0.0, atol=1e-7)


def test_hdr_radiance_unbounded():
    cam = synthetic.orbit_camera(0.0)
    sc = single_gaussian_scene(color=(25.0, 10.0, 5.0), opacity=0.9, z=0.0)
    out = oracle.render(**sc, camera=cam)
    assert float(np.max(out.image)) > 5.0  # no LDR clamp in HDR space


def test_gradcheck_vs_finite_difference(rng):
    """Central-difference check of d(loss)/d(params) through the full
    oracle: projection + compositing (SURVEY.md §4.2).  Runs in float64 —
    f32 FD noise would swamp small gradients."""
    with jax.enable_x64():
        cloud = synthetic.random_cloud(rng, 12)
        cam = synthetic.orbit_camera(0.1, width=24, img_height=20)
        target = jnp.asarray(rng.uniform(size=(20, 24, 3)))
        quats = cloud.quats.astype(jnp.float64)

        def loss(means, scales, ops, cols):
            out = oracle.render(means, quats, scales, ops, cols, cam)
            return jnp.mean((out.image - target) ** 2)

        args = tuple(
            jnp.asarray(a, jnp.float64)
            for a in (cloud.means3d, cloud.scales, cloud.opacities, cloud.colors)
        )
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
        f0 = loss(*args)
        assert np.isfinite(float(f0))

        for ai, g in enumerate(grads):
            g = np.asarray(g)
            arr = np.array(args[ai])
            flat_idx = np.argsort(-np.abs(g).ravel())[:4]  # largest grads
            for fi in flat_idx:
                idx = np.unravel_index(fi, arr.shape)
                eps = 1e-5 * max(1.0, abs(arr[idx]))
                ap = arr.copy()
                ap[idx] += eps
                am = arr.copy()
                am[idx] -= eps
                argp = list(args)
                argp[ai] = jnp.asarray(ap)
                argm = list(args)
                argm[ai] = jnp.asarray(am)
                fd = (float(loss(*argp)) - float(loss(*argm))) / (2 * eps)
                an = float(g[idx])
                denom = max(abs(fd), abs(an), 1e-6)
                assert abs(fd - an) / denom < 1e-3, (ai, idx, an, fd)


def test_composite_weights_sum_matches_alpha(rng):
    cloud = synthetic.random_cloud(rng, 30)
    cam = synthetic.orbit_camera(0.0, width=32, img_height=32)
    out = oracle.render(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors, cam
    )
    a = np.asarray(out.alpha)
    assert (a >= -1e-6).all() and (a <= 1.0 + 1e-6).all()
