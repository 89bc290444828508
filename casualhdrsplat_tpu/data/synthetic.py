"""Synthetic scene + casual-video generators for tests and the config
ladder (SURVEY.md §7 M0: "tiny synthetic scene generator (known Gaussians,
analytic camera)").

Generates:
- random-but-reasonable Gaussian clouds in front of a camera rig;
- orbiting camera trajectories (optionally with a continuous-time SE(3)
  spline for motion-blur fixtures);
- "casual video" renderings with ground-truth exposure times and a known
  CRF, produced by the oracle renderer — the fixtures for ladder configs
  2/3/4 and for end-to-end recovery tests.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from casualhdrsplat_tpu.geometry import lie, spline
from casualhdrsplat_tpu.geometry.camera import Camera, look_at


class GaussianCloud(NamedTuple):
    means3d: jnp.ndarray  # [N,3]
    quats: jnp.ndarray  # [N,4]
    scales: jnp.ndarray  # [N,3] positive
    opacities: jnp.ndarray  # [N] in (0,1)
    colors: jnp.ndarray  # [N,3] linear HDR radiance


def random_cloud(
    rng: np.random.Generator,
    n: int,
    extent: float = 1.0,
    scale_range=(0.02, 0.08),
    hdr_max: float = 1.0,
) -> GaussianCloud:
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return GaussianCloud(
        means3d=jnp.asarray(rng.uniform(-extent, extent, size=(n, 3)), jnp.float32),
        quats=jnp.asarray(q, jnp.float32),
        scales=jnp.asarray(
            rng.uniform(scale_range[0], scale_range[1], size=(n, 3)), jnp.float32
        ),
        opacities=jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)), jnp.float32),
        colors=jnp.asarray(
            rng.uniform(0.0, hdr_max, size=(n, 3)), jnp.float32
        ),
    )


def orbit_camera(
    angle: float,
    radius: float = 4.0,
    height: float = 0.6,
    width: int = 64,
    img_height: int = 64,
    focal: float | None = None,
) -> Camera:
    eye = (radius * np.sin(angle), height, -radius * np.cos(angle))
    viewmat = look_at(eye, (0.0, 0.0, 0.0))
    if focal is None:
        focal = 0.9 * width
    return Camera.make(
        viewmat, focal, focal, width / 2.0, img_height / 2.0, width, img_height
    )


def orbit_knots(
    num: int,
    angle_span: float = 0.6,
    radius: float = 4.0,
    width: int = 64,
    img_height: int = 64,
) -> jnp.ndarray:
    """Spline control knots [M,4,4] along an orbit segment."""
    angles = np.linspace(-angle_span / 2, angle_span / 2, num)
    mats = [
        orbit_camera(a, radius=radius, width=width, img_height=img_height).viewmat
        for a in angles
    ]
    return jnp.stack(mats)


class SyntheticVideo(NamedTuple):
    """Ground-truth casual video fixture."""

    cloud: GaussianCloud
    images: jnp.ndarray  # [F,H,W,3] observed LDR (blurred, auto-exposed)
    sharp_hdr: jnp.ndarray  # [F,H,W,3] mid-exposure sharp HDR renders
    sharp_ldr: jnp.ndarray  # [F,H,W,3] GT-CRF tone-map of sharp_hdr * dt_i
    timestamps: jnp.ndarray  # [F] frame start times
    exposures: jnp.ndarray  # [F] ground-truth exposure durations
    knots: jnp.ndarray  # [M,4,4] ground-truth spline knots
    knot_t0: float
    knot_dt: float
    camera: Camera  # intrinsics template (viewmat unused)


def make_casual_video(
    rng: np.random.Generator,
    n_gaussians: int = 300,
    n_frames: int = 6,
    n_virtual: int = 9,
    size: int = 48,
    angle_span: float = 0.5,
    exposure_range=(0.3, 1.2),
    crf_gamma: float = 2.2,
    blur: bool = True,
    renderer: str = "oracle",
    raster_cfg=None,
    hdr_max: float = 2.5,
    scale_range=(0.02, 0.08),
    extent: float = 1.0,
) -> SyntheticVideo:
    """Render a ground-truth auto-exposed blurry video with the oracle.

    Frame i spans [t_i, t_i + dt_i] on a cubic spline; observed image is
    the mean of `n_virtual` sharp LDR renders, each LDR = gamma-CRF of
    (HDR * dt_i).  Frame times are 0..n_frames-1; exposures are a fraction
    of the inter-frame interval.

    `renderer="fast"` generates GT through the production rasterizer
    instead of the dense [N, H*W] oracle — required for at-spec fixtures
    (800^2, 10k+ GT Gaussians) where the oracle's dense pixel-Gaussian
    matrix would not fit.  The production path is oracle-allclose-tested
    at small scale (tests/test_rasterize*.py), so fixtures stay honest.
    """
    from casualhdrsplat_tpu.ops import oracle

    if renderer == "fast":
        from casualhdrsplat_tpu import config as config_mod
        from casualhdrsplat_tpu.ops import rasterize as raster_mod

        if raster_cfg is None:
            raster_cfg = config_mod.RasterizeConfig(shared_binning=False)

    cloud = random_cloud(
        rng, n_gaussians, extent=extent, hdr_max=hdr_max, scale_range=scale_range
    )
    cam = orbit_camera(0.0, width=size, img_height=size)
    frame_angles = np.linspace(-angle_span / 2, angle_span / 2, n_frames)
    poses = jnp.stack(
        [
            orbit_camera(a, width=size, img_height=size).viewmat
            for a in frame_angles
        ]
    )
    knots, t0, dt = spline.knots_for_frames(poses, pad=2)

    # The unified image-formation model uses ONE quantity per frame: the
    # exposure time dt_i both scales irradiance (H * dt) and spans the blur
    # window on the spline (pipeline.png legend "auto exposure time").
    exposures = rng.uniform(*exposure_range, size=n_frames).astype(np.float32)

    if renderer == "fast":
        import jax

        @jax.jit
        def _render_views_fast(mats):
            imgs, _, aux = raster_mod.rasterize(
                cloud.means3d, cloud.quats, cloud.scales, cloud.opacities,
                cloud.colors, mats, cam.fx, cam.fy, cam.cx, cam.cy,
                cam.width, cam.height, raster_cfg,
            )
            return imgs, aux.num_dropped

        def render_views(mats):
            imgs, dropped = _render_views_fast(mats)
            # GROUND TRUTH must never be budget-truncated: a waterfilled
            # fixture silently corrupts every downstream quality metric
            # (the first 800^2 fixture cut rendered with empty image
            # bottoms).  Raise rather than return approximate GT.
            if int(dropped) != 0:
                raise ValueError(
                    f"synthetic GT fixture overflowed the rasterizer "
                    f"stream budget ({int(dropped)} contributions "
                    "dropped) — raise raster_cfg.stream_factor / "
                    "tile_capacity or shrink the fixture (docs/TUNING.md)"
                )
            return imgs
    else:

        def render_views(mats):
            return jnp.stack(
                [
                    oracle.render(
                        cloud.means3d,
                        cloud.quats,
                        cloud.scales,
                        cloud.opacities,
                        cloud.colors,
                        cam.with_viewmat(mats[k]),
                    ).image
                    for k in range(mats.shape[0])
                ]
            )

    timestamps = np.arange(n_frames, dtype=np.float32)
    images, sharp = [], []
    for i in range(n_frames):
        t_k = spline.sample_virtual_times(
            timestamps[i], exposures[i] if blur else 0.0, n_virtual if blur else 1
        )
        mats = spline.cubic_bspline_interpolation(knots, t0, dt, t_k)
        hdrs = render_views(mats)
        ldrs = jnp.clip(hdrs * exposures[i], 0.0, 1.0) ** (1.0 / crf_gamma)
        images.append(jnp.mean(ldrs, axis=0))
        mid_t = timestamps[i] + (exposures[i] / 2.0 if blur else 0.0)
        mid = spline.cubic_bspline_interpolation(
            knots, t0, dt, jnp.array([mid_t])
        )
        sharp.append(render_views(mid)[0])
    sharp_hdr = jnp.stack(sharp)
    sharp_ldr = (
        jnp.clip(sharp_hdr * jnp.asarray(exposures)[:, None, None, None], 0.0, 1.0)
        ** (1.0 / crf_gamma)
    )
    return SyntheticVideo(
        cloud=cloud,
        images=jnp.stack(images),
        sharp_hdr=sharp_hdr,
        sharp_ldr=sharp_ldr,
        timestamps=jnp.asarray(timestamps),
        exposures=jnp.asarray(exposures),
        knots=knots,
        knot_t0=t0,
        knot_dt=dt,
        camera=cam,
    )
