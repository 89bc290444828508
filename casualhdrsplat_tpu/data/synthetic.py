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


def _smooth_field(rng: np.random.Generator, pts: np.ndarray,
                  n_waves: int = 6, freq=(2.0, 12.0)) -> np.ndarray:
    """Smooth scalar field in ~[-1,1] over 3D points: a sum of random
    plane waves.  Spatially correlated (C^inf), so nearby splats get
    nearby colors — the piecewise-smooth appearance real scenes have."""
    k = rng.uniform(freq[0], freq[1], size=n_waves)
    dirs = rng.normal(size=(n_waves, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    phase = rng.uniform(0.0, 2 * np.pi, size=n_waves)
    vals = np.sin(pts @ (dirs.T * k) + phase).sum(axis=-1)
    return vals / np.sqrt(n_waves)


def _tangent_quats(normals: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Unit quaternions (w,x,y,z) whose rotation maps local +z to the
    surface normal, with a random in-plane spin — flat surfel splats."""
    import jax

    n = normals / np.linalg.norm(normals, axis=-1, keepdims=True)
    helper = np.where(
        np.abs(n[:, 1:2]) < 0.9,
        np.tile(np.array([[0.0, 1.0, 0.0]]), (len(n), 1)),
        np.tile(np.array([[1.0, 0.0, 0.0]]), (len(n), 1)),
    )
    t1 = np.cross(helper, n)
    t1 /= np.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = np.cross(n, t1)
    spin = rng.uniform(0.0, 2 * np.pi, size=len(n))
    c, s = np.cos(spin)[:, None], np.sin(spin)[:, None]
    u, v = c * t1 + s * t2, -s * t1 + c * t2
    rots = np.stack([u, v, n], axis=-1)  # columns: local x,y,z in world
    return np.asarray(jax.vmap(lie.rotmat_to_quat)(jnp.asarray(rots)))


def _fibonacci_sphere(count: int, radius: float, center: np.ndarray):
    i = np.arange(count, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / count)
    theta = np.pi * (1.0 + 5**0.5) * i
    n = np.stack(
        [np.sin(phi) * np.cos(theta), np.cos(phi), np.sin(phi) * np.sin(theta)],
        axis=-1,
    )
    return center + radius * n, n


def structured_cloud(
    rng: np.random.Generator,
    n: int,
    extent: float = 2.2,
    hdr_max: float = 3.0,
    detail: float = 0.35,
    brightness: float = 2.0,
) -> GaussianCloud:
    """Piecewise-smooth structured scene: a 'room' of textured surfaces
    (ground plane, wide back wall, spheres resting on the ground) tiled
    with tangent-oriented surfel Gaussians whose radiance follows smooth
    procedural fields, plus an emissive HDR window patch on the wall.

    Exists because PSNR against `random_cloud` confetti is adversarial
    (VERDICT r2 Missing #4): i.i.d. pixel-scale noise has no recoverable
    structure, so no fit can score well and motion blur destroys nothing
    that training could restore.  Here blur destroys texture edges that a
    correct joint model CAN recover — the quality contract
    (Readme.md:44,54 'superior rendering quality', 'sharpen the train
    images') becomes measurable.

    Geometry is sized for the default orbit rig (radius-4 camera looking
    at the origin): ground at y=-0.9, back wall at z=+1.8 spanning the
    view across an orbit of +-0.6 rad.
    """
    ground_y, wall_z = -0.9, 0.82 * extent
    wall_w, wall_h = 3.0 * extent, 1.6 * extent
    ground_half = 1.6 * extent
    sphere_specs = [  # (center_x, center_z, radius)
        (-0.95, 0.25, 0.55),
        (0.85, -0.15, 0.45),
        (0.05, 0.95, 0.65),
        (-0.15, -0.85, 0.30),
    ]
    # weight: splat-count allocation bias (foreground surfaces get finer
    # texture; the grazing-angle ground needs less).
    surfaces = [
        {"kind": "plane", "area": (2 * ground_half) ** 2, "weight": 0.6,
         "origin": np.array([-ground_half, ground_y, -ground_half]),
         "u": np.array([2 * ground_half, 0.0, 0.0]),
         "v": np.array([0.0, 0.0, 2 * ground_half]),
         "normal": np.array([0.0, 1.0, 0.0]),
         "albedo": np.array([0.55, 0.45, 0.35])},
        {"kind": "plane", "area": wall_w * wall_h, "weight": 1.2,
         "origin": np.array([-wall_w / 2, ground_y, wall_z]),
         "u": np.array([wall_w, 0.0, 0.0]),
         "v": np.array([0.0, wall_h, 0.0]),
         "normal": np.array([0.0, 0.0, -1.0]),
         "albedo": np.array([0.45, 0.50, 0.62])},
    ]
    palette = [
        np.array([0.80, 0.30, 0.25]),
        np.array([0.25, 0.55, 0.30]),
        np.array([0.85, 0.70, 0.25]),
        np.array([0.35, 0.35, 0.80]),
    ]
    for (sx, sz, r), alb in zip(sphere_specs, palette):
        surfaces.append(
            {"kind": "sphere", "area": 4 * np.pi * r * r, "weight": 2.0,
             "center": np.array([sx, ground_y + r, sz]), "radius": r,
             "albedo": alb}
        )
    total_w = sum(s["area"] * s["weight"] for s in surfaces)
    pts_all, nrm_all, col_all, scale_all = [], [], [], []
    for s in surfaces:
        cnt = max(16, int(round(n * s["area"] * s["weight"] / total_w)))
        spacing = float(np.sqrt(s["area"] / cnt))
        if s["kind"] == "plane":
            lu = np.linalg.norm(s["u"])
            lv = np.linalg.norm(s["v"])
            nu = max(2, int(round(np.sqrt(cnt * lu / lv))))
            nv = max(2, int(np.ceil(cnt / nu)))
            gu, gv = np.meshgrid(
                (np.arange(nu) + 0.5) / nu, (np.arange(nv) + 0.5) / nv
            )
            uv = np.stack([gu.ravel(), gv.ravel()], axis=-1)[:cnt]
            uv += rng.uniform(-0.4, 0.4, uv.shape) / np.array([nu, nv])
            pts = s["origin"] + uv[:, :1] * s["u"] + uv[:, 1:] * s["v"]
            nrm = np.tile(s["normal"], (len(pts), 1))
        else:
            pts, nrm = _fibonacci_sphere(cnt, s["radius"], s["center"])
            jitter = rng.normal(size=pts.shape) * (0.15 * spacing)
            jitter -= (jitter * nrm).sum(-1, keepdims=True) * nrm  # tangent only
            pts = pts + jitter
        # Radiance: smooth low-frequency shading x mid-frequency texture
        # detail (the structure blur destroys and deblurring restores).
        shade = 0.72 + 0.30 * _smooth_field(rng, pts, n_waves=5, freq=(1.5, 6.0))
        tex = 1.0 + detail * _smooth_field(rng, pts, n_waves=8, freq=(12.0, 40.0))
        tint = 1.0 + 0.18 * np.stack(
            [_smooth_field(rng, pts, n_waves=3, freq=(2.0, 8.0)) for _ in range(3)],
            axis=-1,
        )
        col = brightness * s["albedo"] * (shade * tex)[:, None] * tint
        tang = spacing * 0.62 * rng.uniform(0.8, 1.25, size=(len(pts), 1))
        scale = np.concatenate(
            [np.tile(tang, (1, 2)), 0.10 * tang], axis=-1
        )
        pts_all.append(pts)
        nrm_all.append(nrm)
        col_all.append(col)
        scale_all.append(scale)
    pts = np.concatenate(pts_all).astype(np.float32)
    nrm = np.concatenate(nrm_all).astype(np.float32)
    col = np.concatenate(col_all).astype(np.float32)
    scales = np.concatenate(scale_all).astype(np.float32)
    # Emissive HDR window on the back wall (teaser.png c.1 content): a
    # bright patch whose radiance exceeds the LDR clip at long exposures
    # but reads unsaturated at short ones — the CRF/exposure chain sees
    # both regimes.
    win = (
        (np.abs(pts[:, 2] - wall_z) < 1e-3)
        & (pts[:, 0] > 0.45) & (pts[:, 0] < 1.45)
        & (pts[:, 1] > 0.35) & (pts[:, 1] < 1.25)
    )
    col[win] = np.array([1.0, 0.93, 0.78], np.float32) * hdr_max
    quats = _tangent_quats(nrm, rng).astype(np.float32)
    opac = rng.uniform(0.82, 0.97, size=len(pts)).astype(np.float32)
    return GaussianCloud(
        means3d=jnp.asarray(pts),
        quats=jnp.asarray(quats),
        scales=jnp.asarray(np.maximum(scales, 1e-4)),
        opacities=jnp.asarray(opac),
        colors=jnp.asarray(np.maximum(col, 0.0)),
    )


def cached_casual_video(cache_dir: str, seed: int, **kw) -> SyntheticVideo:
    """make_casual_video memoized to an .npz keyed by (seed, kwargs).

    GT generation at spec costs minutes of chip time and is repeated on
    every quality-run resume and probe launch; the fixture is a pure
    function of (seed, kwargs), so cache it.  raster_cfg only influences
    HOW the GT is rendered (it must be drop-free either way), so it is
    excluded from the key."""
    import hashlib
    import json as json_mod
    import os

    key_src = {k: repr(v) for k, v in sorted(kw.items()) if k != "raster_cfg"}
    key_src["seed"] = seed
    key = hashlib.sha256(
        json_mod.dumps(key_src, sort_keys=True).encode()
    ).hexdigest()[:16]
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"video_{key}.npz")
    cam_fields = ("fx", "fy", "cx", "cy", "width", "height")
    if os.path.exists(path):
        z = np.load(path)
        cam = Camera.make(
            jnp.asarray(z["cam_viewmat"]), float(z["fx"]), float(z["fy"]),
            float(z["cx"]), float(z["cy"]), int(z["width"]), int(z["height"]),
        )
        cloud = GaussianCloud(*[
            jnp.asarray(z[f"cloud_{f}"]) for f in GaussianCloud._fields
        ])
        return SyntheticVideo(
            cloud=cloud,
            images=jnp.asarray(z["images"]),
            sharp_hdr=jnp.asarray(z["sharp_hdr"]),
            sharp_ldr=jnp.asarray(z["sharp_ldr"]),
            timestamps=jnp.asarray(z["timestamps"]),
            exposures=jnp.asarray(z["exposures"]),
            knots=jnp.asarray(z["knots"]),
            knot_t0=float(z["knot_t0"]),
            knot_dt=float(z["knot_dt"]),
            camera=cam,
        )
    rng = np.random.default_rng(seed)
    video = make_casual_video(rng, **kw)
    cam = video.camera
    np.savez_compressed(
        path,
        **{f"cloud_{f}": np.asarray(getattr(video.cloud, f))
           for f in GaussianCloud._fields},
        images=np.asarray(video.images),
        sharp_hdr=np.asarray(video.sharp_hdr),
        sharp_ldr=np.asarray(video.sharp_ldr),
        timestamps=np.asarray(video.timestamps),
        exposures=np.asarray(video.exposures),
        knots=np.asarray(video.knots),
        knot_t0=np.asarray(video.knot_t0),
        knot_dt=np.asarray(video.knot_dt),
        cam_viewmat=np.asarray(cam.viewmat),
        **{f: np.asarray(getattr(cam, f)) for f in cam_fields},
    )
    return video


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
    cloud_kind: str = "random",
    shake_rot: float = 0.0,
    shake_trans: float = 0.0,
    knots_per_frame: int = 1,
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

    if cloud_kind == "structured":
        # Piecewise-smooth scene (the winnable quality fixture); splat
        # sizes come from surface tiling density, not scale_range.
        cloud = structured_cloud(rng, n_gaussians, extent=extent, hdr_max=hdr_max)
    else:
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
    if knots_per_frame > 1:
        # Dense sub-frame GT knots straight from the analytic orbit (no
        # resampling error), on the SAME grid build_scene constructs for
        # cfg.model.knots_per_frame — pose-recovery metrics then compare
        # knot-for-knot.
        times, t0, dt = spline.dense_grid(n_frames, knots_per_frame, pad=2)
        ang = (
            -angle_span / 2
            + angle_span * np.clip(np.asarray(times), 0, n_frames - 1)
            / max(n_frames - 1, 1)
        )
        knots = jnp.stack(
            [
                orbit_camera(a, width=size, img_height=size).viewmat
                for a in ang
            ]
        )
    else:
        knots, t0, dt = spline.knots_for_frames(poses, pad=2)
    if shake_rot > 0.0 or shake_trans > 0.0:
        # Handheld shake: per-knot SE(3) jitter LEFT-composed onto the
        # world->cam knot (exp(xi) @ knot) — a perturbation in the CAMERA
        # frame: the orientation wobbles by omega (screen streak ~ focal *
        # |omega|) and the camera center drifts by ~|v|, independent of
        # the orbit radius.  (Right-composition would perturb in the WORLD
        # frame: rotation about the world origin swings the camera center
        # by |omega| * radius — a rig on a crane arm, not a shaky hand.)
        # A look-at orbit alone pivots about the scene center, so central
        # content never blurs; camera-frame rotation blurs the whole
        # frame, like real casual footage.
        m = int(knots.shape[0])
        xi = np.concatenate(
            [rng.normal(0.0, max(shake_rot, 1e-12), (m, 3)),
             rng.normal(0.0, max(shake_trans, 1e-12), (m, 3))], axis=-1,
        ).astype(np.float32)
        knots = lie.mat_mul(lie.se3_exp_batch(jnp.asarray(xi)), knots)

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
