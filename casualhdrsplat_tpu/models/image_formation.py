"""The CasualHDRSplat unified image-formation model (SURVEY.md L4, §0.2).

Implements the behavioral contract transcribed from pipeline.png:

    T(t)   = spline(knots; t)                       continuous camera motion
    H_k    = Rasterize(G_theta, T(t_k))             virtual sharp HDR images
    I_k    = F_theta(H_k * dt_i)                    shared CRF -> sharp LDRs
    B_i    = (1/n) sum_k I_k                        estimated blurred frame

All n virtual views render in ONE rasterizer call (views batch along the
tile axis — SURVEY.md P4), so a training step is a single jitted graph:
no per-virtual-view Python loop, no host round trips.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from casualhdrsplat_tpu.config import ModelConfig
from casualhdrsplat_tpu.geometry import lie, spline
from casualhdrsplat_tpu.models import crf as crf_mod
from casualhdrsplat_tpu.models import gaussians as gauss_mod
from casualhdrsplat_tpu.ops import rasterize as rast_mod

Params = Dict[str, object]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """Non-learnable scene context (pytree of arrays + static ints)."""

    base_knots: jnp.ndarray  # [M,4,4] from SfM poses
    knot_t0: jnp.ndarray  # scalar
    knot_dt: jnp.ndarray  # scalar
    timestamps: jnp.ndarray  # [F] frame start times
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))


def build_scene(dataset, cfg: ModelConfig) -> SceneStatic:
    """SceneStatic from a data.dataset.Dataset: spline knots initialized
    from the per-frame SfM poses (SURVEY.md §3.5 dataparser contract)."""
    poses = jnp.asarray(dataset.viewmats)
    knots, t0, dt = spline.knots_for_frames(poses, pad=2)
    if cfg.knots_per_frame > 1:
        # sub-frame control points: resample the frame-rate init onto the
        # dense grid (spline.dense_grid) so fast within-exposure motion is
        # representable; the optimizer refines every dense knot.
        knots, t0, dt = spline.resample_knots(
            knots, t0, dt, poses.shape[0], cfg.knots_per_frame,
            mode=cfg.spline_mode,
        )
    ts = jnp.asarray(dataset.timestamps)
    # knots_for_frames assumes unit frame spacing starting at 0; rescale
    # the knot clock to the dataset's timestamps.
    t_start = ts[0]
    t_step = jnp.where(ts.shape[0] > 1, (ts[-1] - ts[0]) / max(ts.shape[0] - 1, 1), 1.0)
    return SceneStatic(
        base_knots=knots,
        knot_t0=t_start + t0 * t_step,
        knot_dt=t_step * jnp.asarray(dt),
        timestamps=ts,
        fx=jnp.asarray(dataset.fx, jnp.float32),
        fy=jnp.asarray(dataset.fy, jnp.float32),
        cx=jnp.asarray(dataset.cx, jnp.float32),
        cy=jnp.asarray(dataset.cy, jnp.float32),
        width=dataset.width,
        height=dataset.height,
    )


def init_params(
    scene: SceneStatic,
    points_xyz,
    points_rgb,
    cfg: ModelConfig,
    rng_key: Optional[jax.Array] = None,
) -> Params:
    """The full learnable pytree: G_theta, knot deltas, log dt_i, F_theta."""
    num_frames = scene.timestamps.shape[0]
    num_knots = scene.base_knots.shape[0]
    if cfg.exposure_init_frac > 0.0 and num_frames > 1:
        med_dt = jnp.median(jnp.diff(scene.timestamps))
        log_e0 = jnp.log(cfg.exposure_init_frac * med_dt)
    else:
        log_e0 = jnp.asarray(0.0)
    return {
        "gaussians": gauss_mod.create(
            points_xyz, points_rgb, cfg.max_gaussians, cfg.sh_degree
        ),
        "knot_deltas": jnp.zeros((num_knots, 6), jnp.float32),
        "log_exposures": jnp.full((num_frames,), log_e0, jnp.float32),
        "crf": crf_mod.create(cfg.crf, rng_key),
    }


def effective_knots(params: Params, scene: SceneStatic) -> jnp.ndarray:
    """knot_j = exp(delta_j) @ base_j: pose optimization as Lie-algebra
    deltas composed onto fixed SfM initializations (SURVEY.md C12, the
    idiomatic JAX replacement for pypose manifold Adam).

    LEFT-multiplication (camera-frame deltas) is load-bearing, not a
    convention nicety.  base_j is world-to-camera, so a RIGHT-multiplied
    delta perturbs in the WORLD frame: its rotation entries rotate the
    camera about the WORLD ORIGIN, moving the camera center with a lever
    arm of the whole scene distance — orientation and position entangle
    at ~2 units/radian, and Adam's per-coordinate scaling cannot separate
    them (measured, r04 probes: translation ATE grew 0.085 -> 0.23 with
    the translation halves of the updates FROZEN at zero).  Camera-frame
    deltas decouple: rotation spins the camera in place, translation
    moves it in camera axes — the same parametrization the test-time
    aligner (train/pose_align.py) always used."""
    return lie.mat_mul(
        lie.se3_exp_batch(params["knot_deltas"]), scene.base_knots
    )


def poses_at(params: Params, scene: SceneStatic, times: jnp.ndarray, cfg: ModelConfig):
    return spline.interpolate(
        effective_knots(params, scene), scene.knot_t0, scene.knot_dt, times,
        mode=cfg.spline_mode,
    )


def exposure_of(params: Params, frame_id) -> jnp.ndarray:
    return jnp.exp(params["log_exposures"][frame_id])


def shared_binning_demand(
    params: Params, scene: SceneStatic, frame_id, cfg: ModelConfig
):
    """Binning-pressure probe for one frame (host-side, jittable body):
    returns (shared_demand, max_per_view_demand, stream_budget) in
    intersection rows.

    shared_demand uses the shared-binning reference position + Chebyshev-
    inflated radii (exactly the footprint _rasterize_packed_shared bins);
    when within-exposure motion is large the inflation multiplies demand
    past the budget and HALF the scene can silently waterfill away (run 6
    failure, outputs/quality/README.md) — the trainer compares these
    numbers at startup and falls back to per-view binning loudly."""
    from casualhdrsplat_tpu.ops import binning
    from casualhdrsplat_tpu.ops.projection import cull_invisible, project_gaussians

    r = cfg.rasterize
    n_virt = cfg.num_virtual_views
    t_i = scene.timestamps[frame_id]
    dt = exposure_of(params, frame_id)
    t_k = spline.sample_virtual_times(t_i, dt, n_virt)
    viewmats = poses_at(params, scene, t_k, cfg)
    act = gauss_mod.activate(params["gaussians"])

    def project_view(vm):
        proj = project_gaussians(
            act.means3d, act.quats, act.scales, vm, scene.fx, scene.fy,
            scene.cx, scene.cy, scene.width, scene.height,
            near_plane=r.near_plane, antialias=r.antialias,
        )
        return cull_invisible(proj, act.opacities)

    projs = jax.vmap(project_view)(viewmats)
    validf = projs.valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(validf, axis=0), 1.0)
    ref_m2d = jnp.sum(projs.means2d * validf[..., None], axis=0) / denom[:, None]
    cheb = jnp.max(jnp.abs(projs.means2d - ref_m2d[None]), axis=-1)
    r_shared = jnp.max(jnp.where(projs.valid, cheb + projs.radii, 0.0), axis=0)
    valid_any = jnp.any(projs.valid, axis=0)

    args = (scene.width, scene.height, r.tile_h, r.tile_w,
            r.max_tiles_per_gaussian)
    shared = binning.tile_demand(ref_m2d, r_shared, valid_any, *args)
    per_view = jax.vmap(
        lambda m2d, rad, val: binning.tile_demand(m2d, rad, val, *args)
    )(projs.means2d, projs.radii, projs.valid)
    n = act.means3d.shape[0]
    budget = min(n * r.max_tiles_per_gaussian, r.stream_factor * n)
    return shared, jnp.max(per_view), jnp.asarray(budget, jnp.int32)


class FrameRender(NamedTuple):
    blurred_ldr: jnp.ndarray  # [H,W,3] B_i — compare with captured frame
    sharp_ldr: jnp.ndarray  # [n,H,W,3] I_k virtual sharp LDR images
    sharp_hdr: jnp.ndarray  # [n,H,W,3] H_k virtual sharp HDR images
    alphas: jnp.ndarray  # [n,H,W]
    aux: rast_mod.RasterizeAux


def render_frame(
    params: Params,
    scene: SceneStatic,
    frame_id,
    cfg: ModelConfig,
    num_virtual: Optional[int] = None,
    sh_degree: Optional[int] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
) -> FrameRender:
    """Render the estimated blurred auto-exposed frame B_i plus all
    intermediate virtual images (SURVEY.md §3.2: one pure jittable
    function of (G_theta, T_j, dt_i, F_theta, frame_id))."""
    n = num_virtual or cfg.num_virtual_views
    deg = cfg.sh_degree if sh_degree is None else sh_degree
    t_i = scene.timestamps[frame_id]
    dt = exposure_of(params, frame_id)
    if cfg.optimize_poses:
        t_k = spline.sample_virtual_times(t_i, dt, n)
        viewmats = poses_at(params, scene, t_k, cfg)  # [n,4,4]
    else:
        # static rig: all virtual views share the frame's base pose
        viewmats = jnp.tile(
            poses_at(params, scene, jnp.array([t_i]), cfg), (n, 1, 1)
        )

    act = gauss_mod.activate(params["gaussians"])
    camtoworlds = jax.vmap(lie.se3_inverse)(viewmats)
    if cfg.sh_shared_view:
        # One SH eval at the window's middle view, shared by every
        # virtual view (dirs vary little inside one exposure window —
        # see ModelConfig.sh_shared_view).
        mid = gauss_mod.colors_for_view(act, camtoworlds[n // 2], deg)
        colors = jnp.broadcast_to(mid[None], (n,) + mid.shape)  # [n,N,3]
    else:
        # View-dependent radiance per virtual view (dirs vary along the
        # spline).
        colors = jax.vmap(
            lambda c2w: gauss_mod.colors_for_view(act, c2w, deg)
        )(camtoworlds)  # [n,N,3]

    hdr, alphas, aux = rast_mod.rasterize(
        act.means3d,
        act.quats,
        act.scales,
        act.opacities,
        colors,
        viewmats,
        scene.fx,
        scene.fy,
        scene.cx,
        scene.cy,
        scene.width,
        scene.height,
        cfg.rasterize,
        background=jnp.ones((3,)) if cfg.white_background else None,
        means2d_offset=means2d_offset,
    )
    ldr = crf_mod.apply(params["crf"], hdr * dt, cfg.crf)  # [n,H,W,3]
    blurred = jnp.mean(ldr, axis=0)
    return FrameRender(
        blurred_ldr=blurred, sharp_ldr=ldr, sharp_hdr=hdr, alphas=alphas, aux=aux
    )


def render_pose(
    params: Params,
    scene: SceneStatic,
    viewmat: jnp.ndarray,
    cfg: ModelConfig,
    exposure: Optional[jnp.ndarray] = None,
    hdr_output: bool = False,
    depth_output: bool = False,
    sh_degree: Optional[int] = None,
):
    """Eval-time rendering from an arbitrary pose (SURVEY.md §3.4 / C20):
    novel-view LDR (CRF applied at `exposure`), novel-view HDR (linear
    radiance, CRF skipped), expected-depth maps (`depth_output`), and —
    by sweeping `exposure` — HDR exposure editing (teaser.png c.1)."""
    deg = cfg.sh_degree if sh_degree is None else sh_degree
    act = gauss_mod.activate(params["gaussians"])
    if depth_output:
        # alpha-composited expected depth: per-Gaussian camera-space z as
        # the "radiance"; normalize by alpha outside
        z = jnp.sum(act.means3d * viewmat[2, :3], axis=-1) + viewmat[2, 3]
        colors = jnp.tile(jnp.maximum(z, 0.0)[:, None], (1, 3))
    else:
        colors = gauss_mod.colors_for_view(act, lie.se3_inverse(viewmat), deg)
    hdr, alphas, aux = rast_mod.rasterize(
        act.means3d, act.quats, act.scales, act.opacities, colors[None],
        viewmat[None], scene.fx, scene.fy, scene.cx, scene.cy,
        scene.width, scene.height, cfg.rasterize,
        background=jnp.ones((3,))
        if (cfg.white_background and not depth_output)
        else None,
    )
    if depth_output:
        depth = hdr[0, :, :, 0] / jnp.maximum(alphas[0], 1e-6)
        return depth, alphas[0], aux
    if hdr_output:
        return hdr[0], alphas[0], aux
    dt = exposure if exposure is not None else jnp.asarray(1.0)
    ldr = crf_mod.apply(params["crf"], hdr[0] * dt, cfg.crf)
    return ldr, alphas[0], aux


def render_deblurred(
    params: Params,
    scene: SceneStatic,
    frame_id,
    cfg: ModelConfig,
    hdr_output=False,
    sh_degree: Optional[int] = None,
    exposure: Optional[jnp.ndarray] = None,
):
    """Deblur a training frame (teaser.png c.2): single sharp render at the
    mid-exposure pose, tone-mapped once — no blur average.

    `exposure` overrides the frame's learned exposure — used by the
    held-out novel-view evaluation, where the frame's own log_exposures
    entry never received gradients and the honest estimate is an
    interpolation of neighboring TRAIN frames (SURVEY.md §6 headline
    metric; VERDICT r2 Weak #5)."""
    dt = exposure_of(params, frame_id) if exposure is None else exposure
    t_mid = scene.timestamps[frame_id] + 0.5 * dt
    viewmat = poses_at(params, scene, jnp.array([t_mid]), cfg)[0]
    return render_pose(
        params, scene, viewmat, cfg,
        exposure=dt, hdr_output=hdr_output,
        sh_degree=sh_degree,
    )


def interpolated_log_exposure(
    params: Params, timestamps, train_indices, frame_id: int
) -> float:
    """Host-side: log-exposure estimate for a held-out frame by linear
    interpolation (in time) of the nearest surrounding train frames'
    LEARNED log exposures (clamped at the ends)."""
    import numpy as np

    ts = np.asarray(timestamps)
    le = np.asarray(params["log_exposures"])
    tr = np.asarray(sorted(train_indices))
    t = float(ts[frame_id])
    return float(np.interp(t, ts[tr], le[tr]))
