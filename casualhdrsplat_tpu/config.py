"""Experiment configuration (SURVEY.md C23, §5.6).

Reference lineage uses tyro-annotated nested dataclasses; here a plain
dataclass tree with dotted-path CLI overrides (no external deps).  The five
BASELINE.json config-ladder presets ship as `PRESETS`.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RasterizeConfig:
    tile_h: int = 16
    tile_w: int = 128
    # Per-tile Gaussian list capacity (fixed shape; overflow is truncated
    # in far-depth order and reported via aux counters).
    tile_capacity: int = 1024
    # Max tiles a single Gaussian may be binned into (cap on bbox area).
    max_tiles_per_gaussian: int = 32
    # Gaussians processed per inner chunk in the Pallas kernel.
    chunk: int = 128
    # Packed streaming compositor (zero-waste chunk stream) vs the dense
    # [tiles, capacity] table; packed requires the pallas backend.
    packed: bool = True
    # Stream budget = stream_factor * N intersection slots per view; the
    # depth-sorted stream is truncated (and reported) beyond it.
    stream_factor: int = 6
    near_plane: float = 0.05  # SURVEY.md hyperparameter defaults
    alpha_clip: float = 0.99
    alpha_threshold: float = 1.0 / 255.0
    # Kernels may stop compositing a tile once every pixel's transmittance
    # is below this (the oracle has no early stop; CLAUDE.md invariant).
    transmittance_eps: float = 1e-4
    # gsplat-style antialiased mode: opacity compensated by
    # sqrt(det(cov2d)/det(cov2d + blur)) (ops/projection.py).
    antialias: bool = False
    # Bin/sort ONCE per frame (reference pose = per-Gaussian mean across
    # the virtual views, radii inflated by the max screen motion) instead
    # of once per virtual view.  Tile assignment stays a superset of every
    # view's footprint, so the composite is exact up to depth-ORDER ties
    # between views (virtual views sit within one exposure window, so
    # inversions are rare and sub-pixel).  Packed path only.  Default ON:
    # 2.5x faster fwd+bwd at bench scale (370 -> 147 ms for 800^2 x 4
    # views x 100k); tests/test_rasterize_packed.py pins it near-allclose
    # to exact per-view binning.  Set False for oracle-exact binning.
    shared_binning: bool = True
    backend: str = "auto"  # "pallas" | "oracle" | "auto"
    # In-chunk transmittance prefix implementation inside the Pallas
    # kernels: "cumsum" = log-depth VPU scan (pltpu.roll ladder —
    # jnp.cumsum has no Mosaic lowering); "matmul" = triangular
    # (G,G)@(G,P) fp32 MXU matmuls.  Identical up to summation order
    # (interpret-pinned allclose; on-chip cross-check ≤3e-7 relative on
    # fwd AND grads, r05) and the scan is faster: bench 18.4 vs 17.1
    # Mpix/s.  The XLA/oracle path always uses cumsum.
    prefix: str = "cumsum"


@dataclass
class CRFConfig:
    """The mixture-of-sigmoids CRF is monotone BY CONSTRUCTION (models/
    crf.py), so there is no monotonicity knob; its smoothness prior weight
    lives in LossConfig.crf_smoothness_weight."""

    kind: str = "mlp"  # "identity" | "gamma" | "mlp"
    hidden: int = 32  # sigmoid units per channel
    gamma: float = 2.2
    # Initialize the learnable mixture NEAR a gamma curve (sRGB-like —
    # the universal camera-encoding prior) by a short pre-fit at create().
    # 0 keeps the legacy clip(E)-shaped init.  Round-3 probe finding: the
    # CRF's shape CANNOT be absorbed by scene radiance once exposures
    # vary per frame, and in-train CRF learning from the clip-init stalls
    # the joint fit; starting near the true curve family removes the
    # co-adaptation trap.
    init_gamma: float = 2.2
    # Log-exposure normalization range fed to the MLP.
    log_min: float = -10.0
    log_max: float = 4.0


@dataclass
class ModelConfig:
    max_gaussians: int = 1 << 17
    sh_degree: int = 3
    # Number of virtual sharp images averaged into one blurred frame.
    num_virtual_views: int = 8
    spline_mode: str = "cubic"  # "linear" | "cubic"
    # Initial exposure estimate as a FRACTION of the median frame
    # interval: log_exposures init to log(frac * median dt) when > 0
    # (0 keeps the legacy init of log dt = 0, i.e. a full frame
    # interval).  The exposure time is not a pure gauge: it also spans
    # the BLUR WINDOW on the trajectory, so starting it near a plausible
    # shutter (~0.5x the frame interval for casual auto-exposure video)
    # matters — a window several times too long renders blur the scene
    # cannot explain and the joint fit stalls (round-3 probe finding).
    exposure_init_frac: float = 0.0
    # Trajectory control points per frame interval.  1 = the classic
    # knot-per-frame grid (knots_for_frames).  >1 = sub-frame control
    # points (spline.dense_grid / resample_knots): required to REPRESENT
    # fast handheld shake whose period is shorter than the frame interval
    # — with one knot per frame the cubic basis low-passes within-exposure
    # motion to a fraction of the inter-frame delta.
    knots_per_frame: int = 1
    # Evaluate view-dependent SH radiance ONCE at the exposure window's
    # middle virtual view and share it across all virtual views, instead
    # of per-view.  Same approximation class as shared_binning: viewing
    # directions change little inside one exposure window, while per-view
    # SH costs n_virtual x N x 16-coeff evaluations per step (a measured
    # contributor to the train-step vs bench throughput gap).  Exact for
    # sh_degree 0; render_pose/render_deblurred (eval paths) are
    # unaffected — they already evaluate SH at their single query pose.
    sh_shared_view: bool = False
    optimize_poses: bool = True
    optimize_exposure: bool = True
    white_background: bool = False
    crf: CRFConfig = field(default_factory=CRFConfig)
    rasterize: RasterizeConfig = field(default_factory=RasterizeConfig)


@dataclass
class DensifyConfig:
    enabled: bool = True
    start_iter: int = 500
    stop_iter: int = 15_000
    interval: int = 100
    grad_threshold: float = 0.0002
    # World-space scale above which a high-grad Gaussian splits vs clones.
    split_scale_threshold_rel: float = 0.01  # relative to scene extent
    split_factor: float = 1.6
    prune_opacity: float = 0.005
    prune_screen_radius: float = 0.15  # fraction of image diagonal
    # Step from which the max-screen-radius prune activates; 0 = lineage
    # default (only after the first opacity reset).  Set explicitly for
    # runs that disable opacity resets — otherwise oversized splats are
    # never pruned and binning demand grows unbounded.
    screen_prune_from: int = 0
    opacity_reset_interval: int = 3000
    sh_degree_interval: int = 1000
    # Sharded runs only: when per-shard alive counts diverge by more than
    # this fraction of the per-shard block after an ADC round, repack the
    # store evenly across shards (train/densify.rebalance_store, SURVEY
    # §5.8 densification resharding).  0 disables.
    rebalance_threshold: float = 0.25


@dataclass
class OptimConfig:
    means_lr_init: float = 1.6e-4
    means_lr_final: float = 1.6e-6
    scales_lr: float = 5e-3
    quats_lr: float = 1e-3
    opacities_lr: float = 5e-2
    sh_dc_lr: float = 2.5e-3
    sh_rest_lr_div: float = 20.0
    pose_lr_init: float = 1e-3
    pose_lr_final: float = 1e-5
    # Steps with pose lr = 0 before the exp-decay schedule engages: lets
    # the scene stabilize before knots move (joint pose+scene training
    # from a cold scene drives translation knots into a bad basin —
    # VERDICT r2 Missing #2).  The decay schedule is compressed into the
    # remaining max_steps - warmup steps.
    pose_warmup_steps: int = 0
    # Multiplier on the TRANSLATION half of every knot-delta update.
    # Rotation-dominated blur makes camera translation weakly observable;
    # running translation slower than rotation keeps the weakly
    # constrained direction from wandering.
    pose_trans_lr_scale: float = 1.0
    # NOTE (round 5): the staged scene-lr damping (stage_pose_until) and
    # the alternating block-coordinate stage (alt_period) were REMOVED —
    # the former was measured not to help once the camera-frame pose
    # parametrization landed (r04_cf_b1zero_staged.log: gain −0.03 vs
    # +0.85 bare at equal budget), the latter shipped the same day that
    # fix made it moot and never earned a probe (VERDICT r4 Weak #6;
    # docs/JOINT_RECOVERY.md "What did NOT work").
    # Adam beta1 for the pose group.  Knot gradients are SPARSE (one
    # random frame per step touches ~one spline support), but Adam keeps
    # applying the momentum of the last sampled gradient to every knot at
    # every step — between visits a knot takes ~1/(1-b1) extra lr-sized
    # steps in a stale direction.  b1=0 makes unsampled knots hold still
    # (their grads are exactly zero).
    pose_b1: float = 0.9
    # Restart the pose exp-decay clock at this step (0 = off).  Use with
    # the multi-resolution curriculum: promotion to full resolution is
    # when the pose gradient first sees fine detail, but the stock decay
    # has already cooled the pose lr ~2x by then (r04 step-2000 eval: rot
    # error flat at 2.13 deg with the schedule down 10x under the
    # pre-floor decay).  Re-warming evaluates the same schedule as if
    # the warmup had just ended: full pose_lr_init at the rewarm
    # boundary, then the SAME decay law shifted in time — the time
    # constant stays (max_steps - pose_warmup_steps), so a run that
    # rewarms at step B ends at base_sched(max_steps - B + warmup),
    # ABOVE pose_lr_final (intentional: late-arriving detail deserves
    # the same cooling rate, not a steeper one).  Must be >
    # pose_warmup_steps (make_optimizer raises otherwise).
    pose_lr_rewarm_step: int = 0
    exposure_lr: float = 1e-3
    # Adam beta1 for the per-frame exposure group.  log_exposures has the
    # SAME sparse-gradient structure as the knots (each step renders one
    # random frame, so exactly one Δt entry sees a nonzero gradient) and
    # therefore the same stale-momentum random walk pose_b1 fixes: at
    # b1=0.9 every unsampled frame's exposure keeps moving ~1/(1-b1)
    # lr-sized steps in the direction of its LAST visit.  Measured on the
    # 320² heavy-blur quality probe (r05): exp_err_mean ROSE 0.21→0.28
    # over 2k steps with b1=0.9.  b1=0 makes unsampled exposures hold
    # still (their grads are exactly zero).
    exposure_b1: float = 0.9
    # Measured (supervised gamma-2.2 recovery, 6k Adam steps, h=32):
    # lr 1e-3 stalls at rmse 0.049 — a ~22 dB reconstruction ceiling for
    # the whole pipeline; 5e-3 reaches 0.0015.  The softplus-reparam
    # mixture weights start near zero, so the CRF needs a hotter lr than
    # the other scalar groups (tests/test_crf.py pins this).
    crf_lr: float = 5e-3
    max_steps: int = 30_000


@dataclass
class LossConfig:
    ssim_lambda: float = 0.2
    exposure_prior_weight: float = 1e-3
    crf_smoothness_weight: float = 1e-3
    # Cross-channel variance penalty on the CRF curve — pins the
    # chromatic gauge (CRF tint vs splat-color tint); see
    # crf.chroma_prior.
    crf_chroma_weight: float = 1e-2
    # Coarse-to-fine: blur render AND target with a Gaussian whose sigma
    # anneals coarse_sigma0 -> 0 px over the first coarse_to_fine_steps
    # steps (losses.gaussian_blur; traced sigma, zero recompiles).
    # Widens the pose-alignment basin when the trajectory init is many
    # pixels off (handheld shake); 0 disables.
    coarse_to_fine_steps: int = 0
    coarse_sigma0: float = 8.0
    # L2 anchor on the knot deltas (VERDICT r3 next-step 1c): the joint
    # problem admits a scene/spline CO-WARP that photometric loss cannot
    # see (round-3 probes: Umeyama-aligned translation error grew 5x while
    # loss fell).  Penalizing mean ||delta||^2 pins the trajectory to its
    # SfM init — the deviation a correct fit needs (handheld shake, a few
    # 0.01 rad / world units per knot) costs little; a runaway warp costs
    # a lot.  0 disables.
    pose_anchor_weight: float = 0.0


@dataclass
class ParallelConfig:
    # Mesh axis sizes; (1, 1) = single chip.  data: virtual views / tiles,
    # gauss: Gaussian-store model parallelism.
    data: int = 1
    gauss: int = 1


@dataclass
class DataConfig:
    source: str = "synthetic"  # "synthetic" | "colmap" | "video"
    path: str = ""
    downscale: int = 1
    eval_every: int = 8  # every k-th frame held out
    # (round 5) incremental_frame_steps — the growing-prefix frame
    # curriculum — was removed unprobed: it shipped the same day the
    # camera-frame pose fix addressed the divergence it targeted, and
    # never earned a probe log (VERDICT r4 Weak #6).


@dataclass
class TrainConfig:
    name: str = "casual-hdr-splat"
    seed: int = 0
    model: ModelConfig = field(default_factory=ModelConfig)
    densify: DensifyConfig = field(default_factory=DensifyConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    log_every: int = 100
    eval_every: int = 1000
    checkpoint_every: int = 5000
    out_dir: str = "outputs"


def to_dict(cfg: TrainConfig) -> dict:
    """Plain-JSON form of the config tree (persisted next to checkpoints
    so render/eval/export reconstruct the exact training configuration)."""
    import dataclasses

    return dataclasses.asdict(cfg)


def from_dict(d: dict) -> TrainConfig:
    """Inverse of to_dict.  Unknown keys error (they signal a config from
    a different version); missing keys keep their current defaults."""
    import dataclasses

    def build(cls, sub):
        types = {f.name: f for f in dataclasses.fields(cls)}
        unknown = set(sub) - set(types)
        if unknown:
            raise ValueError(f"{cls.__name__}: unknown config keys {sorted(unknown)}")
        kw = {}
        for k, v in sub.items():
            default = types[k].default_factory() if (
                types[k].default_factory is not dataclasses.MISSING
            ) else types[k].default
            if dataclasses.is_dataclass(default):
                kw[k] = build(type(default), v)
            else:
                kw[k] = v
        return cls(**kw)

    return build(TrainConfig, d)


def _apply_override(cfg, dotted: str, value: str):
    obj = cfg
    parts = dotted.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    leaf = parts[-1]
    old = getattr(obj, leaf)
    if isinstance(old, bool):
        new = value.lower() in ("1", "true", "yes", "on")
    elif isinstance(old, int):
        new = int(value)
    elif isinstance(old, float):
        new = float(value)
    else:
        new = value
    setattr(obj, leaf, new)


def with_overrides(cfg: TrainConfig, overrides) -> TrainConfig:
    """Apply `a.b.c=value` CLI overrides in place; returns cfg."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        k, v = ov.split("=", 1)
        _apply_override(cfg, k, v)
    return cfg


# --- BASELINE.json config ladder presets -----------------------------------


def preset_1_single_frame() -> TrainConfig:
    """Single sharp LDR frame, fixed exposure, identity CRF (CPU fwd+bwd)."""
    cfg = TrainConfig(name="ladder1-single-frame")
    cfg.model.max_gaussians = 1 << 14
    cfg.model.num_virtual_views = 1
    cfg.model.optimize_poses = False
    cfg.model.optimize_exposure = False
    cfg.model.crf.kind = "identity"
    cfg.densify.enabled = False
    cfg.optim.max_steps = 1000
    return cfg


def preset_2_multi_exposure() -> TrainConfig:
    """Static multi-exposure sequence: learnable CRF + exposures, no blur."""
    cfg = TrainConfig(name="ladder2-multi-exposure")
    cfg.model.num_virtual_views = 1
    cfg.model.optimize_poses = False
    cfg.model.optimize_exposure = True
    cfg.model.crf.kind = "mlp"
    return cfg


def preset_3_motion_blur() -> TrainConfig:
    """Motion blur only: spline trajectory + joint pose optimization."""
    cfg = TrainConfig(name="ladder3-motion-blur")
    cfg.model.num_virtual_views = 8
    cfg.model.optimize_poses = True
    cfg.model.optimize_exposure = False
    cfg.model.crf.kind = "identity"
    return cfg


def preset_4_full() -> TrainConfig:
    """Full CasualHDRSplat: joint everything + densification."""
    return TrainConfig(name="ladder4-full")


def preset_5_pod() -> TrainConfig:
    """Multi-host pod run: ~3M Gaussians sharded over the mesh."""
    cfg = TrainConfig(name="ladder5-pod")
    cfg.model.max_gaussians = 3 << 20
    cfg.parallel.data = 4
    cfg.parallel.gauss = 2
    return cfg


PRESETS = {
    "ladder1": preset_1_single_frame,
    "ladder2": preset_2_multi_exposure,
    "ladder3": preset_3_motion_blur,
    "ladder4": preset_4_full,
    "ladder5": preset_5_pod,
    "default": TrainConfig,
}
