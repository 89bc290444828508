"""Adaptive density control (SURVEY.md C9) on the fixed-capacity store.

Reference lineage: `densify_and_clone/split/prune` + `reset_opacity` —
torch code that reallocates tensors every 100 iterations and hand-edits
Adam state.  XLA forbids shape changes, so the TPU redesign performs ADC
as pure masked scatters on the [capacity]-shaped pytree (SURVEY.md §7 M4):

- prune: clear `alive` (low opacity / oversized screen radius);
- clone (small, high screen-gradient) and split (large, high-grad): each
  requester is granted one free slot via a rank -> free-slot mapping
  computed with cumsum + argsort — deterministic, no host round-trip;
- optimizer moments at touched slots are zeroed through the same masks
  (optim.zero_state_at), the lineage's "optimizer state surgery";
- everything stays jittable, so ADC can run inside the sharded train
  graph and resharding is just the same scatters under a sharding
  constraint (SURVEY.md P5).

Screen-space gradient statistics are accumulated from the rasterizer's
`means2d_offset` gradient tap between ADC rounds.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from casualhdrsplat_tpu.config import DensifyConfig
from casualhdrsplat_tpu.geometry.lie import quat_to_rotmat
from casualhdrsplat_tpu.models.gaussians import inverse_sigmoid


class AdcState(NamedTuple):
    grad_accum: jnp.ndarray  # [N] sum of ||d loss / d means2d|| per round
    count: jnp.ndarray  # [N] visibility count
    max_radii: jnp.ndarray  # [N] max screen radius (pixels) this round

    @staticmethod
    def zero(n: int) -> "AdcState":
        return AdcState(
            grad_accum=jnp.zeros((n,), jnp.float32),
            count=jnp.zeros((n,), jnp.int32),
            max_radii=jnp.zeros((n,), jnp.float32),
        )


def accumulate(
    state: AdcState,
    means2d_grad: jnp.ndarray,
    radii: jnp.ndarray,
    image_size: Tuple[int, int] | None = None,
):
    """Update per-Gaussian statistics after one training step.

    means2d_grad: [N,2] PIXEL-space d loss / d means2d; radii: [V,N]
    (0 where culled); image_size: (width, height) — scales the pixel-space
    gradient by [w/2, h/2] to the NDC-half-extent convention the lineage's
    `grad_threshold` constant assumes (gsplat multiplies grads the same
    way before thresholding).
    """
    r = jnp.max(radii, axis=0)
    visible = r > 0
    if image_size is not None:
        w, h = image_size
        means2d_grad = means2d_grad * jnp.asarray(
            [0.5 * w, 0.5 * h], means2d_grad.dtype
        )
    g = jnp.linalg.norm(means2d_grad, axis=-1)
    return AdcState(
        grad_accum=state.grad_accum + jnp.where(visible, g, 0.0),
        count=state.count + visible.astype(jnp.int32),
        max_radii=jnp.maximum(state.max_radii, r),
    )


class AdcReport(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    num_alive: jnp.ndarray


def densify_and_prune(
    gauss: Dict[str, jnp.ndarray],
    opt_state,
    adc: AdcState,
    key: jax.Array,
    cfg: DensifyConfig,
    scene_extent: float,
    image_diag: float,
    screen_prune: bool = False,
    prune_only: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], object, AdcState, AdcReport]:
    n = gauss["alive"].shape[0]
    alive = gauss["alive"]
    opac = jax.nn.sigmoid(gauss["opacity_logit"])

    prune = alive & (opac < cfg.prune_opacity)
    if screen_prune:
        # the lineage enables the screen-size prune only after the first
        # opacity reset, once opacities are informative
        prune = prune | (
            alive & (adc.max_radii > cfg.prune_screen_radius * image_diag)
        )
    alive = alive & ~prune

    avg_grad = jnp.where(adc.count > 0, adc.grad_accum / jnp.maximum(adc.count, 1), 0.0)
    # prune_only: the trainer's automatic oversized-splat response may run
    # PAST densify.stop_iter (VERDICT r3 Weak #2) — pruning must not smuggle
    # clone/split growth back in after the schedule ended it.
    high = alive & (avg_grad > cfg.grad_threshold) & (not prune_only)
    scale_max = jnp.exp(gauss["log_scales"]).max(axis=-1)
    split = high & (scale_max > cfg.split_scale_threshold_rel * scene_extent)
    clone = high & ~split

    # one new slot per requester, granted in index order from free slots
    need = split | clone
    free = ~alive
    num_free = jnp.sum(free)
    rank = jnp.cumsum(need) - 1  # [N] rank among requesters
    free_slots = jnp.argsort(~free)  # free slot indices first, index order
    granted = need & (rank < num_free)
    dest = free_slots[jnp.clip(rank, 0, n - 1)]  # valid where granted
    scatter_idx = jnp.where(granted, dest, n)  # n -> dropped

    # child samples for splits: x = mu + R(q) (s * eps), scales / factor
    eps1, eps2 = jax.random.normal(key, (2, n, 3))
    rot = quat_to_rotmat(gauss["quats"])
    scales = jnp.exp(gauss["log_scales"])

    def sample(eps):
        return gauss["means"] + jnp.einsum("nij,nj->ni", rot, scales * eps)

    new_log_scales = gauss["log_scales"] - jnp.log(cfg.split_factor)

    # values written to the NEW slot: split -> child2 sample, clone -> copy
    child_means = jnp.where(split[:, None], sample(eps2), gauss["means"])
    child_log_scales = jnp.where(split[:, None], new_log_scales, gauss["log_scales"])

    def scatter(leaf, child_vals):
        return leaf.at[scatter_idx].set(child_vals, mode="drop")

    out = dict(gauss)
    out["means"] = scatter(gauss["means"], child_means)
    out["log_scales"] = scatter(gauss["log_scales"], child_log_scales)
    for k in ("quats", "opacity_logit", "sh_dc", "sh_rest"):
        out[k] = scatter(gauss[k], gauss[k])

    # parent slot updates for splits: child1 sample + shrunk scale
    out["means"] = jnp.where(split[:, None], sample(eps1), out["means"])
    out["log_scales"] = jnp.where(split[:, None], new_log_scales, out["log_scales"])

    new_alive = alive.at[scatter_idx].set(True, mode="drop")
    out["alive"] = new_alive

    # zero optimizer moments at every touched slot
    touched = (
        jnp.zeros((n,), bool).at[scatter_idx].set(True, mode="drop") | split | prune
    )
    from casualhdrsplat_tpu.train import optim as optim_mod

    opt_state = optim_mod.zero_state_at(opt_state, "gaussians", touched)

    report = AdcReport(
        num_cloned=jnp.sum(clone & granted),
        num_split=jnp.sum(split & granted),
        num_pruned=jnp.sum(prune),
        num_alive=jnp.sum(new_alive),
    )
    return out, opt_state, AdcState.zero(n), report


def densify_and_prune_sharded(
    gauss: Dict[str, jnp.ndarray],
    opt_state,
    adc: AdcState,
    key: jax.Array,
    cfg: DensifyConfig,
    scene_extent: float,
    image_diag: float,
    mesh,
    screen_prune: bool = False,
    prune_only: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], object, AdcState, AdcReport]:
    """ADC on the `gauss`-sharded store (SURVEY.md P5, VERDICT r1
    next-step 3): the SAME pure densify_and_prune runs INSIDE shard_map on
    each device's capacity block — per-shard free lists, so clone/split
    slot allocation, scatters, and optimizer-state surgery are all
    shard-LOCAL (zero collectives except the report psum).  A shard that
    exhausts its free slots defers its lowest-rank requesters to later
    rounds (same policy the unsharded path applies globally); capacity
    headroom bounds the imbalance, and prune keeps returning slots to the
    shard that owns them, so no explicit all_to_all rebalance is needed.
    """
    from jax.sharding import PartitionSpec as P

    from casualhdrsplat_tpu.parallel.mesh import GAUSS_AXIS

    cap = gauss["alive"].shape[0]

    def block_spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return P(GAUSS_AXIS)
        return P()

    gauss_specs = jax.tree.map(lambda _: P(GAUSS_AXIS), gauss)
    opt_specs = jax.tree.map(block_spec, opt_state)
    adc_specs = jax.tree.map(lambda _: P(GAUSS_AXIS), adc)

    def body(gauss_l, opt_l, adc_l, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(GAUSS_AXIS))
        out, opt, adc2, report = densify_and_prune(
            gauss_l, opt_l, adc_l, key, cfg, scene_extent, image_diag,
            screen_prune=screen_prune, prune_only=prune_only,
        )
        report = AdcReport(
            *(jax.lax.psum(x, GAUSS_AXIS) for x in report)
        )
        return out, opt, adc2, report

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(gauss_specs, opt_specs, adc_specs, P()),
        out_specs=(gauss_specs, opt_specs, adc_specs, P()),
        check_vma=False,
    )(gauss, opt_state, adc, key)


def shard_alive_counts(alive: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Alive Gaussians per contiguous shard block, [n_shards]."""
    return jnp.sum(alive.reshape(n_shards, -1), axis=1)


def rebalance_store(
    gauss: Dict[str, jnp.ndarray],
    opt_state,
    adc: AdcState,
    n_shards: int,
    mesh=None,
) -> Tuple[Dict[str, jnp.ndarray], object, AdcState]:
    """Redistribute alive Gaussians evenly across shard blocks (SURVEY.md
    §5.8 "all_to_all during densification resharding", P5).

    The shard-local ADC (densify_and_prune_sharded) keeps slot surgery
    collective-free, at the cost of possible imbalance when the scene's
    detail concentrates in one shard's slots.  This op repairs that:
    alive slots get global ranks (index order, a stable sort) and rank r
    moves to shard r % n_shards — per-shard counts then differ by at most
    one.  Everything is ONE gather permutation applied to every
    capacity-indexed leaf (params, Adam moments, ADC stats); under a
    `gauss`-sharded input XLA lowers it to the all-to-all-style reshard
    the survey calls for.  Rare (driven by an imbalance threshold), so
    the gather cost (~10-25 ns/row on this TPU) is off the hot path.
    """
    alive = gauss["alive"]
    cap = alive.shape[0]
    if cap % n_shards:
        raise ValueError(f"capacity {cap} not divisible by {n_shards} shards")
    block = cap // n_shards
    idx = jnp.arange(cap, dtype=jnp.int32)
    # alive-first stable order; order[k] = source slot of global rank k
    order = jnp.argsort(jnp.where(alive, idx, idx + cap))
    # rank k lands at dest(k) = (k % S) * block + k // S (a bijection);
    # its inverse is k(j) = (j % block) * S + j // block, so the gather
    # map is pure index arithmetic — no scatter, no second sort.
    src = order[(idx % block) * n_shards + idx // block]

    sharded_out = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from casualhdrsplat_tpu.parallel.mesh import GAUSS_AXIS

        sharded_out = NamedSharding(mesh, P(GAUSS_AXIS))

    def take(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            if sharded_out is not None:
                # sharding-in-types can't infer the permuted layout; ask
                # for the gauss-sharded result directly (XLA lowers the
                # cross-shard moves to the all-to-all-style reshard)
                return leaf.at[src].get(out_sharding=sharded_out)
            return leaf[src]
        return leaf

    out = {k: take(v) for k, v in gauss.items()}
    adc_out = AdcState(*(take(x) for x in adc))
    opt_out = jax.tree.map(take, opt_state)
    return out, opt_out, adc_out


def screen_prune_active(step: int, cfg: DensifyConfig) -> bool:
    """Whether the max-screen-radius prune is armed at `step`.

    Lineage behavior: the screen-size prune only fires after the first
    opacity reset (3DGS `densify_and_prune`'s `max_screen_size` gate).
    `cfg.screen_prune_from > 0` arms it at an explicit step instead —
    required by runs that disable opacity resets, where the lineage gate
    would never open and oversized splats would grow binning demand
    without bound."""
    if cfg.screen_prune_from > 0:
        # explicit arming step: active AT that step (config docstring)
        return step >= cfg.screen_prune_from
    # lineage default: only after the first opacity reset
    return step > cfg.opacity_reset_interval


def reset_opacity(gauss: Dict[str, jnp.ndarray], value: float = 0.01):
    """Clamp opacities down (every 3k steps in the lineage) so pruning can
    retire Gaussians that stopped contributing."""
    cap = inverse_sigmoid(value)
    out = dict(gauss)
    out["opacity_logit"] = jnp.minimum(gauss["opacity_logit"], cap)
    return out
