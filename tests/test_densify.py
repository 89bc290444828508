"""Adaptive density control tests (SURVEY.md C9) on the fixed-capacity
masked store."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.config import DensifyConfig, OptimConfig
from casualhdrsplat_tpu.models import gaussians as gauss_mod
from casualhdrsplat_tpu.train import densify, optim


def make_store(n_alive=10, cap=32, rng=None):
    rng = rng or np.random.default_rng(0)
    xyz = rng.normal(size=(n_alive, 3))
    rgb = rng.uniform(size=(n_alive, 3))
    return gauss_mod.create(xyz, rgb, cap, sh_degree=1)


def full_params(gauss):
    return {
        "gaussians": gauss,
        "knot_deltas": jnp.zeros((4, 6)),
        "log_exposures": jnp.zeros((2,)),
        "crf": {},
    }


def run_adc(gauss, adc, cfg=None, key=None):
    cfg = cfg or DensifyConfig()
    params = full_params(gauss)
    opt = optim.make_optimizer(OptimConfig())
    opt_state = opt.init(params)
    key = key or jax.random.PRNGKey(0)
    return densify.densify_and_prune(
        gauss, opt_state, adc, key, cfg, scene_extent=1.0, image_diag=100.0,
        screen_prune=True,
    )


def test_clone_small_high_grad():
    gauss = make_store()
    cap = gauss["alive"].shape[0]
    adc = densify.AdcState(
        grad_accum=jnp.zeros(cap).at[3].set(1.0),
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.ones(cap) * 5.0,
    )
    # gaussian 3 small (scale < 0.01 * extent)
    gauss["log_scales"] = gauss["log_scales"].at[3].set(jnp.log(0.001))
    out, _, adc2, report = run_adc(gauss, adc)
    assert int(report.num_cloned) == 1
    assert int(report.num_split) == 0
    assert int(jnp.sum(out["alive"])) == 11
    # clone copies the parent params into a previously-dead slot
    new_slot = int(jnp.argmax(out["alive"][10:])) + 10
    np.testing.assert_allclose(out["means"][new_slot], out["means"][3])
    assert float(adc2.grad_accum.max()) == 0.0  # stats reset


def test_split_large_high_grad():
    gauss = make_store()
    cap = gauss["alive"].shape[0]
    adc = densify.AdcState(
        grad_accum=jnp.zeros(cap).at[5].set(1.0),
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.ones(cap) * 5.0,
    )
    gauss["log_scales"] = gauss["log_scales"].at[5].set(jnp.log(0.5))  # large
    before_scale = float(jnp.exp(gauss["log_scales"][5]).max())
    out, _, _, report = run_adc(gauss, adc)
    assert int(report.num_split) == 1
    assert int(jnp.sum(out["alive"])) == 11
    after_scale = float(jnp.exp(out["log_scales"][5]).max())
    np.testing.assert_allclose(after_scale, before_scale / 1.6, rtol=1e-5)


def test_prune_low_opacity_and_oversized():
    gauss = make_store()
    cap = gauss["alive"].shape[0]
    gauss["opacity_logit"] = gauss["opacity_logit"].at[2].set(-10.0)  # ~0 opacity
    adc = densify.AdcState(
        grad_accum=jnp.zeros(cap),
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.zeros(cap).at[7].set(50.0),  # 50 > 0.15*100
    )
    out, _, _, report = run_adc(gauss, adc)
    assert int(report.num_pruned) == 2
    assert not bool(out["alive"][2])
    assert not bool(out["alive"][7])
    assert int(jnp.sum(out["alive"])) == 8


def test_capacity_exhaustion_graceful():
    gauss = make_store(n_alive=30, cap=32)
    cap = 32
    adc = densify.AdcState(
        grad_accum=jnp.ones(cap) * 1.0,  # everyone wants to clone
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.ones(cap) * 5.0,
    )
    out, _, _, report = run_adc(gauss, adc)
    assert int(jnp.sum(out["alive"])) == 32  # grants capped at free slots
    assert int(report.num_cloned) + int(report.num_split) == 2


def test_optimizer_state_zeroed():
    gauss = make_store()
    cap = gauss["alive"].shape[0]
    params = full_params(gauss)
    opt = optim.make_optimizer(OptimConfig())
    opt_state = opt.init(params)
    # fake nonzero moments
    opt_state = jax.tree.map(
        lambda l: l + 1.0
        if isinstance(l, jnp.ndarray) and jnp.issubdtype(l.dtype, jnp.floating)
        else l,
        opt_state,
    )
    adc = densify.AdcState(
        grad_accum=jnp.zeros(cap).at[3].set(1.0),
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.ones(cap) * 5.0,
    )
    gauss["log_scales"] = gauss["log_scales"].at[3].set(jnp.log(0.001))
    out, new_state, _, report = densify.densify_and_prune(
        gauss, opt_state, adc, jax.random.PRNGKey(0), DensifyConfig(),
        scene_extent=1.0, image_diag=100.0,
    )
    new_slot = int(jnp.argmax(out["alive"][10:])) + 10
    leaves = [
        l
        for l in jax.tree.leaves(new_state)
        if isinstance(l, jnp.ndarray) and l.ndim >= 1 and l.shape[0] == cap
        and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    assert leaves, "no gaussian-capacity optimizer state found"
    for l in leaves:
        assert float(jnp.abs(l[new_slot]).max()) == 0.0


def test_reset_opacity():
    gauss = make_store()
    out = densify.reset_opacity(gauss, 0.01)
    opac = jax.nn.sigmoid(out["opacity_logit"])
    assert float(opac[gauss["alive"]].max()) <= 0.0101


def test_jittable():
    gauss = make_store()
    cap = gauss["alive"].shape[0]
    adc = densify.AdcState(
        grad_accum=jnp.ones(cap),
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.ones(cap) * 5.0,
    )
    params = full_params(gauss)
    opt = optim.make_optimizer(OptimConfig())
    opt_state = opt.init(params)
    cfg = DensifyConfig()

    @jax.jit
    def f(g, s, a, k):
        return densify.densify_and_prune(g, s, a, k, cfg, 1.0, 100.0)

    out, *_ = f(gauss, opt_state, adc, jax.random.PRNGKey(1))
    assert int(jnp.sum(out["alive"])) >= 10


def test_sharded_adc_shard_local_allocation():
    """densify_and_prune_sharded (SURVEY.md P5): same grant decisions as
    the global path when every shard has headroom, and every new slot
    lands in the REQUESTER's shard block (per-shard free lists — no
    cross-shard traffic)."""
    from casualhdrsplat_tpu.config import ParallelConfig
    from casualhdrsplat_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(ParallelConfig(data=2, gauss=4))
    gsize = mesh.shape["gauss"]
    cap = 64
    block = cap // gsize
    rng = np.random.default_rng(5)
    # alive gaussians in every shard block (first half of each block)
    gauss = make_store(n_alive=cap, cap=cap, rng=rng)
    alive = np.zeros(cap, bool)
    for b in range(gsize):
        alive[b * block : b * block + block // 2] = True
    gauss["alive"] = jnp.asarray(alive)
    # high screen-grads only in shard 2's block
    grads = np.zeros(cap, np.float32)
    req_lo, req_hi = 2 * block, 2 * block + 4
    grads[req_lo:req_hi] = 1.0
    adc = densify.AdcState(
        grad_accum=jnp.asarray(grads),
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.ones(cap),
    )
    params = full_params(gauss)
    opt = optim.make_optimizer(OptimConfig())
    opt_state = opt.init(params)
    cfg = DensifyConfig()
    key = jax.random.PRNGKey(3)

    out_g, _, _, rep_g = densify.densify_and_prune(
        gauss, opt_state, adc, key, cfg, 1.0, 100.0
    )
    out_s, _, _, rep_s = densify.densify_and_prune_sharded(
        gauss, opt_state, adc, key, cfg, 1.0, 100.0, mesh
    )
    # identical grant totals (headroom in every shard)
    assert int(rep_s.num_cloned + rep_s.num_split) == int(
        rep_g.num_cloned + rep_g.num_split
    ) == 4
    assert int(rep_s.num_alive) == int(rep_g.num_alive)
    # all newly-granted slots live in the requesters' shard block
    new_slots = np.flatnonzero(
        np.asarray(out_s["alive"]) & ~alive
    )
    assert len(new_slots) == 4
    assert all(req_lo <= s < req_lo + block for s in new_slots), new_slots


def test_sharded_adc_per_shard_capacity_exhaustion():
    """A full shard defers its requesters even when other shards have
    room (per-shard free list semantics) — and stays finite/consistent."""
    from casualhdrsplat_tpu.config import ParallelConfig
    from casualhdrsplat_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(ParallelConfig(data=2, gauss=4))
    gsize = mesh.shape["gauss"]
    cap = 64
    block = cap // gsize
    gauss = make_store(n_alive=cap, cap=cap)
    alive = np.zeros(cap, bool)
    alive[:block] = True  # shard 0 completely full
    gauss["alive"] = jnp.asarray(alive)
    grads = np.zeros(cap, np.float32)
    grads[:4] = 1.0  # requesters in the full shard
    adc = densify.AdcState(
        grad_accum=jnp.asarray(grads),
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.ones(cap),
    )
    params = full_params(gauss)
    opt = optim.make_optimizer(OptimConfig())
    opt_state = opt.init(params)
    out, _, _, rep = densify.densify_and_prune_sharded(
        gauss, opt_state, adc, jax.random.PRNGKey(0), DensifyConfig(),
        1.0, 100.0, mesh,
    )
    assert int(rep.num_cloned + rep.num_split) == 0  # deferred, not stolen
    assert int(rep.num_alive) == block


def test_rebalance_store_evens_shards_and_preserves_content():
    """rebalance_store (SURVEY.md §5.8 densification resharding): a
    maximally imbalanced store repacks to per-shard alive counts within
    1 of each other, carrying params, Adam moments, and ADC stats with
    each Gaussian."""
    n_shards, cap = 4, 64
    rng = np.random.default_rng(7)
    gauss = make_store(n_alive=20, cap=cap, rng=rng)  # all in shard 0+1
    params = full_params(gauss)
    opt = optim.make_optimizer(OptimConfig())
    opt_state = opt.init(params)
    # make moments distinctive so we can check they travel with the slot
    opt_state = jax.tree.map(
        lambda l: l + 1.0
        if hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == cap
        and jnp.issubdtype(l.dtype, jnp.floating)
        else l,
        opt_state,
    )
    adc = densify.AdcState(
        grad_accum=jnp.arange(cap, dtype=jnp.float32),
        count=jnp.ones(cap, jnp.int32),
        max_radii=jnp.arange(cap, dtype=jnp.float32) * 2.0,
    )
    counts0 = np.asarray(densify.shard_alive_counts(gauss["alive"], n_shards))
    assert counts0.max() - counts0.min() > 1  # fixture is imbalanced

    out, opt2, adc2 = densify.rebalance_store(gauss, opt_state, adc, n_shards)

    counts = np.asarray(densify.shard_alive_counts(out["alive"], n_shards))
    assert counts.sum() == 20
    assert counts.max() - counts.min() <= 1, counts
    # alive content preserved as a set (rows travel intact)
    def alive_rows(g):
        rows = np.asarray(g["means"])[np.asarray(g["alive"])]
        return rows[np.lexsort(rows.T)]
    np.testing.assert_allclose(alive_rows(out), alive_rows(gauss))
    # adc stats and opt moments follow their gaussian: find where old
    # slot 5 (alive) landed and check its stats came along
    src5 = np.asarray(gauss["means"])[5]
    dest = int(np.argmin(np.abs(np.asarray(out["means"]) - src5).sum(axis=1)))
    assert float(adc2.grad_accum[dest]) == 5.0
    assert float(adc2.max_radii[dest]) == 10.0
    mom = [
        l for l in jax.tree.leaves(opt2)
        if hasattr(l, "ndim") and l.ndim == 2 and l.shape == (cap, 3)
        and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    assert mom  # means moments exist and were permuted (stay all-ones)
    np.testing.assert_allclose(np.asarray(mom[0])[dest], 1.0)


def test_trainer_rebalance_on_mesh():
    """Trainer._maybe_rebalance: an imbalanced sharded store triggers the
    repack, shardings stay on `gauss`, and training continues finite."""
    from casualhdrsplat_tpu import config
    from casualhdrsplat_tpu.data import dataset as dataset_mod
    from casualhdrsplat_tpu.train.trainer import Trainer

    ds = dataset_mod.make_synthetic_dataset(
        seed=3, n_gaussians=24, n_frames=3, n_virtual=2, size=16
    )
    cfg = config.TrainConfig(name="rebalance-test")
    cfg.model.max_gaussians = 64
    cfg.model.sh_degree = 1
    cfg.model.num_virtual_views = 2
    cfg.model.crf.kind = "identity"
    cfg.model.rasterize = config.RasterizeConfig(
        tile_h=8, tile_w=16, tile_capacity=64, max_tiles_per_gaussian=32,
        chunk=32, backend="xla", packed=False,
    )
    cfg.densify.enabled = False
    cfg.densify.rebalance_threshold = 0.25
    cfg.parallel = config.ParallelConfig(data=2, gauss=4)
    cfg.data.eval_every = 0
    t = Trainer(cfg, ds)
    # init packs all 24 alive into slots 0..23 -> shards (16,8,0,0)
    assert t._maybe_rebalance()
    counts = np.asarray(
        densify.shard_alive_counts(t.params["gaussians"]["alive"], 4)
    )
    assert counts.max() - counts.min() <= 1, counts
    assert t.params["gaussians"]["means"].sharding.spec[0] == "gauss"
    out = t.run_step()
    assert np.isfinite(out["loss"])
    # balanced now: second call is a no-op
    assert not t._maybe_rebalance()


def test_screen_prune_gate():
    # lineage default: armed only after the first opacity reset
    cfg = DensifyConfig(opacity_reset_interval=3000)
    assert not densify.screen_prune_active(3000, cfg)
    assert densify.screen_prune_active(3001, cfg)
    # explicit start overrides (runs with opacity resets disabled);
    # active AT the configured step, per the config docstring
    cfg = DensifyConfig(opacity_reset_interval=10**9, screen_prune_from=600)
    assert not densify.screen_prune_active(599, cfg)
    assert densify.screen_prune_active(600, cfg)
