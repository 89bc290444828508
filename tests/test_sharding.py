"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md §4.4): the
tests the reference lineage never had — sharded-vs-single-chip allclose
for the rasterizer, gradients, and a full sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from casualhdrsplat_tpu.config import (
    CRFConfig,
    ModelConfig,
    ParallelConfig,
    RasterizeConfig,
)
from casualhdrsplat_tpu.data import dataset as dataset_mod
from casualhdrsplat_tpu.models import gaussians as gauss_mod
from casualhdrsplat_tpu.models import image_formation as imf
from casualhdrsplat_tpu.parallel import mesh as mesh_mod
from casualhdrsplat_tpu.parallel import render as prender
from casualhdrsplat_tpu.parallel import sharding as shard_mod


def model_cfg(backend="xla"):
    # backend="xla" -> dense composite_tiles under shard_map;
    # backend="pallas" -> the packed streaming compositor (interpret mode
    # on CPU) with round-robin-deduplicated binning.
    return ModelConfig(
        max_gaussians=128,
        sh_degree=1,
        num_virtual_views=4,
        crf=CRFConfig(kind="identity"),
        rasterize=RasterizeConfig(
            tile_h=8, tile_w=16, tile_capacity=64, max_tiles_per_gaussian=32,
            chunk=32, backend=backend,
            # exact-to-exact equivalence: the sharded path bins per view
            # (round-robin dedup), so the single-device reference must not
            # take the shared-binning approximation branch
            shared_binning=False,
        ),
    )


@pytest.fixture(scope="module")
def setup():
    ds = dataset_mod.make_synthetic_dataset(
        seed=5, n_gaussians=100, n_frames=4, n_virtual=2, size=24
    )
    cfg = model_cfg()
    scene = imf.build_scene(ds, cfg)
    params = imf.init_params(scene, ds.points_xyz, ds.points_rgb, cfg)
    return ds, cfg, scene, params


def test_mesh_construction():
    m = mesh_mod.make_mesh(ParallelConfig(data=4, gauss=2))
    assert m.shape == {"data": 4, "gauss": 2}
    m1 = mesh_mod.make_mesh(ParallelConfig(data=3, gauss=5))  # bad -> fallback
    assert m1.shape["data"] * m1.shape["gauss"] == len(jax.devices())


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8), (8, 1)])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_sharded_rasterize_matches_single(setup, mesh_shape, backend):
    ds, _, scene, params = setup
    cfg = model_cfg(backend)
    mesh = mesh_mod.make_mesh(ParallelConfig(*mesh_shape))
    frame = jnp.asarray(1)

    ref = imf.render_frame(params, scene, frame, cfg, sh_degree=1)
    out = jax.jit(
        lambda p: prender.render_frame_sharded(p, scene, frame, cfg, mesh, sh_degree=1)
    )(params)
    np.testing.assert_allclose(
        np.asarray(out.blurred_ldr), np.asarray(ref.blurred_ldr), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.sharp_hdr), np.asarray(ref.sharp_hdr), atol=3e-5, rtol=1e-4
    )


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_sharded_gradients_match_single(setup, backend):
    ds, _, scene, params = setup
    cfg = model_cfg(backend)
    mesh = mesh_mod.make_mesh(ParallelConfig(data=2, gauss=4))
    frame = jnp.asarray(2)
    target = jnp.asarray(ds.images[2])

    def loss_single(p):
        out = imf.render_frame(p, scene, frame, cfg, sh_degree=1)
        return jnp.mean((out.blurred_ldr - target) ** 2)

    def loss_sharded(p):
        out = prender.render_frame_sharded(p, scene, frame, cfg, mesh, sh_degree=1)
        return jnp.mean((out.blurred_ldr - target) ** 2)

    g_ref = jax.jit(jax.grad(loss_single, allow_int=True))(params)
    params_sharded = shard_mod.shard_params(params, mesh)
    g_out = jax.jit(jax.grad(loss_sharded, allow_int=True))(params_sharded)
    for name in ("means", "log_scales", "opacity_logit", "sh_dc"):
        a, b = g_out["gaussians"][name], g_ref["gaussians"][name]
        scale = max(1e-8, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3 * scale, rtol=1e-2,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(g_out["knot_deltas"]), np.asarray(g_ref["knot_deltas"]),
        atol=1e-5, rtol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(g_out["log_exposures"]), np.asarray(g_ref["log_exposures"]),
        atol=1e-6, rtol=1e-2,
    )


def test_param_sharding_placement(setup):
    ds, cfg, scene, params = setup
    mesh = mesh_mod.make_mesh(ParallelConfig(data=2, gauss=4))
    sharded = shard_mod.shard_params(params, mesh)
    s = sharded["gaussians"]["means"].sharding
    assert s.spec == P("gauss")
    assert sharded["knot_deltas"].sharding.spec in (P(), P(None))
    # values unchanged
    np.testing.assert_allclose(
        np.asarray(sharded["gaussians"]["means"]),
        np.asarray(params["gaussians"]["means"]),
    )


def test_sharded_train_step_runs(setup):
    """Full jitted sharded step: sharded params in, sharded params out,
    loss finite and decreasing over a few steps."""
    import optax

    from casualhdrsplat_tpu.config import OptimConfig
    from casualhdrsplat_tpu.train import optim as optim_mod

    ds, cfg, scene, params = setup
    mesh = mesh_mod.make_mesh(ParallelConfig(data=2, gauss=4))
    params = shard_mod.shard_params(params, mesh)
    opt = optim_mod.make_optimizer(OptimConfig(), 1.0)
    opt_state = opt.init(params)
    opt_state = shard_mod.shard_opt_state(opt_state, params, mesh)
    images = jnp.asarray(ds.images)

    @jax.jit
    def step(p, s, frame):
        def loss_fn(pp):
            out = prender.render_frame_sharded(pp, scene, frame, cfg, mesh, sh_degree=1)
            return jnp.mean((out.blurred_ldr - images[frame]) ** 2)

        l, g = jax.value_and_grad(loss_fn, allow_int=True)(p)
        u, s = opt.update(g, s, p)
        p = jax.tree.map(
            lambda a, b: a + b if jnp.issubdtype(a.dtype, jnp.floating) else a,
            p, u,
        )
        return p, s, l

    losses = []
    for i in range(6):
        params, opt_state, l = step(params, opt_state, jnp.asarray(1))
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same frame every step -> must decrease
    # params remain sharded after the step
    assert params["gaussians"]["means"].sharding.spec[0] == "gauss"
