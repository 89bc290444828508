"""Parameter/optimizer sharding specs (SURVEY.md P2/P5, §5.8).

The Gaussian store shards along its capacity dim on the `gauss` axis;
pose knots, exposures, and CRF are tiny and replicated.  Optimizer state
inherits the parameter specs leaf-by-leaf (sharded Adam: moments live
with their parameter shards).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from casualhdrsplat_tpu.parallel.mesh import GAUSS_AXIS


def param_specs(params) -> dict:
    """PartitionSpec pytree matching the image_formation param tree."""

    def gauss_leaf(leaf):
        return P(GAUSS_AXIS) if leaf.ndim >= 1 else P()

    return {
        "gaussians": jax.tree.map(gauss_leaf, params["gaussians"]),
        "knot_deltas": jax.tree.map(lambda _: P(), params["knot_deltas"]),
        "log_exposures": jax.tree.map(lambda _: P(), params["log_exposures"]),
        "crf": jax.tree.map(lambda _: P(), params["crf"]),
    }


def shard_params(params, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)), params, specs
    )


def opt_state_specs(opt_state, params, mesh: Mesh):
    """Match optimizer-state leaves to parameter shardings by shape: any
    floating leaf whose leading dim equals the Gaussian capacity shards on
    `gauss`, everything else replicates."""
    cap = params["gaussians"]["means"].shape[0]

    def leaf_spec(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] == cap
        ):
            return NamedSharding(mesh, P(GAUSS_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_spec, opt_state)


def shard_opt_state(opt_state, params, mesh: Mesh):
    specs = opt_state_specs(opt_state, params, mesh)
    return jax.tree.map(jax.device_put, opt_state, specs)
