"""Device mesh construction (SURVEY.md L0, §5.8).

Axes:
- `data`: frame/virtual-view parallelism (P4) — the n virtual sharp
  renders of one blurred frame are embarrassingly parallel;
- `gauss`: Gaussian-store model parallelism (P2); after the projected-
  payload all-gather the same axis re-purposes as tile parallelism (P1),
  mirroring §5.7's "gather the keys (Gaussians) against stationary
  queries (pixel tiles)".

Multi-host: call `jax.distributed.initialize()` before `make_mesh` —
`jax.make_mesh` lays devices out so the `gauss` axis (all-gather heavy)
rides ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from casualhdrsplat_tpu.config import ParallelConfig

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"


def make_mesh(cfg: Optional[ParallelConfig] = None, devices=None) -> Mesh:
    cfg = cfg or ParallelConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data, gauss = cfg.data, cfg.gauss
    if data * gauss != n:
        # best effort: keep requested gauss size if it divides n
        gauss = gauss if n % max(gauss, 1) == 0 else 1
        data = n // gauss
    return jax.make_mesh((data, gauss), (DATA_AXIS, GAUSS_AXIS), devices=devices)


def single_device_mesh() -> Mesh:
    return jax.make_mesh((1, 1), (DATA_AXIS, GAUSS_AXIS), devices=jax.devices()[:1])


def spec(*axes) -> P:
    return P(*axes)


def sharding(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
