"""TPU runtime setup: persistent compile cache + compiler warmup.

The axon TPU compiler in this environment has two pathologies, measured
in-session (see git history of ops/projection.py):

1. tall-skinny dots (large N x tiny contraction, e.g. [N,3]@[3,3]) take
   4-8 MINUTES to compile.  Framework rule: express such contractions as
   broadcast mul+sum or batched tiny matmuls (both compile in <1s).
2. the first "large fusion" compile in a process pays a one-time ~100-500s
   warmup; afterwards similar programs compile in seconds.  Mitigations:
   a persistent compilation cache (cache hit: <1s in a fresh process) and
   an explicit cheap warmup compile at startup.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

DEFAULT_CACHE_DIR = os.environ.get("CHS_JAX_CACHE", "/root/jax_cache")

_done = {"cache": False, "warm": False}


def setup_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    if _done["cache"]:
        return
    if os.environ.get("CHS_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS=cpu; honor an explicit ask
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _done["cache"] = True


def warmup() -> None:
    """Compile one large elementwise fusion to absorb the compiler's
    first-big-fusion warmup cost before user programs compile."""
    if _done["warm"] or jax.default_backend() == "cpu":
        _done["warm"] = True
        return

    def chain(x):
        for i in range(30):
            x = jnp.sin(x) * jnp.sqrt(jnp.abs(x) + i) + jnp.where(x > 0, x * 0.5, -x)
        return x

    jax.block_until_ready(jax.jit(chain)(jnp.ones((2048, 128))))
    _done["warm"] = True


def setup() -> None:
    setup_cache()
    warmup()
