"""Tracing / profiling harness (SURVEY.md §5.1).

Reference lineage: nerfstudio per-section timers + torch.cuda.Event.
Build: jax.profiler traces (TensorBoard/Perfetto-compatible) plus a
readback-forced timing helper — `jax.block_until_ready` does not reliably
block on this TPU backend, so every measurement here chains a scalar to
the host (see utils/runtime.py docs for the measurements behind this).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def sync(tree) -> None:
    """Force completion of every array in a pytree via host readback."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0]))


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Wall-clock seconds per call, completion-forced."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def mpix_per_s(fn: Callable, *args, pixels: int, iters: int = 10) -> float:
    """The BASELINE.md headline counter: megapixels rendered per second."""
    return pixels / time_fn(fn, *args, iters=iters) / 1e6


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context -> TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimers:
    """Named wall-clock section accumulators (per-section means)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, tree=None):
        t0 = time.time()
        yield
        if tree is not None:
            sync(tree)
        self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in sorted(self.totals)
        }
