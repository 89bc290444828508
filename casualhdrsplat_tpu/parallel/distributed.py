"""Multi-host initialization + failure recovery (SURVEY.md §5.3, §5.8).

The reference is single-process research code with no recovery story; the
TPU build's contract is: `jax.distributed` process groups, periodic
orbax checkpoints of the full pytree (train/checkpoint.py), and idempotent
restart-from-latest as the failure-recovery mechanism.  There is no
elastic resharding beyond densification's in-graph rebalancing (P5) —
a restarted job re-creates the same mesh and restores sharded state.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op on a single process).

    Arguments default from the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) so launchers can
    configure purely through the environment.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes or os.environ.get("NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("PROCESS_ID", 0)),
    )


def resume_or_start(trainer, ckpt_root: str) -> int:
    """Idempotent recovery: restore the latest checkpoint if one exists.

    Returns the step resumed from (0 for a fresh start).  Combined with
    periodic `trainer.save`, a crashed/preempted job restarted with the
    same command recovers to its last checkpoint on every host.
    """
    from casualhdrsplat_tpu.train import checkpoint as ckpt_mod

    latest = ckpt_mod.latest_step_dir(ckpt_root)
    if latest is None:
        return 0
    trainer.load(latest)
    return trainer.step
