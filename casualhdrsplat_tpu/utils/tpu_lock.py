"""Cross-process TPU client serialization (VERDICT r3 Weak #3 / next-step 3).

The axon TPU backend admits ONE client at a time; a second client either
queues behind the first or wedges, and any benchmark captured while
another client holds the chip is contaminated (round 3 shipped a 4.2x
bench drop measured inside the quality supervisor's window, and nobody
could tell regression from contamination).  Every long-lived chip client
in this repo (bench.py, scripts/quality_run.py, probes) takes this
advisory flock before touching the device:

- the lock is an OS-level flock(2) on one well-known file, so it is
  released AUTOMATICALLY when the holder exits or dies — no stale-lock
  cleanup, no PID-reuse races (the failure mode of the round-3 pidfile);
- holder metadata (name, pid, start time) is written into the file so a
  blocked client can report WHO holds the chip;
- acquisition is advisory: a caller may time out and proceed loudly
  (bench.py does, recording the capture conditions) — the lock's job is
  to make contamination impossible to miss, not to deadlock the driver.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
from typing import Optional

DEFAULT_PATH = os.environ.get(
    "CHS_TPU_LOCK", os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "outputs", "tpu.lock")
)


class TpuLock:
    """Advisory exclusive lock on the TPU chip.  Context-manager friendly;
    the flock is dropped by the kernel when the process exits, however it
    exits."""

    def __init__(self, name: str, path: str = DEFAULT_PATH):
        self.name = name
        self.path = path
        self._fd: Optional[int] = None

    def holder(self) -> Optional[dict]:
        """Metadata of the current holder, or None if unreadable/free."""
        try:
            with open(self.path) as f:
                return json.loads(f.read() or "null")
        except (OSError, ValueError):
            return None

    def try_acquire(self) -> bool:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        fd = os.open(self.path, os.O_RDWR | os.O_CREAT, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            return False
        meta = {"name": self.name, "pid": os.getpid(),
                "t_start": round(time.time(), 1)}
        os.ftruncate(fd, 0)
        os.write(fd, json.dumps(meta).encode())
        os.fsync(fd)
        self._fd = fd
        return True

    def acquire(self, timeout_s: float = 0.0, poll_s: float = 5.0) -> bool:
        """Blocking acquire with a timeout (0 = one non-blocking try).
        Returns False on timeout; prints the holder once while waiting."""
        deadline = time.time() + timeout_s
        reported = False
        while True:
            if self.try_acquire():
                return True
            if not reported:
                h = self.holder()
                print(
                    f"tpu_lock: chip held by "
                    f"{(h or {}).get('name', '?')} (pid "
                    f"{(h or {}).get('pid', '?')}) — waiting up to "
                    f"{timeout_s:.0f}s",
                    flush=True,
                )
                reported = True
            if time.time() >= deadline:
                return False
            time.sleep(min(poll_s, max(deadline - time.time(), 0.1)))

    def release(self) -> None:
        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None

    def __enter__(self):
        if not self.acquire():
            raise TimeoutError(f"TPU lock held by {self.holder()}")
        return self

    def __exit__(self, *exc):
        self.release()
        return False


_HELD: dict = {}  # path -> TpuLock already held by THIS process


def acquire_chip(name: str, timeout_s: float = 120.0) -> Optional[TpuLock]:
    """Standard chip-client entry: take the lock for the process lifetime
    (the flock dies with the process).  CPU-forced processes skip it.
    Re-entrant per process: a script that imports another chip script
    (eval_aligned imports quality_run for its fixture builder) must not
    deadlock against its own flock — separate open file descriptions of
    the same file DO conflict within one process.  Raises SystemExit on
    timeout so supervisors see a clean failure."""
    if os.environ.get("CHS_FORCE_CPU"):
        return None
    if DEFAULT_PATH in _HELD:
        return _HELD[DEFAULT_PATH]
    lock = TpuLock(name)
    if not lock.acquire(timeout_s=timeout_s):
        raise SystemExit(
            f"tpu_lock: chip still held by {lock.holder()} after "
            f"{timeout_s:.0f}s — aborting {name} (one axon client at a "
            f"time; see CLAUDE.md)"
        )
    _HELD[DEFAULT_PATH] = lock
    return lock
