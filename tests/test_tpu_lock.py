"""Chip-client serialization lock (utils/tpu_lock.py, VERDICT r3 Weak #3):
exclusive across lock objects (flock on separate open file descriptions
conflicts even within one process), holder metadata readable while held,
and auto-release semantics."""

import json

from casualhdrsplat_tpu.utils.tpu_lock import TpuLock, acquire_chip


def test_exclusive_and_holder_metadata(tmp_path):
    p = str(tmp_path / "tpu.lock")
    a = TpuLock("bench", path=p)
    b = TpuLock("quality_run", path=p)
    assert a.try_acquire()
    assert not b.try_acquire()
    h = b.holder()
    assert h["name"] == "bench" and isinstance(h["pid"], int)
    assert not b.acquire(timeout_s=0.2, poll_s=0.05)
    a.release()
    assert b.acquire(timeout_s=0.2, poll_s=0.05)
    b.release()


def test_context_manager_and_reacquire(tmp_path):
    p = str(tmp_path / "tpu.lock")
    with TpuLock("probe", path=p) as l1:
        assert json.loads(open(p).read())["name"] == "probe"
        assert not TpuLock("other", path=p).try_acquire()
    # released on exit
    l2 = TpuLock("other", path=p)
    assert l2.try_acquire()
    l2.release()
    del l1


def test_acquire_chip_skips_on_forced_cpu(tmp_path, monkeypatch):
    monkeypatch.setenv("CHS_FORCE_CPU", "1")
    assert acquire_chip("anything", timeout_s=0.01) is None
