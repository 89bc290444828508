"""Report durability for the at-spec quality run (VERDICT r4 next-step 2).

Round 4's headline deliverable evaporated because scripts/quality_run.py
evaluated only at 1000-step boundaries and bailed (`if not curve: return`)
without writing any report when a session ended early (it died at step
972/4000).  The contract under test: a run stopped before ANY step-based
eval boundary still leaves a scored QUALITY report + progress curve on
disk — evals are time-based and every exit path writes the report.
"""

import json
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    CHS_FORCE_CPU="1",  # also bypasses the chip flock (utils/tpu_lock.py)
    PYTHONPATH=REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
)


@pytest.mark.slow
def test_early_stopped_run_still_writes_report(tmp_path):
    out = tmp_path / "QUALITY_test.json"
    # --max-minutes ~1s: the run breaks out after its first training step,
    # far before the step-1000 eval boundary — exactly round 4's failure.
    args = [
        sys.executable, os.path.join(REPO_ROOT, "scripts", "quality_run.py"),
        "--size", "48", "--gt-gaussians", "300", "--frames", "3",
        "--capacity", "1024", "--virtual-views", "2",
        "--knots-per-frame", "2", "--steps", "1000",
        "--holdout-every", "0", "--densify-start", "100000",
        "--eval-every-s", "99999", "--max-minutes", "0.02",
        "--fresh", "--run-label", "report-durability-test",
        "--out", str(out), "--render-dir", str(tmp_path / "renders"),
    ]
    r = subprocess.run(args, capture_output=True, text=True, timeout=900,
                       cwd=str(tmp_path), env=ENV)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    assert out.exists(), "early-stopped run must write the report"
    report = json.loads(out.read_text())
    assert report["scale"]["steps_done"] >= 1
    # The exit path forces an eval, so the curve is scored, not empty.
    assert len(report["psnr_curve"]) >= 1
    assert "eval_sharp_psnr" in report["psnr_curve"][-1]
    assert "final_eval" in report and "deblurring_gain_db" in report
    # The HDR half of the contract (Readme.md:54) is populated too.
    assert "eval_hdr_psnr" in report["hdr_recovery"]
    assert "exposure_sweep_psnr" in report["hdr_recovery"]
    assert os.path.exists(str(out) + ".progress")
