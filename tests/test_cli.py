"""CLI smoke tests (SURVEY.md L6) — drive the real command surface."""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    CHS_FORCE_CPU="1",
    PYTHONPATH=REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
)


def run_cli(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "casualhdrsplat_tpu.cli"] + args,
        capture_output=True, text=True, timeout=900, cwd=cwd, env=ENV,
    )


@pytest.mark.slow
def test_train_render_export(tmp_path):
    overrides = [
        "data.source=synthetic",
        "optim.max_steps=8",
        "model.max_gaussians=128",
        "model.num_virtual_views=2",
        "model.sh_degree=1",
        "model.rasterize.tile_h=8",
        "model.rasterize.tile_w=16",
        "model.rasterize.tile_capacity=64",
        "model.rasterize.chunk=32",
        "model.rasterize.backend=xla",
        "densify.enabled=false",
        "log_every=4",
        "eval_every=0",
        "checkpoint_every=0",
        f"out_dir={tmp_path}/out",
    ]
    r = run_cli(["train", "--preset", "default"] + overrides, str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    assert "final:" in r.stdout
    ckpt_root = tmp_path / "out" / "casual-hdr-splat"
    metrics = ckpt_root / "metrics.jsonl"
    assert metrics.exists() and metrics.read_text().strip()

    from casualhdrsplat_tpu.train import checkpoint as ckpt_mod

    step_dir = ckpt_mod.latest_step_dir(str(ckpt_root))
    assert step_dir is not None

    r = run_cli(
        ["render", "--preset", "default", "--checkpoint", step_dir,
         "--mode", "deblur", "--frames", "0", "--out", f"{tmp_path}/renders"]
        + overrides,
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "renders" / "deblur_0000.png").exists() or (
        tmp_path / "renders" / "deblur_0000.png.npy"
    ).exists()

    r = run_cli(
        ["export", "--preset", "default", "--checkpoint", step_dir,
         "--out", f"{tmp_path}/g.ply"] + overrides,
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "g.ply").exists()

    # Regression: render WITHOUT repeating the preset/overrides — the CLI
    # must reconstruct the training config from the config.json the
    # Trainer saved beside the checkpoints (a default-preset template
    # mismatches the ladder1 checkpoint tree and orbax restore fails).
    r = run_cli(
        ["render", "--checkpoint", step_dir, "--mode", "blurred",
         "--frames", "0", "--out", f"{tmp_path}/renders2"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "renders2" / "blur_0000.png").exists()

    # depth maps + GIF assembly (C20 downstream apps)
    r = run_cli(
        ["render", "--checkpoint", step_dir, "--mode", "depth",
         "--frames", "0,1", "--out", f"{tmp_path}/renders3",
         "--gif", f"{tmp_path}/renders3/anim.gif"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "renders3" / "depth_0000.png").exists()
    assert (tmp_path / "renders3" / "depth_0001.npy").exists()
    assert (tmp_path / "renders3" / "anim.gif").exists()

    # continuous-time novel-view trajectory along the optimized spline
    r = run_cli(
        ["render", "--checkpoint", step_dir, "--mode", "novel",
         "--path-n", "3", "--out", f"{tmp_path}/renders4",
         "--gif", f"{tmp_path}/renders4/path.gif"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "renders4" / "novel_0002.png").exists()
    assert (tmp_path / "renders4" / "path.gif").exists()


def test_render_requires_checkpoint(tmp_path):
    """render/eval/export without --checkpoint (or with an empty one, the
    classic empty-shell-var mistake) must fail loudly instead of silently
    rendering a fresh random init."""
    for cmd in (["render", "--mode", "deblur", "--out", f"{tmp_path}/r"],
                ["eval"],
                ["export", "--out", f"{tmp_path}/g.ply"],
                ["render", "--checkpoint", "", "--mode", "deblur",
                 "--out", f"{tmp_path}/r2"]):
        r = run_cli(cmd + ["data.source=synthetic"], str(tmp_path))
        assert r.returncode != 0
        assert "--checkpoint" in (r.stderr + r.stdout)
        assert not (tmp_path / "r").exists()
        assert not (tmp_path / "r2").exists()
