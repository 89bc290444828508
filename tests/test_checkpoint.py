"""Checkpoint + PLY interop tests (SURVEY.md C21, §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.models import gaussians as gauss_mod
from casualhdrsplat_tpu.train import checkpoint as ckpt


def test_pytree_save_restore(tmp_path, rng):
    payload = {
        "params": {
            "a": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
            "nested": {"b": jnp.arange(5)},
        },
        "step": 7,
    }
    path = str(tmp_path / "ck")
    ckpt.save(path, payload)
    out = ckpt.restore(path, payload)
    np.testing.assert_allclose(out["params"]["a"], payload["params"]["a"])
    np.testing.assert_array_equal(out["params"]["nested"]["b"], payload["params"]["nested"]["b"])
    assert int(out["step"]) == 7


def test_latest_step_dir(tmp_path):
    assert ckpt.latest_step_dir(str(tmp_path)) is None
    (tmp_path / "step_10").mkdir()
    (tmp_path / "step_200").mkdir()
    (tmp_path / "step_30").mkdir()
    assert ckpt.latest_step_dir(str(tmp_path)).endswith("step_200")


def test_latest_step_dir_skips_orbax_tmp(tmp_path):
    """An abrupt session end mid-save leaves `step_N.orbax-checkpoint-tmp-
    <ts>` dirs; resume must fall back to the last FINALIZED step instead
    of crashing on int('1000.orbax...') — ADVICE r3 (medium): the crash
    made the supervisor relaunch-loop forever."""
    import os

    root = tmp_path / "ckpt"
    for d in [
        "step_100", "step_900",
        "step_1000.orbax-checkpoint-tmp-1755655",
        "step_bogus", "other",
    ]:
        (root / d).mkdir(parents=True)
    assert ckpt.latest_step_dir(str(root)).endswith("step_900")
    # pruning keeps the newest K finalized dirs, sweeps orbax leftovers,
    # and never touches foreign directories (ADVICE r3, low: unbounded
    # ckpt growth under 5-minute mid-interval checkpoints)
    removed = ckpt.prune_step_dirs(str(root), keep=1)
    assert removed == 2
    assert sorted(os.listdir(root)) == ["other", "step_900", "step_bogus"]


def test_ply_roundtrip(tmp_path, rng):
    gauss = gauss_mod.create(
        rng.normal(size=(20, 3)), rng.uniform(size=(20, 3)), 32, sh_degree=2
    )
    path = str(tmp_path / "g.ply")
    n = ckpt.export_ply(path, gauss)
    assert n == 20
    back = ckpt.import_ply(path)
    alive = np.asarray(gauss["alive"])
    np.testing.assert_allclose(back["means"], np.asarray(gauss["means"])[alive], atol=1e-6)
    np.testing.assert_allclose(
        back["sh_dc"], np.asarray(gauss["sh_dc"])[alive], atol=1e-6
    )
    np.testing.assert_allclose(
        back["sh_rest"], np.asarray(gauss["sh_rest"])[alive], atol=1e-6
    )
    np.testing.assert_allclose(
        back["log_scales"], np.asarray(gauss["log_scales"])[alive], atol=1e-6
    )
    # quats normalized on export
    np.testing.assert_allclose(np.linalg.norm(back["quats"], axis=-1), 1.0, atol=1e-5)


def test_ply_header_3dgs_convention(tmp_path, rng):
    gauss = gauss_mod.create(
        rng.normal(size=(5, 3)), rng.uniform(size=(5, 3)), 8, sh_degree=3
    )
    path = str(tmp_path / "g.ply")
    ckpt.export_ply(path, gauss)
    header = open(path, "rb").read(4096).split(b"end_header")[0].decode()
    for prop in ("f_dc_0", "f_rest_44", "opacity", "scale_2", "rot_3"):
        assert f"property float {prop}" in header
    assert "element vertex 5" in header


def test_prune_step_dirs_protects_best(tmp_path):
    """prune_step_dirs(protect=N) keeps the best-eval checkpoint alive
    regardless of age (r05: the newest-3 sweep destroyed the quality
    peak while the run's tail diverged)."""
    import os

    from casualhdrsplat_tpu.train import checkpoint as ckpt_mod

    root = tmp_path / "ckpt"
    for n in (100, 200, 300, 400, 500):
        os.makedirs(root / f"step_{n}")
    (root / "step_250.orbax-checkpoint-tmp-9").mkdir()

    removed = ckpt_mod.prune_step_dirs(str(root), keep=2, protect=100)
    left = sorted(os.listdir(root))
    assert left == ["step_100", "step_400", "step_500"], left
    assert removed == 3  # steps 200, 300 + the orbax tmp dir
