"""Checkpoint / resume + PLY export (SURVEY.md C21, §5.4).

Persists the full training pytree {params (G_theta, knot deltas, log
exposures, CRF), optimizer state, ADC state, step} via orbax (sharded-
checkpoint capable for the multi-host path), plus a 3DGS-compatible
binary PLY exporter so trained scenes load in the wider splatting
ecosystem (SURVEY.md C21 "PLY export ... ecosystem interop").
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import orbax.checkpoint as ocp


def save(path: str, payload: Dict[str, Any]) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def restore(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)


def _finalized_step_dirs(root: str) -> list:
    """step_<N> checkpoint dirs under root, FINALIZED only: an abrupt end
    mid-save leaves orbax temp dirs like `step_N.orbax-checkpoint-tmp-<ts>`
    whose non-numeric suffix crashed resume on every relaunch until the
    supervisor gave up (ADVICE r3, medium).  Fully-numeric suffixes only."""
    out = []
    for d in os.listdir(root):
        stem = d[len("step_"):]
        if d.startswith("step_") and stem.isdigit():
            out.append((int(stem), os.path.join(root, d)))
    return sorted(out)


def latest_step_dir(root: str) -> Optional[str]:
    if not os.path.isdir(root):
        return None
    steps = _finalized_step_dirs(root)
    return steps[-1][1] if steps else None


def prune_step_dirs(root: str, keep: int = 3,
                    protect: "int | None" = None) -> int:
    """Delete all but the newest `keep` finalized step_<N> dirs plus any
    orbax temp leftovers (ADVICE r3, low: 5-minute mid-interval
    checkpoints otherwise grow the ckpt root without bound).  Returns the
    number of directories removed.

    `protect` keeps one additional step dir regardless of age — the
    best-eval checkpoint (r05: the newest-3 policy destroyed the run's
    quality-peak checkpoint while the tail diverged, leaving nothing to
    revert to)."""
    import shutil

    if not os.path.isdir(root) or keep < 1:
        return 0
    doomed = [
        p for n, p in _finalized_step_dirs(root)[:-keep] if n != protect
    ]
    doomed += [
        os.path.join(root, d)
        for d in os.listdir(root)
        if ".orbax-checkpoint-tmp" in d
    ]
    for p in doomed:
        shutil.rmtree(p, ignore_errors=True)
    return len(doomed)


def export_ply(path: str, gauss: Dict[str, Any]) -> int:
    """Write alive Gaussians as a 3DGS-ecosystem binary_little_endian PLY
    (property names follow the de-facto splatting convention)."""
    alive = np.asarray(gauss["alive"])
    means = np.asarray(gauss["means"])[alive]
    quats = np.asarray(gauss["quats"])[alive]
    quats = quats / np.maximum(np.linalg.norm(quats, axis=-1, keepdims=True), 1e-8)
    log_scales = np.asarray(gauss["log_scales"])[alive]
    opac = np.asarray(gauss["opacity_logit"])[alive]
    sh_dc = np.asarray(gauss["sh_dc"])[alive]  # [n,1,3]
    sh_rest = np.asarray(gauss["sh_rest"])[alive]  # [n,K-1,3]
    n = means.shape[0]
    n_rest = sh_rest.shape[1] * 3

    props = ["x", "y", "z", "nx", "ny", "nz"]
    props += [f"f_dc_{i}" for i in range(3)]
    props += [f"f_rest_{i}" for i in range(n_rest)]
    props += ["opacity"] + [f"scale_{i}" for i in range(3)] + [f"rot_{i}" for i in range(4)]

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    # channel-major f_rest layout, as written by the reference lineage
    rest = sh_rest.transpose(0, 2, 1).reshape(n, n_rest)
    rows = np.concatenate(
        [
            means,
            np.zeros((n, 3), np.float32),
            sh_dc.reshape(n, 3),
            rest,
            opac[:, None],
            log_scales,
            quats,
        ],
        axis=1,
    ).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rows.tobytes())
    return n


def import_ply(path: str) -> Dict[str, np.ndarray]:
    """Read a 3DGS-convention PLY back into plain arrays (for interop and
    round-trip tests)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = next(int(l.split()[-1]) for l in lines if l.startswith("element vertex"))
        props = [l.split()[-1] for l in lines if l.startswith("property")]
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, len(props))
    cols = {p: data[:, i] for i, p in enumerate(props)}
    n_rest = sum(1 for p in props if p.startswith("f_rest_"))
    rest = np.stack([cols[f"f_rest_{i}"] for i in range(n_rest)], axis=1)
    k_rest = n_rest // 3
    return {
        "means": np.stack([cols["x"], cols["y"], cols["z"]], axis=1),
        "sh_dc": np.stack([cols[f"f_dc_{i}"] for i in range(3)], axis=1)[:, None, :],
        "sh_rest": rest.reshape(n, 3, k_rest).transpose(0, 2, 1),
        "opacity_logit": cols["opacity"],
        "log_scales": np.stack([cols[f"scale_{i}"] for i in range(3)], axis=1),
        "quats": np.stack([cols[f"rot_{i}"] for i in range(4)], axis=1),
    }
