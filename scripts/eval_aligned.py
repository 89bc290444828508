"""Pose-aligned deblurred-render evaluation of a quality-run checkpoint.

Loads the checkpoint + fixture knobs persisted by scripts/quality_run.py,
rebuilds the exact fixture (deterministic, cached), and scores the
deblurred renders against GT sharp frames BOTH raw and after test-time
pose alignment (train/pose_align.py — the BARF / BAD-NeRF / BAD-Gaussians
eval protocol: a per-image 6-DoF camera correction optimized against the
target with the scene frozen, so residual trajectory gauge does not
masquerade as blur).  Merges the results into the quality report JSON
under `final_eval_aligned` / `deblurring_gain_db_aligned`.

Run on the chip after (or between sessions of) the quality run:
    python scripts/eval_aligned.py --out QUALITY_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

_TPU_LOCK = acquire_chip("eval_aligned", timeout_s=120.0)  # one chip client at a time

runtime.setup()

import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu import config  # noqa: E402
from casualhdrsplat_tpu.models import image_formation as imf  # noqa: E402
from casualhdrsplat_tpu.models import losses  # noqa: E402
from casualhdrsplat_tpu.parallel.distributed import resume_or_start  # noqa: E402
from casualhdrsplat_tpu.train import metrics as metrics_mod  # noqa: E402
from casualhdrsplat_tpu.train.pose_align import make_aligner  # noqa: E402
from casualhdrsplat_tpu.train.trainer import Trainer  # noqa: E402

import quality_run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QUALITY_r03.json")
    ap.add_argument("--render-dir", default="outputs/quality")
    ap.add_argument("--steps", type=int, default=64,
                    help="alignment Adam steps per frame")
    ap.add_argument("--lr", type=float, default=2e-3)
    args = ap.parse_args()

    ckpt_root = os.path.abspath(os.path.join(args.render_dir, "ckpt"))
    with open(os.path.join(ckpt_root, "fixture.json")) as f:
        knobs = json.load(f)
    with open(os.path.join(ckpt_root, "config.json")) as f:
        cfg = config.from_dict(json.load(f))
    print("rebuilding fixture (cached)...", flush=True)
    video, ds = quality_run.build_fixture(knobs)

    t = Trainer(cfg, ds)
    step = resume_or_start(t, ckpt_root)
    if step == 0:
        raise SystemExit(f"no checkpoint under {ckpt_root}")
    print(f"checkpoint at step {step}", flush=True)

    deg = t.active_sh_degree()
    align = make_aligner(cfg.model, steps=args.steps, lr=args.lr,
                         sh_degree=deg)
    tr = list(t.dataset.train_indices)
    eval_idx = [tr[i] for i in range(0, len(tr), max(1, len(tr) // 6))]

    raw_p, al_p, in_p, al_s, deltas = [], [], [], [], []
    t0 = time.time()
    for i in eval_idx:
        fid = jnp.asarray(int(i))
        gt = jnp.asarray(ds.sharp_images[int(i)])
        inp = jnp.asarray(ds.images[int(i)])
        dt = imf.exposure_of(t.params, fid)
        t_mid = t.scene.timestamps[fid] + 0.5 * dt
        vm = imf.poses_at(t.params, t.scene, jnp.array([t_mid]), cfg.model)[0]
        raw, _, _ = imf.render_pose(
            t.params, t.scene, vm, cfg.model, exposure=dt, sh_degree=deg
        )
        aligned, delta, _ = align(t.params, t.scene, vm, dt, gt)
        raw_p.append(float(losses.psnr(raw, gt)))
        al_p.append(float(losses.psnr(aligned, gt)))
        al_s.append(float(losses.ssim(aligned, gt)))
        in_p.append(float(losses.psnr(inp, gt)))
        d = np.asarray(delta)
        deltas.append({
            "frame": int(i),
            "rot_deg": round(float(np.degrees(np.linalg.norm(d[:3]))), 4),
            "trans": round(float(np.linalg.norm(d[3:])), 5),
        })
        metrics_mod.save_image(
            os.path.join(args.render_dir, f"deblur_aligned_{i:03d}.png"),
            aligned,
        )
        print(json.dumps({"frame": int(i), "raw": round(raw_p[-1], 2),
                          "aligned": round(al_p[-1], 2),
                          "input": round(in_p[-1], 2), **deltas[-1]}),
              flush=True)

    block = {
        "protocol": (
            "per-frame 6-DoF test-time pose alignment against the eval "
            "target, scene/CRF/exposure frozen (BARF / BAD-NeRF eval "
            f"protocol); {args.steps} Adam steps @ lr {args.lr}"
        ),
        "at_step": int(step),
        "eval_sharp_psnr_raw": round(float(np.mean(raw_p)), 4),
        "eval_sharp_psnr_aligned": round(float(np.mean(al_p)), 4),
        "eval_sharp_ssim_aligned": round(float(np.mean(al_s)), 4),
        "eval_sharp_psnr_input": round(float(np.mean(in_p)), 4),
        "align_deltas": deltas,
        "wall_s": round(time.time() - t0, 1),
    }
    gain = block["eval_sharp_psnr_aligned"] - block["eval_sharp_psnr_input"]

    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    report["final_eval_aligned"] = block
    report["deblurring_gain_db_aligned"] = round(gain, 3)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, args.out)
    print(f"aligned gain {gain:+.2f} dB (raw {np.mean(raw_p):.2f} -> "
          f"aligned {np.mean(al_p):.2f} vs input {np.mean(in_p):.2f}); "
          f"merged into {args.out}", flush=True)


if __name__ == "__main__":
    main()
