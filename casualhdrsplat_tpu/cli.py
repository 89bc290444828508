"""CLI entry points (SURVEY.md L6): train / render / eval / export.

Reference lineage: `ns-train casual-hdr-splat`, `ns-render`, `ns-eval`.
Here: `python -m casualhdrsplat_tpu.cli <command> [--preset name]
[dotted.key=value ...]`.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _build_cfg(args):
    import json

    from casualhdrsplat_tpu import config

    cfg = None
    ck = getattr(args, "checkpoint", None)
    if ck and args.preset == "default":
        # The checkpoint's param/optimizer tree structure depends on the
        # training config (CRF kind, capacity, ...): restore with the
        # config.json the Trainer saved beside it, not the default preset.
        cfg_path = os.path.join(os.path.dirname(os.path.abspath(ck)),
                                "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = config.from_dict(json.load(f))
    if cfg is None:
        cfg = config.PRESETS[args.preset]()
    config.with_overrides(cfg, args.overrides)
    return cfg


def _make_trainer(cfg, checkpoint_path=None, require_checkpoint=False):
    from casualhdrsplat_tpu.train.trainer import Trainer

    if require_checkpoint and not checkpoint_path:
        # Without this, `render --checkpoint ""` (an empty shell var is the
        # common way to hit it) silently renders a fresh random init.
        raise SystemExit(
            "this command renders/scores a trained model: pass "
            "--checkpoint <out_dir/name/step_N>"
        )
    t = Trainer(cfg)
    if checkpoint_path:
        t.load(checkpoint_path)
    return t


def cmd_train(args):
    from casualhdrsplat_tpu.utils import runtime

    runtime.setup()
    cfg = _build_cfg(args)
    t = _make_trainer(cfg, args.checkpoint)
    if getattr(args, "resume", False) and not args.checkpoint:
        from casualhdrsplat_tpu.parallel.distributed import resume_or_start

        step = resume_or_start(t, os.path.join(cfg.out_dir, cfg.name))
        if step:
            print(f"resumed from step {step}")
    server = None
    if getattr(args, "viewer", False):
        from casualhdrsplat_tpu.viewer.server import ViewerServer, make_orbit_render_fn

        server = ViewerServer(make_orbit_render_fn(t), port=args.viewer_port).start()
        print(f"viewer at http://localhost:{server.port}/")
    try:
        last = t.train()
    finally:
        if server is not None:
            server.stop()
    print("final:", last)


def cmd_eval(args):
    from casualhdrsplat_tpu.utils import runtime

    runtime.setup()
    cfg = _build_cfg(args)
    t = _make_trainer(cfg, args.checkpoint, require_checkpoint=True)
    print(t.evaluate())


def cmd_render(args):
    """Render novel views / deblurred frames / HDR exposure sweeps from a
    checkpoint (SURVEY.md §3.4, C20)."""
    import jax.numpy as jnp

    from casualhdrsplat_tpu.models import image_formation as imf
    from casualhdrsplat_tpu.train import metrics as metrics_mod
    from casualhdrsplat_tpu.utils import runtime

    runtime.setup()
    cfg = _build_cfg(args)
    t = _make_trainer(cfg, args.checkpoint, require_checkpoint=True)
    os.makedirs(args.out, exist_ok=True)
    frames = (
        [int(f) for f in args.frames.split(",")]
        if args.frames
        else list(range(min(3, t.dataset.num_frames)))
    )
    gif_frames = []

    def _save(path, img):
        metrics_mod.save_image(path, img)
        if args.gif:
            gif_frames.append(
                (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)
            )

    if args.mode == "novel":
        # Continuous-time novel views (the lineage's `ns-render
        # camera-path`/interpolate): the OPTIMIZED SE(3) spline is already
        # a smooth camera path through the capture, so sample it densely
        # between the first and last frame and render sharp views at a
        # fixed virtual exposure (learned geometric mean unless given).
        t0 = float(t.scene.timestamps[0])
        last = t.dataset.num_frames - 1
        t1 = float(t.scene.timestamps[last]) + float(
            imf.exposure_of(t.params, last)
        )
        times = np.linspace(t0, t1, args.path_n)
        dt = (
            jnp.asarray(args.exposure)
            if args.exposure > 0
            else jnp.exp(jnp.mean(t.params["log_exposures"]))
        )
        viewmats = imf.poses_at(
            t.params, t.scene, jnp.asarray(times, jnp.float32), cfg.model
        )
        for j in range(args.path_n):
            img, _, _ = imf.render_pose(
                t.params, t.scene, viewmats[j], cfg.model, exposure=dt
            )
            _save(os.path.join(args.out, f"novel_{j:04d}.png"), img)
        frames = []

    for i in frames:
        if args.mode == "deblur":
            img, _, _ = imf.render_deblurred(t.params, t.scene, jnp.asarray(i), cfg.model)
            _save(os.path.join(args.out, f"deblur_{i:04d}.png"), img)
        elif args.mode == "depth":
            # expected depth at the mid-exposure pose (SURVEY C20 depth maps)
            mid = t.scene.timestamps[i] + 0.5 * imf.exposure_of(t.params, i)
            viewmat = imf.poses_at(t.params, t.scene, jnp.array([mid]), cfg.model)[0]
            depth, alpha, _ = imf.render_pose(
                t.params, t.scene, viewmat, cfg.model, depth_output=True
            )
            d = np.asarray(depth)
            np.save(os.path.join(args.out, f"depth_{i:04d}.npy"), d)
            cover = np.asarray(alpha) > 1e-3
            lo = float(d[cover].min()) if cover.any() else 0.0
            hi = float(d[cover].max()) if cover.any() else 1.0
            vis = np.where(cover, (d - lo) / max(hi - lo, 1e-6), 0.0)
            _save(os.path.join(args.out, f"depth_{i:04d}.png"),
                  jnp.asarray(np.tile(vis[..., None], (1, 1, 3))))
        elif args.mode == "hdr":
            img, _, _ = imf.render_deblurred(
                t.params, t.scene, jnp.asarray(i), cfg.model, hdr_output=True
            )
            np.save(os.path.join(args.out, f"hdr_{i:04d}.npy"), np.asarray(img))
            metrics_mod.save_hdr(
                os.path.join(args.out, f"hdr_{i:04d}.hdr"), np.asarray(img)
            )
        elif args.mode == "exposure-sweep":
            mid = t.scene.timestamps[i] + 0.5 * imf.exposure_of(t.params, i)
            viewmat = imf.poses_at(t.params, t.scene, jnp.array([mid]), cfg.model)[0]
            for j, dt in enumerate(np.geomspace(args.sweep_min, args.sweep_max, args.sweep_n)):
                img, _, _ = imf.render_pose(
                    t.params, t.scene, viewmat, cfg.model, exposure=jnp.asarray(dt)
                )
                _save(os.path.join(args.out, f"sweep_{i:04d}_{j:02d}.png"), img)
        else:  # blurred (reproduce the captured frame)
            out = imf.render_frame(t.params, t.scene, jnp.asarray(i), cfg.model)
            _save(os.path.join(args.out, f"blur_{i:04d}.png"), out.blurred_ldr)
    if args.gif and gif_frames:
        # dependency-free animation: PIL writes the GIF (no ffmpeg in this
        # image) — the natural preview artifact for a video method.
        from PIL import Image

        ims = [Image.fromarray(f) for f in gif_frames]
        fps = max(args.gif_fps, 0.1)  # guard --gif-fps 0 / negatives
        ims[0].save(args.gif, save_all=True, append_images=ims[1:],
                    duration=max(1, int(1000 / fps)), loop=0)
        print(f"wrote {len(ims)}-frame gif to {args.gif}")
    print(f"wrote renders to {args.out}")


def cmd_export(args):
    from casualhdrsplat_tpu.train import checkpoint as ckpt_mod
    from casualhdrsplat_tpu.utils import runtime

    runtime.setup()
    cfg = _build_cfg(args)
    t = _make_trainer(cfg, args.checkpoint, require_checkpoint=True)
    n = ckpt_mod.export_ply(args.out, t.params["gaussians"])
    print(f"wrote {n} Gaussians to {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="casualhdrsplat_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--preset", default="default", help="config preset name")
        sp.add_argument("--checkpoint", default=None, help="checkpoint dir to load")
        sp.add_argument(
            "overrides", nargs="*", default=[], help="dotted config overrides k=v"
        )

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in out_dir")
    sp.add_argument("--viewer", action="store_true",
                    help="serve a live web viewer during training")
    sp.add_argument("--viewer-port", type=int, default=7007)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval")
    common(sp)
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("render")
    common(sp)
    sp.add_argument("--mode", default="deblur",
                    choices=["deblur", "hdr", "exposure-sweep", "blurred",
                             "depth", "novel"])
    sp.add_argument("--path-n", type=int, default=60,
                    help="novel mode: number of samples along the spline")
    sp.add_argument("--exposure", type=float, default=0.0,
                    help="novel mode: virtual exposure (0 = learned mean)")
    sp.add_argument("--out", default="renders")
    sp.add_argument("--frames", default="", help="comma-separated frame ids")
    sp.add_argument("--gif", default="", help="also assemble the rendered "
                    "frames into an animated GIF at this path")
    sp.add_argument("--gif-fps", type=float, default=8.0)
    sp.add_argument("--sweep-min", type=float, default=0.1)
    sp.add_argument("--sweep-max", type=float, default=4.0)
    sp.add_argument("--sweep-n", type=int, default=7)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("export")
    common(sp)
    sp.add_argument("--out", default="gaussians.ply")
    sp.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
