"""Per-stage communication accounting for the sharded renderer
(VERDICT r4 next-step 7: the >=80% multi-chip scaling target needs
quantitative backing that this environment — one real chip — cannot
measure directly).

Two parts:

1. ANALYTIC model of every collective in parallel/render.py's train step,
   from the known packet sizes (the module docstring's P2->P1 pivot):
   payload/aux all-gathers along `gauss`, the binning round-robin
   id gathers, the tile-output assembly gather, the backward's
   psum-scatter transposes, and the data-axis grad all-reduce.  Bytes are
   exact functions of (N, V, H, W, mesh, stream budget); times assume the
   ICI bandwidth given by --ici-gbps (default 90 GB/s effective per-chip
   ingress for a v5e 2D-torus neighbor exchange — change it to match the
   actual part) and DCN for the data axis when --dcn-gbps is set.

2. HLO inventory on the 8-virtual-device CPU mesh: jit the sharded
   fwd+bwd, compile, and count the collective ops GSPMD actually emitted
   (all-gather / reduce-scatter / all-reduce), verifying the transposes
   the analytic model assumes (all-gather -> reduce-scatter in the
   backward) are what the compiler produced.  Async start/done pairing is
   a TPU-compiler feature and is NOT visible on the CPU backend; the
   overlap column of the table is therefore a design statement (XLA
   latency-hiding scheduler overlaps independent collectives with
   compute), not a CPU-verifiable fact.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/comms_accounting.py [--hlo]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt_bytes(b: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if b < 1024 or unit == "GB":
            return f"{b:.1f} {unit}" if unit != "B" else f"{b:.0f} B"
        b /= 1024
    return f"{b:.1f} GB"


def account(N, V, H, W, d, g, sf=6, mtpg=32, tile=(16, 16), sh_deg=3):
    """Per-DEVICE ingress bytes for each collective of one train step.
    all_gather along an axis of size k moves (k-1)/k of the gathered
    result into each device; psum (ring all-reduce) moves 2(k-1)/k of
    the reduced buffer; reduce-scatter (psum_scatter) moves (k-1)/k."""
    th, tw = tile
    ntx, nty = -(-W // tw), -(-H // th)
    T = ntx * nty
    P = th * tw
    tiles_pad = -(-T // g) * g
    v_local = -(-V // d)
    n_bin = -(-v_local // g)
    s_budget = min(N * mtpg, sf * N)
    payload_dim = 16

    rows = []

    def add(name, axis, bytes_, note=""):
        rows.append((name, axis, bytes_, note))

    # forward
    add("payload all-gather", "gauss",
        (g - 1) / g * v_local * N * payload_dim * 4,
        "projected screen packets, 16 fp32/gaussian/view")
    add("aux all-gather", "gauss",
        (g - 1) / g * v_local * N * 3 * 4, "radii/depth/valid")
    add("binned-ids all-gather", "gauss",
        (g - 1) * n_bin * s_budget * 4,
        "round-robin dedup binning (int32 stream ids)")
    add("tile-starts all-gather", "gauss",
        (g - 1) * n_bin * (tiles_pad + 1) * 4, "bin edges")
    add("tile-output assembly", "both",
        (1 - 1 / (d * g)) * V * tiles_pad * 4 * P * 4,
        "out4 -> replicated for blur/SSIM")
    add("radii+depths assembly", "both",
        (1 - 1 / (d * g)) * 2 * V * N * 4, "ADC stats")
    # backward (shard_map transposes)
    add("payload-cotangent psum-scatter", "gauss",
        (g - 1) / g * v_local * N * payload_dim * 4,
        "transpose of the payload all-gather (P3)")
    add("tile-output grad scatter", "both",
        (1 - 1 / (d * g)) * V * tiles_pad * 4 * P * 4 / (d * g),
        "each device keeps its slice")
    # parameter grads: gaussian groups are gauss-sharded, reduced over data
    gauss_floats = 3 + 4 + 3 + 1 + 3 * (sh_deg + 1) ** 2  # means..SH
    add("gaussian-grad all-reduce", "data",
        2 * (d - 1) / d * (N / g) * gauss_floats * 4,
        f"{gauss_floats} fp32/gaussian, sharded /{g}")
    add("pose/exposure/CRF grad all-reduce", "both",
        2 * (d * g - 1) / (d * g) * 64 * 1024 * 4 / 1024,  # ~256 KB worst
        "replicated small groups (<=KBs)")
    return rows, dict(T=T, tiles_pad=tiles_pad, s_budget=s_budget,
                      v_local=v_local, n_bin=n_bin)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131_072)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--ici-gbps", type=float, default=90.0)
    ap.add_argument("--compute-ms", type=float, default=149.0,
                    help="measured single-chip step (BASELINE.md) at the "
                         "bench workload; scaled by 1/(d*g) ideally")
    ap.add_argument("--meshes", default="1x1,2x1,1x2,4x2,2x4,8x1")
    ap.add_argument("--hlo", action="store_true",
                    help="also compile the sharded fwd+bwd on the 8-dev "
                         "CPU mesh and inventory the emitted collectives")
    args = ap.parse_args()

    print(f"workload: N={args.n} gaussians, V={args.views} virtual views, "
          f"{args.size}^2, ICI {args.ici_gbps} GB/s effective, "
          f"single-chip step {args.compute_ms} ms\n")
    for mesh in args.meshes.split(","):
        d, g = (int(x) for x in mesh.split("x"))
        rows, meta = account(args.n, args.views, args.size, args.size, d, g)
        total = sum(r[2] for r in rows)
        comm_ms = total / (args.ici_gbps * 1e9) * 1e3
        # overlap model: the two big backward collectives (payload psum-
        # scatter + grad all-reduce) overlap the backward kernel (XLA
        # async collectives); forward gathers are on the critical path.
        overlap = sum(r[2] for r in rows if "grad" in r[0] or "cotangent" in r[0])
        comm_crit = (total - overlap) / (args.ici_gbps * 1e9) * 1e3
        comp_ms = args.compute_ms / (d * g)
        eff_no = comp_ms / (comp_ms + comm_ms)
        eff_ov = comp_ms / (comp_ms + comm_crit)
        print(f"mesh data={d} x gauss={g}  (tiles/dev="
              f"{meta['tiles_pad'] // g}, views/dev={meta['v_local']})")
        for name, axis, b, note in rows:
            ms = b / (args.ici_gbps * 1e9) * 1e3
            print(f"  {name:36s} {axis:6s} {fmt_bytes(b):>10s}  "
                  f"{ms:6.2f} ms  {note}")
        print(f"  total {fmt_bytes(total):>10s}  {comm_ms:.2f} ms | "
              f"compute/dev {comp_ms:.1f} ms | eff no-overlap "
              f"{100 * eff_no:.0f}% | eff bwd-overlapped {100 * eff_ov:.0f}%\n")

    if args.hlo:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        import collections

        import jax.numpy as jnp
        import numpy as np

        from casualhdrsplat_tpu.config import ParallelConfig, RasterizeConfig
        from casualhdrsplat_tpu.data import synthetic
        from casualhdrsplat_tpu.models import gaussians as gauss_mod
        from casualhdrsplat_tpu.parallel import mesh as mesh_mod
        from casualhdrsplat_tpu.parallel import render as prender
        from casualhdrsplat_tpu.parallel import sharding as shard_mod

        rng = np.random.default_rng(0)
        n, size, v = 512, 64, 4
        cloud = synthetic.random_cloud(rng, n, scale_range=(0.01, 0.05))
        cam = synthetic.orbit_camera(0.0, width=size, img_height=size)
        viewmats = jnp.tile(jnp.asarray(cam.viewmat)[None], (v, 1, 1))
        cfg = RasterizeConfig(tile_h=16, tile_w=16, tile_capacity=128,
                              max_tiles_per_gaussian=16, chunk=32,
                              backend="pallas")
        mesh = mesh_mod.make_mesh(ParallelConfig(data=4, gauss=2))
        store = gauss_mod.create(np.asarray(cloud.means3d),
                                 np.clip(np.asarray(cloud.colors), 0, 1),
                                 n, sh_degree=0)
        store = shard_mod.shard_params({
            "gaussians": store, "knot_deltas": jnp.zeros((1, 6)),
            "log_exposures": jnp.zeros((1,)), "crf": {},
        }, mesh)["gaussians"]

        def loss(gp):
            hdr, *_ = prender.rasterize_sharded(
                gp, viewmats, cam.fx, cam.fy, cam.cx, cam.cy,
                size, size, cfg, mesh, sh_degree=0)
            return jnp.sum(hdr)

        compiled = jax.jit(
            jax.grad(loss, allow_int=True)
        ).lower(store).compile()
        txt = compiled.as_text()
        counts = collections.Counter()
        for line in txt.splitlines():
            for op in ("all-gather", "reduce-scatter", "all-reduce",
                       "collective-permute", "all-to-all"):
                # word-boundary-ish match on the op name at the HLO call
                if f" {op}(" in line or f"{op}-start" in line or \
                        line.lstrip().startswith(f"%{op}"):
                    counts[op] += 1
        print("HLO collective inventory (4x2 CPU mesh, fwd+bwd):")
        for op, c in sorted(counts.items()):
            print(f"  {op:20s} {c}")
        if not counts:
            print("  (none found — inspect compiled.as_text() manually)")


if __name__ == "__main__":
    main()
