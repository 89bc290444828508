"""Stage-by-stage timing of the packed rasterize path at bench scale.

Times (readback-forced; block_until_ready is unreliable on this backend):
projection, shared binning+chunk pack, stream gather, forward composite
kernel, full forward, full forward+backward, and the CRF/loss tail —
so perf work targets the measured bottleneck, not a guess.

Run on the TPU: `python scripts/profile_step.py [--views 4] [--n 100000]`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casualhdrsplat_tpu.utils import runtime  # noqa: E402
from casualhdrsplat_tpu.utils.tpu_lock import acquire_chip  # noqa: E402

_TPU_LOCK = acquire_chip("profile_step", timeout_s=120.0)  # one chip client at a time

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from casualhdrsplat_tpu.config import CRFConfig, RasterizeConfig  # noqa: E402
from casualhdrsplat_tpu.data import synthetic  # noqa: E402
from casualhdrsplat_tpu.geometry import spline  # noqa: E402
from casualhdrsplat_tpu.models import crf as crf_mod  # noqa: E402
from casualhdrsplat_tpu.models import losses  # noqa: E402
from casualhdrsplat_tpu.ops import binning, rasterize as rast  # noqa: E402
from casualhdrsplat_tpu.ops import rasterize_packed  # noqa: E402
from casualhdrsplat_tpu.ops.composite import CompositeStatics  # noqa: E402
from casualhdrsplat_tpu.ops.projection import project_gaussians  # noqa: E402
from casualhdrsplat_tpu.utils import profiling  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    n, size, v = args.n, args.size, args.views

    rng = np.random.default_rng(0)
    cloud = synthetic.random_cloud(rng, n, scale_range=(0.004, 0.02))
    cam = synthetic.orbit_camera(0.0, width=size, img_height=size)
    knots = synthetic.orbit_knots(6, angle_span=0.12, width=size, img_height=size)
    t_k = spline.sample_virtual_times(1.0, 0.6, v)
    viewmats = spline.cubic_bspline_interpolation(knots, -2.0, 1.0, t_k)
    cfg = RasterizeConfig(
        tile_h=16, tile_w=16, tile_capacity=1024, max_tiles_per_gaussian=32,
        chunk=128, backend="auto",
    )
    crf_cfg = CRFConfig(kind="mlp")
    crf_params = crf_mod.create(crf_cfg)
    target = jnp.asarray(rng.uniform(size=(size, size, 3)), jnp.float32)
    opa_logit = jnp.log(cloud.opacities / (1 - cloud.opacities))

    th, tw = cfg.tile_h, cfg.tile_w
    ntx, nty = binning.tile_grid(size, size, th, tw)
    num_tiles = ntx * nty
    g = cfg.chunk
    s_budget = min(n * cfg.max_tiles_per_gaussian, cfg.stream_factor * n)
    s_budget = -(-s_budget // g) * g
    c_budget = s_budget // g + num_tiles + 1
    sentinel = v * num_tiles

    # -- staged fns --------------------------------------------------------
    @jax.jit
    def stage_project(means):
        def pv(vm):
            return project_gaussians(
                means, cloud.quats, cloud.scales, vm, cam.fx, cam.fy,
                cam.cx, cam.cy, size, size, near_plane=cfg.near_plane,
            )
        return jax.vmap(pv)(viewmats)

    projs = stage_project(cloud.means3d)
    profiling.sync(projs)

    @jax.jit
    def stage_bin(projs):
        validf = projs.valid.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(validf, axis=0), 1.0)
        ref_m2d = jnp.sum(projs.means2d * validf[..., None], axis=0) / denom[:, None]
        ref_depth = jnp.sum(projs.depths * validf, axis=0) / denom
        cheb = jnp.max(jnp.abs(projs.means2d - ref_m2d[None]), axis=-1)
        r_shared = jnp.max(jnp.where(projs.valid, cheb + projs.radii, 0.0), axis=0)
        s_gauss, starts, seg_len, _clip = binning.sorted_stream(
            ref_m2d, r_shared, ref_depth, jnp.any(projs.valid, axis=0),
            size, size, th, tw, cfg.max_tiles_per_gaussian,
        )
        # waterfill, matching what training actually executes (the old
        # clip-at-end form here silently drifted from ops/rasterize.py)
        seg_c, starts_c = binning.waterfill_segments(seg_len, s_budget)
        base = binning.pack_stream_chunks(
            starts_c, seg_c, s_budget, g, c_budget,
            out_row_offset=0, sentinel_row=sentinel,
        )
        ids = jnp.where(
            jnp.arange(s_budget) < starts[num_tiles], s_gauss[:s_budget], n
        )
        return base, ids

    base, ids = stage_bin(projs)
    profiling.sync((base.block_id, ids))

    @jax.jit
    def stage_gather(projs, ids):
        def pv(proj):
            payload = binning.build_payload(proj, cloud.colors, cloud.opacities)
            return payload[ids]
        return jax.vmap(pv)(projs).reshape(v * s_budget, binning.PAYLOAD_DIM)

    stream = stage_gather(projs, ids)
    profiling.sync(stream)

    view_ids = jnp.arange(v, dtype=jnp.int32)[:, None]
    used = base.out_row != sentinel
    chunks = binning.StreamChunks(
        block_id=(base.block_id[None] + view_ids * (s_budget // g)).reshape(-1),
        out_row=jnp.where(
            used[None], base.out_row[None] + view_ids * num_tiles, sentinel
        ).reshape(-1).astype(jnp.int32),
        first=jnp.broadcast_to(base.first[None], (v, c_budget)).reshape(-1),
        seg_lo=(base.seg_lo[None] + view_ids * s_budget).reshape(-1),
        seg_hi=(base.seg_hi[None] + view_ids * s_budget).reshape(-1),
        block_new=jnp.broadcast_to(base.block_new[None], (v, c_budget)).reshape(-1),
        num_chunks=base.num_chunks * v,
    )
    statics = CompositeStatics(
        num_views=v, ntx=ntx, nty=nty, tile_h=th, tile_w=tw, chunk=g,
        alpha_clip=cfg.alpha_clip, alpha_threshold=cfg.alpha_threshold,
        backend="pallas", transmittance_eps=cfg.transmittance_eps,
    )

    @jax.jit
    def stage_fwd_kernel(stream):
        return rasterize_packed.composite_stream(
            stream, chunks, sentinel + 1, statics
        )

    @jax.jit
    def stage_fwdbwd_kernel(stream):
        def f(s):
            out4 = rasterize_packed.composite_stream(
                s, chunks, sentinel + 1, statics
            )
            return jnp.sum(out4[:sentinel] ** 2)
        l, d = jax.value_and_grad(f)(stream)
        return l, d

    @jax.jit
    def full_fwd(means):
        imgs, alphas, aux = rast.rasterize(
            means, cloud.quats, cloud.scales, cloud.opacities, cloud.colors,
            viewmats, cam.fx, cam.fy, cam.cx, cam.cy, size, size, cfg,
        )
        ldr = crf_mod.apply(crf_params, imgs * 1.0, crf_cfg)
        return losses.photometric(jnp.mean(ldr, axis=0), target, 0.2)

    @jax.jit
    def full_fwdbwd(means, log_scales, opa_logit, colors, crf_p):
        def f(means, log_scales, opa_logit, colors, crf_p):
            imgs, alphas, aux = rast.rasterize(
                means, cloud.quats, jnp.exp(log_scales),
                jax.nn.sigmoid(opa_logit), colors, viewmats,
                cam.fx, cam.fy, cam.cx, cam.cy, size, size, cfg,
            )
            ldr = crf_mod.apply(crf_p, imgs * 1.0, crf_cfg)
            return losses.photometric(jnp.mean(ldr, axis=0), target, 0.2)
        return jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))(
            means, log_scales, opa_logit, colors, crf_p
        )

    @jax.jit
    def stage_crf_loss(imgs):
        ldr = crf_mod.apply(crf_params, imgs, crf_cfg)
        return losses.photometric(jnp.mean(ldr, axis=0), target, 0.2)

    imgs_const = jnp.zeros((v, size, size, 3)) + 0.3

    it = args.iters
    t = {}
    t["project"] = profiling.time_fn(stage_project, cloud.means3d, iters=it)
    t["bin+pack"] = profiling.time_fn(stage_bin, projs, iters=it)
    t["stream_gather"] = profiling.time_fn(stage_gather, projs, ids, iters=it)
    t["fwd_kernel"] = profiling.time_fn(stage_fwd_kernel, stream, iters=it)
    t["fwd+bwd_kernel"] = profiling.time_fn(stage_fwdbwd_kernel, stream, iters=it)
    t["crf+loss"] = profiling.time_fn(stage_crf_loss, imgs_const, iters=it)

    # VJP of the row gather alone: its transpose is a [v*s_budget,16]
    # scatter-add onto payload rows — the prime suspect for the backward
    # glue (CLAUDE.md: row-granular scatters 10-25 ns/row).
    payload_const = jnp.zeros((n + 1, binning.PAYLOAD_DIM), jnp.float32)

    @jax.jit
    def stage_gather_bwd(payload, ids):
        def f(p):
            rows = jax.vmap(lambda _: p[ids])(jnp.arange(v))
            return jnp.sum(rows ** 2)
        return jax.grad(f)(payload)

    t["gather_bwd"] = profiling.time_fn(
        stage_gather_bwd, payload_const, ids, iters=it
    )
    t["FULL_fwd"] = profiling.time_fn(full_fwd, cloud.means3d, iters=it)
    t["FULL_fwd+bwd"] = profiling.time_fn(
        full_fwdbwd, cloud.means3d, jnp.log(cloud.scales), opa_logit,
        cloud.colors, crf_params, iters=it,
    )
    t["bwd_kernel_est"] = t["fwd+bwd_kernel"] - t["fwd_kernel"]
    t["FULL_bwd_est"] = t["FULL_fwd+bwd"] - t["FULL_fwd"]
    mpix = size * size * v / 1e6
    print(f"\n{n} gaussians, {size}^2 x {v} views = {mpix:.2f} Mpix")
    for k, s in t.items():
        print(f"  {k:>16}: {s*1e3:8.2f} ms")
    print(f"  headline: {mpix / t['FULL_fwd+bwd']:.2f} Mpix/s fwd+bwd")


if __name__ == "__main__":
    main()
