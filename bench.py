"""Headline benchmark: rendered Mpix/s/chip, forward+backward.

Measures the full differentiable CasualHDRSplat image-formation chain
(projection -> tile binning -> Pallas compositing -> CRF -> blur -> loss,
then the hand-written backward to every parameter group) on one chip and
reports megapixels rendered per second (BASELINE.md metric
"Rendered Mpix/s/chip, forward+backward").

vs_baseline: the reference snapshot publishes no numbers
(BASELINE.json "published": {}); the denominator is the lineage speed
context from SURVEY.md §6 — 3DGS-class training is ~30k iterations of a
~0.64 Mpix render in <=1 h on an RTX-class GPU, i.e. ~10 Mpix/s
forward+backward — so vs_baseline = value / 10.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build(n_gaussians=100_000, size=800, n_virtual=4, chunk=128,
          stream_factor=6, tile=(16, 16), prefix="cumsum"):
    import jax
    import jax.numpy as jnp

    from casualhdrsplat_tpu.config import CRFConfig, ModelConfig, RasterizeConfig
    from casualhdrsplat_tpu.data import synthetic
    from casualhdrsplat_tpu.geometry import spline
    from casualhdrsplat_tpu.models import crf as crf_mod
    from casualhdrsplat_tpu.models import gaussians as gauss_mod
    from casualhdrsplat_tpu.models import losses
    from casualhdrsplat_tpu.ops import rasterize as rast

    rng = np.random.default_rng(0)
    cloud = synthetic.random_cloud(rng, n_gaussians, scale_range=(0.004, 0.02))
    cam = synthetic.orbit_camera(0.0, width=size, img_height=size)
    knots = synthetic.orbit_knots(6, angle_span=0.12, width=size, img_height=size)
    t_k = spline.sample_virtual_times(1.0, 0.6, n_virtual)
    viewmats = spline.cubic_bspline_interpolation(knots, -2.0, 1.0, t_k)

    cfg = RasterizeConfig(
        tile_h=tile[0], tile_w=tile[1], tile_capacity=1024,
        max_tiles_per_gaussian=32, chunk=chunk, backend="auto",
        stream_factor=stream_factor, prefix=prefix,
    )
    crf_cfg = CRFConfig(kind="mlp")
    crf_params = crf_mod.create(crf_cfg)
    target = jnp.asarray(rng.uniform(size=(size, size, 3)), jnp.float32)

    import jax

    @jax.jit
    def step(means, log_scales, opacity_logit, colors, crf_p, log_dt):
        def loss_fn(means, log_scales, opacity_logit, colors, crf_p, log_dt):
            hdr, alphas, aux = rast.rasterize(
                means, cloud.quats, jnp.exp(log_scales),
                jax.nn.sigmoid(opacity_logit), colors, viewmats,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height, cfg,
            )
            ldr = crf_mod.apply(crf_p, hdr * jnp.exp(log_dt), crf_cfg)
            blurred = jnp.mean(ldr, axis=0)
            return losses.photometric(blurred, target, 0.2)

        l, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            means, log_scales, opacity_logit, colors, crf_p, log_dt
        )
        return l, grads

    args = (
        cloud.means3d,
        jnp.log(cloud.scales),
        jnp.log(cloud.opacities / (1 - cloud.opacities)),
        cloud.colors,
        crf_params,
        jnp.asarray(0.0),
    )
    return step, args, size * size * n_virtual


def build_sharded(n_gaussians=100_000, size=800, n_virtual=4, data=1, gauss=1):
    """Same workload through the shard_map path (parallel/render.py) on a
    (data x gauss) mesh — on one chip this measures the sharded code
    path's overhead vs the direct path (VERDICT r1 next-step 2 criterion:
    within ~15%)."""
    import jax
    import jax.numpy as jnp

    from casualhdrsplat_tpu.config import ParallelConfig, RasterizeConfig
    from casualhdrsplat_tpu.data import synthetic
    from casualhdrsplat_tpu.geometry import spline
    from casualhdrsplat_tpu.models import gaussians as gauss_mod
    from casualhdrsplat_tpu.models import losses
    from casualhdrsplat_tpu.ops import sh as sh_ops
    from casualhdrsplat_tpu.parallel import mesh as mesh_mod
    from casualhdrsplat_tpu.parallel import render as prender
    from casualhdrsplat_tpu.parallel import sharding as shard_mod

    rng = np.random.default_rng(0)
    cloud = synthetic.random_cloud(rng, n_gaussians, scale_range=(0.004, 0.02))
    cam = synthetic.orbit_camera(0.0, width=size, img_height=size)
    knots = synthetic.orbit_knots(6, angle_span=0.12, width=size, img_height=size)
    t_k = spline.sample_virtual_times(1.0, 0.6, n_virtual)
    viewmats = spline.cubic_bspline_interpolation(knots, -2.0, 1.0, t_k)

    cfg = RasterizeConfig(
        tile_h=16, tile_w=16, tile_capacity=1024, max_tiles_per_gaussian=32,
        chunk=128, backend="auto",
    )
    mesh = mesh_mod.make_mesh(ParallelConfig(data=data, gauss=gauss))
    store = gauss_mod.create(
        np.asarray(cloud.means3d), np.clip(np.asarray(cloud.colors), 0, 1),
        n_gaussians, sh_degree=0,
    )
    store["quats"] = cloud.quats
    store["log_scales"] = jnp.log(cloud.scales)
    store["opacity_logit"] = jnp.log(cloud.opacities / (1 - cloud.opacities))
    store = shard_mod.shard_params({"gaussians": store} | {
        "knot_deltas": jnp.zeros((1, 6)), "log_exposures": jnp.zeros((1,)),
        "crf": {},
    }, mesh)["gaussians"]
    target = jnp.asarray(rng.uniform(size=(size, size, 3)), jnp.float32)

    @jax.jit
    def step(gp):
        def loss_fn(gp):
            hdr, alphas, radii, depths, dropped = prender.rasterize_sharded(
                gp, viewmats, cam.fx, cam.fy, cam.cx, cam.cy,
                cam.width, cam.height, cfg, mesh, sh_degree=0,
            )
            blurred = jnp.mean(jnp.clip(hdr, 0.0, 1.0), axis=0)
            return losses.photometric(blurred, target, 0.2)

        return jax.value_and_grad(loss_fn, allow_int=True)(gp)

    return step, (store,), size * size * n_virtual


def main():
    import os
    import sys
    import threading

    import jax

    from casualhdrsplat_tpu.utils import runtime

    # Watchdog: a wedged axon terminal (stale session lock after a killed
    # client) makes device init hang FOREVER pre-devices — fail loudly
    # instead of stalling whatever invoked the bench.  Normal runs finish
    # in ~2-4 min (persistent compile cache); 20 min means wedged.
    def _deadline():
        sys.stderr.write(
            "bench.py: 20 min deadline exceeded — TPU backend likely "
            "wedged (see memory: axon-kill-wedges-terminal); aborting\n"
        )
        sys.stderr.flush()
        os._exit(3)

    _wd = None
    if os.environ.get("CHS_BENCH_NO_WATCHDOG") is None:
        _wd = threading.Timer(1200.0, _deadline)
        _wd.daemon = True  # never outlive a normal run
        _wd.start()

    # Serialize against other chip clients (VERDICT r3 Weak #3: the r03
    # bench number was captured while the quality supervisor held the
    # one-client-at-a-time backend — 4.2x contamination, unadjudicated
    # for a round).  Take the advisory chip flock; if a long-running
    # client holds it, ask it to stop cooperatively (quality_run.py honors
    # outputs/quality.stop between steps) and wait; only proceed
    # unserialised after the full wait, LOUDLY.
    from casualhdrsplat_tpu.utils.tpu_lock import TpuLock

    repo = os.path.dirname(os.path.abspath(__file__))
    stop_file = os.path.join(repo, "outputs", "quality.stop")
    lock = TpuLock("bench")
    wait = float(os.environ.get("CHS_BENCH_LOCK_WAIT", "900"))
    made_stop = False
    if not lock.acquire(timeout_s=wait / 3):
        os.makedirs(os.path.dirname(stop_file), exist_ok=True)
        if not os.path.exists(stop_file):
            open(stop_file, "w").close()
            made_stop = True
        sys.stderr.write(
            "bench.py: requested cooperative stop of the running chip "
            "client (outputs/quality.stop); waiting for the lock\n"
        )
        if not lock.acquire(timeout_s=2 * wait / 3):
            sys.stderr.write(
                f"bench.py: WARNING — chip lock still held by "
                f"{lock.holder()}; proceeding UNSERIALIZED (this bench "
                f"number may be contaminated)\n"
            )
    if made_stop and os.path.exists(stop_file):
        os.remove(stop_file)

    runtime.setup()
    jax.devices()  # the wedge hangs HERE (pre-device-init)
    if _wd is not None:
        # Disarm once the backend answered: past this point a slow run is
        # legitimate (cold compile cache can exceed 20 min), and an
        # os._exit mid-step is exactly the uncooperative kill that wedges
        # the axon terminal for every other client.
        _wd.cancel()
    if "--sharded" in sys.argv:
        i = sys.argv.index("--sharded")
        dg = sys.argv[i + 1].split(",") if len(sys.argv) > i + 1 else ["1"]
        dg += ["1"] * (2 - len(dg))  # "--sharded 4" means a 4x1 mesh
        step, args, pixels = build_sharded(data=int(dg[0]), gauss=int(dg[1]))
    else:
        # kernel-schedule sweep knobs (perf tuning only; the recorded
        # metric uses the defaults): --chunk N, --stream-factor N,
        # --tile HxW
        def _arg(flag, default, cast):
            if flag in sys.argv:
                return cast(sys.argv[sys.argv.index(flag) + 1])
            return default

        step, args, pixels = build(
            chunk=_arg("--chunk", 128, int),
            stream_factor=_arg("--stream-factor", 6, int),
            tile=_arg("--tile", (16, 16),
                      lambda s: tuple(int(x) for x in s.split("x"))),
            # r05 sweep: the log-depth VPU scan beats the fp32 triangular
            # MXU matmul 18.4 vs 17.1 Mpix/s (outputs/perf_r05_sweep.log)
            prefix=_arg("--prefix", "cumsum", str),
        )

    l, grads = step(*args)  # compile
    assert np.isfinite(float(l)), float(l)  # host readback = real sync

    # NOTE: jax.block_until_ready does not reliably block on the axon
    # backend (measured: returns in 0.04 ms while the computation runs for
    # seconds).  Chain losses on device and read ONE scalar back at the
    # end — the data dependency forces every step to complete.
    #
    # MEDIAN of >=3 back-to-back windows (VERDICT r4 Weak #4: a
    # single-shot bench could not distinguish the 16.4-vs-14.5 same-code
    # spread from regression).  Each window is independently synced by its
    # own host readback; the JSON line carries the spread so a noisy
    # capture is visible in the recorded artifact itself.
    n_windows, n_iter = 3, 12
    rates = []
    for _ in range(n_windows):
        t0 = time.time()
        acc = 0.0
        for _ in range(n_iter):
            l, grads = step(*args)
            acc = acc + l
        assert np.isfinite(float(acc))
        dt = (time.time() - t0) / n_iter
        rates.append(pixels / dt / 1e6)

    mpix_s = float(np.median(rates))
    spread_pct = 100.0 * (max(rates) - min(rates)) / max(mpix_s, 1e-9)
    metric = "rendered Mpix/s/chip fwd+bwd"
    if "--sharded" in sys.argv:
        metric += " (shard_map path)"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                # denominator: lineage speed context (~10 Mpix/s fwd+bwd
                # for 3DGS-class training on an RTX GPU — BASELINE.md
                # "vs_baseline denominator"); sol_frac scores against the
                # measured speed-of-light estimate for THIS workload on
                # this chip (~85 Mpix/s midpoint, BASELINE.md §SoL).
                "vs_baseline": round(mpix_s / 10.0, 3),
                "sol_frac": round(mpix_s / 85.0, 3),
                "median_of": n_windows,
                "iters_per_window": n_iter,
                "spread_pct": round(spread_pct, 1),
                "windows": [round(r, 2) for r in rates],
            }
        )
    )


if __name__ == "__main__":
    main()
