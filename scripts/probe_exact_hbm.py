"""Memory audit of the reference_exact protocol programs (VERDICT r5 #1).

The axon TPU worker CRASHES (not raises) on HBM exhaustion, so before the
first protocol-scale HarpConfig.reference_exact() fit runs on the chip, this
lowers + compiles each stage's fused epoch-scan program at the exact
protocol shapes (448^2, B18, 36 frames, K=50 soft list, full-res shadow,
f32 VGG both sides, every tile active) and prints memory_analysis.

Usage: python scripts/probe_exact_hbm.py [--frames 36] [--scan 10]
       [--stage all|1|2|3] [--fast] [--cap N] [--af F]
--fast audits the default fast-path config instead (comparison column).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--stage", default="all")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--cap", type=int, default=448)
    ap.add_argument("--af", type=float, default=None)
    args = ap.parse_args()

    from harp_tpu.assets import build_synthetic_assets
    from harp_tpu.config import HarpConfig
    from harp_tpu.fit import driver
    from harp_tpu.fit.optimizer import build_txs
    from harp_tpu.losses.perceptual import Vgg16Features
    from harp_tpu.render import pipeline

    make = HarpConfig if args.fast else HarpConfig.reference_exact
    kw = dict(img_size=448, texture_size=512, batch_size=18,
              raster_cap=args.cap)
    if args.fast:
        kw["raster_active_fraction"] = 0.28
    if args.af is not None:
        kw["raster_active_fraction"] = args.af
    config = make(**kw)
    rcfg = config.raster_config()
    assets = build_synthetic_assets(uv_size=512, density="reference")
    n = args.frames

    p_abs, aux_abs = driver._fit_avals(config, assets, n)
    vgg = Vgg16Features.create(compute_dtype=config.vgg_compute_dtype)
    aux_abs["vgg_params"] = tuple(
        (jax.ShapeDtypeStruct(w.shape, jnp.float32),
         jax.ShapeDtypeStruct(b.shape, jnp.float32)) for (w, b) in vgg.params
    )
    txs, _ = build_txs(p_abs, config)
    s_abs = {g: jax.eval_shape(txs[g].init, p_abs) for g in txs}
    rv_abs = jax.eval_shape(
        lambda p: pipeline.mesh_forward(p, jnp.asarray([0]), assets,
                                        config)[0][0], p_abs)
    H = config.img_size
    sds = jax.ShapeDtypeStruct
    f32 = jnp.float32
    seq_img = sds((n, H, H, 3), f32)
    seq_m = sds((n, H, H), f32)
    bs = min(config.batch_size, n)
    steps = max(n // bs, 1)
    fids_es = sds((args.scan, steps, bs), jnp.int32)
    keys_es = sds((args.scan, steps, 2), jnp.uint32)
    f32s, i32s = sds((), f32), sds((), jnp.int32)

    scan_fn = driver.make_epoch_scan(assets, config, rcfg, vgg, txs)
    gb = 1024 ** 3
    stages = {"1": (True, False), "2": (True, True), "3": (False, True)}
    want = stages if args.stage == "all" else {args.stage: stages[args.stage]}
    for name, (c_on, a_on) in want.items():
        t0 = time.time()
        try:
            comp = scan_fn.lower(
                p_abs, s_abs, aux_abs, seq_img, seq_m, seq_m,
                fids_es, keys_es, rv_abs, (f32s, i32s, f32s), i32s,
                coarse_on=c_on, app_on=a_on,
            ).compile()
            ma = comp.memory_analysis()
            print(f"stage {name} ({'exact' if not args.fast else 'fast'}): "
                  f"compile {time.time()-t0:.1f}s  "
                  f"temp {ma.temp_size_in_bytes/gb:.2f} GiB  "
                  f"args {ma.argument_size_in_bytes/gb:.2f}  "
                  f"out {ma.output_size_in_bytes/gb:.2f}  "
                  f"(16 GiB chip)", flush=True)
        except Exception as e:
            print(f"stage {name}: FAILED {type(e).__name__}: {e}"[:500],
                  flush=True)


if __name__ == "__main__":
    main()
