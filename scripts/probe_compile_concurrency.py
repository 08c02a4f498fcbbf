"""Does the axon worker overlap concurrent XLA compiles/loads?

The protocol's prefetch thread compiles the three stage-scan executables
SERIALLY (~36 s each warm: persistent-cache hit + deserialize + load over
the tunnel). If the worker can overlap two compile requests, a two-thread
prefetch plan removes the stage-2 wait that surfaces once the logging
stalls are fixed. This probe compiles the real protocol-shape stage-2 and
stage-3 scan programs first serially, then concurrently from two threads,
and prints both walls.

Run on TPU (host otherwise quiet): python scripts/probe_compile_concurrency.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp

    from harp_tpu.assets import build_synthetic_assets
    from harp_tpu.config import HarpConfig
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params
    from harp_tpu.fit.driver import make_epoch_scan
    from harp_tpu.fit.optimizer import build_optimizers
    from harp_tpu.losses.perceptual import Vgg16Features
    from harp_tpu.render import pipeline

    config = HarpConfig(
        img_size=448, focal_length=2000.0, texture_size=512,
        total_epoch=301, training_stage=(100, 100, 100), batch_size=18,
        raster_active_fraction=0.28, raster_cap=448,
    )
    rcfg = config.raster_config()
    assets = build_synthetic_assets(uv_size=512, density="reference")
    _, _, _, _, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=36, seed=0
    )
    params, aux = init_params(init, assets, config)
    vgg = Vgg16Features.create(compute_dtype=config.vgg_compute_dtype)
    txs, opt_states, _ = build_optimizers(params, config)
    aux = dict(aux, vgg_params=tuple(
        (jnp.asarray(w), jnp.asarray(b)) for (w, b) in vgg.params
    ))
    scan_fn = make_epoch_scan(assets, config, rcfg, vgg, txs, {})

    def absify(x):
        x = x if hasattr(x, "shape") else jnp.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    p_abs = jax.tree.map(absify, params)
    s_abs = jax.tree.map(absify, opt_states)
    n, bs, E = 36, 18, 10
    steps = n // bs
    f32s = jax.ShapeDtypeStruct((), jnp.float32)
    i32s = jax.ShapeDtypeStruct((), jnp.int32)
    img_abs = jax.ShapeDtypeStruct((n, 448, 448, 3), jnp.float32)
    msk_abs = jax.ShapeDtypeStruct((n, 448, 448), jnp.float32)
    fids_es = jax.ShapeDtypeStruct((E, steps, bs), jnp.int32)
    keys_es = jax.ShapeDtypeStruct((E, steps, 2), jnp.uint32)
    rv = pipeline.mesh_forward(params, jnp.asarray([0]), assets, config)[0][0]
    rv_abs = absify(rv)

    # vgg_gt-carrying aux for the app stages (mirrors fit_sequence).
    from harp_tpu.losses.perceptual import precompute_slices
    gt_shapes = jax.eval_shape(
        lambda im: precompute_slices(vgg, im, chunk=config.vgg_chunk),
        jax.ShapeDtypeStruct((n, 448, 448, 3), jnp.float32))
    a_abs = jax.tree.map(absify, aux)
    a_gt = dict(a_abs, vgg_gt=tuple(
        jax.ShapeDtypeStruct(s.shape, s.dtype) for s in gt_shapes))

    def lower(flags, aux_abs):
        c_on, a_on = flags
        return scan_fn.lower(p_abs, s_abs, aux_abs, img_abs, msk_abs,
                             msk_abs, fids_es, keys_es, rv_abs,
                             (f32s, i32s, f32s), i32s,
                             coarse_on=c_on, app_on=a_on)

    print("lowering stage2/stage3 ...")
    low2 = lower((True, True), a_gt)
    low3 = lower((False, True), a_gt)

    # In-process, a recompile of the SAME module returns the memoized loaded
    # executable instantly — serial and concurrent timings must come from
    # SEPARATE fresh processes (both warm in the persistent cache).
    if "--concurrent" in sys.argv:
        t0 = time.time()
        done = {}

        def run(name, low):
            t = time.time()
            low.compile()
            done[name] = time.time() - t

        th2 = threading.Thread(target=run, args=("stage2", low2))
        th3 = threading.Thread(target=run, args=("stage3", low3))
        th2.start(); th3.start()
        th2.join(); th3.join()
        tc = time.time() - t0
        print(f"concurrent (2 threads): wall {tc:.1f}s "
              f"(stage2 {done['stage2']:.1f}s, stage3 {done['stage3']:.1f}s)")
    else:
        t0 = time.time()
        low2.compile()
        t2 = time.time() - t0
        t0 = time.time()
        low3.compile()
        t3 = time.time() - t0
        print(f"serial: stage2 {t2:.1f}s + stage3 {t3:.1f}s = {t2 + t3:.1f}s")


if __name__ == "__main__":
    main()
