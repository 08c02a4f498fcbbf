"""Measure serialized executable sizes of the protocol's big programs.

Round-3 anatomy attributed ~175 s of the warm 539 s protocol to loading
~124 MB stage executables over the axon tunnel. Hypothesis (verified on the
CPU backend in-round): closed-over jnp arrays are EMBEDDED in the lowered
module and the compiled executable — the epoch scan closed over the whole
image sequence (87 MB) + masks (2x29 MB) and every VGG program over the
filter bank (~31 MB), so the "codegen" size was mostly literal data. This
probe compiles the real protocol-shape programs and prints their serialized
sizes, so the constants-to-arguments refactor has a measured before/after.

Run on TPU:  python scripts/probe_exec_size.py
Run on CPU:  JAX_PLATFORMS=cpu python scripts/probe_exec_size.py --img 128
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=448)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--batch", type=int, default=18)
    ap.add_argument("--epoch-scan", type=int, default=10)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from harp_tpu.assets import build_synthetic_assets
    from harp_tpu.config import HarpConfig
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params, FitData
    from harp_tpu.fit.driver import make_epoch_scan, make_train_step
    from harp_tpu.fit.optimizer import build_optimizers
    from harp_tpu.losses.perceptual import Vgg16Features

    config = HarpConfig(
        img_size=args.img, focal_length=2000.0 * args.img / 448.0,
        texture_size=512, total_epoch=301, training_stage=(100, 100, 100),
        batch_size=args.batch,
        raster_active_fraction=0.28 if args.img >= 256 else 1.0,
        raster_cap=448,
    )
    rcfg = config.raster_config()
    assets = build_synthetic_assets(uv_size=512, density="reference")
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=args.frames, seed=0
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, assets, config)
    vgg = Vgg16Features.create(compute_dtype=config.vgg_compute_dtype)
    txs, opt_states, _ = build_optimizers(params, config)

    # Filters as traced args (mirrors fit_sequence): no program embeds the
    # filter bank as literals.
    aux = dict(aux, vgg_params=tuple(
        (jnp.asarray(w), jnp.asarray(b)) for (w, b) in vgg.params
    ))

    extras = {}
    scan_fn = make_epoch_scan(assets, config, rcfg, vgg, txs, extras)
    step_fn = make_train_step(assets, config, rcfg, vgg, txs, extras)

    def absify(x):
        x = x if hasattr(x, "shape") else jnp.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    p_abs = jax.tree.map(absify, params)
    s_abs = jax.tree.map(absify, opt_states)
    a_abs = jax.tree.map(absify, aux)
    n, bs = data.num_frames, config.batch_size
    steps = max(n // bs, 1)
    E = args.epoch_scan
    f32s = jax.ShapeDtypeStruct((), jnp.float32)
    i32s = jax.ShapeDtypeStruct((), jnp.int32)

    def report(name, lowered):
        t0 = time.time()
        comp = lowered.compile()
        t_compile = time.time() - t0
        try:
            blob = comp.runtime_executable().serialize()
            size = len(blob) / 1e6
        except Exception as e:
            size, blob = -1, None
            print(f"  serialize failed: {e}")
        hlo_mb = len(lowered.as_text()) / 1e6
        mem = comp.memory_analysis()
        print(f"{name}: exec {size:.1f} MB, stablehlo-text {hlo_mb:.1f} MB, "
              f"compile {t_compile:.1f}s, temp "
              f"{getattr(mem, 'temp_size_in_bytes', 0)/1e9:.2f} GB")
        return size

    from harp_tpu.render import pipeline

    rv = pipeline.mesh_forward(params, jnp.asarray([0]), assets, config)[0][0]
    rv_abs = absify(rv)
    for stage, (c_on, a_on) in (("stage1", (True, False)),
                                ("stage2", (True, True)),
                                ("stage3", (False, True))):
        fids_es = jax.ShapeDtypeStruct((E, steps, bs), jnp.int32)
        keys_es = jax.ShapeDtypeStruct((E, steps, 2), jnp.uint32)
        img_abs = absify(data.images)
        msk_abs = absify(data.masks)
        mer_abs = absify(data.masks_eroded)
        low = scan_fn.lower(p_abs, s_abs, a_abs, img_abs, msk_abs,
                            mer_abs, fids_es, keys_es, rv_abs,
                            (f32s, i32s, f32s), i32s,
                            coarse_on=c_on, app_on=a_on)
        report(f"epoch_scan[{stage}]", low)


if __name__ == "__main__":
    main()
