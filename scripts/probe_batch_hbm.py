"""HBM audit for pod-scale batch fitting (BASELINE config 5).

Lowers + compiles the vmapped-over-sequences batch train step at 448^2 /
reference density for a given (S, batch) and prints memory_analysis —
WITHOUT executing it (the axon TPU worker crashes, not raises, on HBM
exhaustion, so we audit before any real batch-fit run).

Usage: python scripts/probe_batch_hbm.py [S] [batch] [--vgg] [--run] [--shard]

--shard: build the step through the shard_map pod path over a 1-device
mesh (per-device body is UNBATCHED -> the Mosaic kernels engage; the
vmap path must pin the slower XLA backends). Local sequences run as
sequential lax.map iterations, so S=2 --shard measures kernel-speed
residency on one chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    S = int(args[0]) if args else 2
    B = int(args[1]) if len(args) > 1 else 18
    use_vgg = "--vgg" in sys.argv
    do_run = "--run" in sys.argv
    use_shard = "--shard" in sys.argv

    from __graft_entry__ import _build
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params
    from harp_tpu.fit.batch import (
        BatchFitData, make_batch_train_step, stack_params,
    )
    from harp_tpu.fit.optimizer import build_optimizers
    from harp_tpu.losses.perceptual import Vgg16Features, precompute_slices
    from harp_tpu.render import pipeline

    assets, config, rcfg, _ = _build(448, 512, n_frames=B)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=B, seed=0
    )
    params, aux = init_params(init, assets, config)

    vgg = None
    vgg_params = None
    if use_vgg:
        vgg = Vgg16Features.create(weights_path=config.vgg_weights or None,
                                   compute_dtype=config.vgg_compute_dtype)
        vgg_params = tuple(
            (jnp.asarray(w), jnp.asarray(b)) for (w, b) in vgg.params
        )
        import dataclasses
        masked = images * masks_er[..., None]
        aux = dict(aux, vgg_gt=jax.jit(
            lambda im, vp: precompute_slices(
                dataclasses.replace(vgg, params=tuple(vp)), im,
                chunk=config.vgg_chunk,
            )
        )(masked, vgg_params))

    txs, _, _ = build_optimizers(params, config)
    opt_states = {g: txs[g].init(params) for g in txs}

    params_S = stack_params([params] * S)
    opt_S = stack_params([opt_states] * S)
    aux_S = stack_params([aux] * S)
    imgs_S = jnp.stack([images] * S)
    m_S = jnp.stack([masks] * S)
    me_S = jnp.stack([masks_er] * S)
    ref_verts, _ = pipeline.mesh_forward(params, jnp.asarray([0]), assets, config)
    ref_verts_S = jnp.stack([ref_verts[0]] * S)
    fids_S = jnp.tile(jnp.arange(B)[None], (S, 1))
    keys_S = jax.random.split(jax.random.PRNGKey(0), S)
    lr_S = jnp.ones((S,), jnp.float32)

    mesh = None
    if use_shard:
        from jax.sharding import Mesh
        import numpy as _np

        mesh = Mesh(_np.asarray(jax.devices()[:1]), ("seq",))
    step = make_batch_train_step(assets, config, rcfg, vgg, txs, mesh=mesh)
    lowered = step.lower(
        params_S, opt_S, aux_S, fids_S, imgs_S, m_S, me_S, ref_verts_S,
        keys_S, lr_S, vgg_params, coarse_on=True, app_on=True,
    )
    print(f"S={S} B={B} vgg={use_vgg}: lowered, compiling...", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    print(f"compile {time.time()-t0:.1f}s")
    print(f"  temp   {ma.temp_size_in_bytes / gb:.2f} GiB")
    print(f"  args   {ma.argument_size_in_bytes / gb:.2f} GiB")
    print(f"  output {ma.output_size_in_bytes / gb:.2f} GiB")
    total = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
             + ma.output_size_in_bytes) / gb
    print(f"  total  {total:.2f} GiB of 16 (alias/donation may reduce)")

    if do_run and total < 14.5:
        ts = []
        p, s = params_S, opt_S
        for i in range(6):
            t0 = time.time()
            p, s, tot, _ = compiled(
                p, s, aux_S, fids_S, imgs_S, m_S, me_S, ref_verts_S,
                keys_S, lr_S, *( (vgg_params,) if vgg_params is not None else (None,)),
            )
            jax.block_until_ready(tot)
            ts.append(time.time() - t0)
        steady = sorted(ts[1:])[: max(len(ts) - 2, 1)]
        dt = sum(steady) / len(steady)
        print(f"  steady step {dt*1e3:.1f} ms -> {S*B/dt:.1f} frames/s/chip "
              f"({S} seqs resident)")


if __name__ == "__main__":
    main()
