"""Benchmark: full training-step throughput on the flagship workload.

Runs the complete HARP fitting step (MANO forward -> subdivision ->
displacement -> soft silhouette raster + shadowed RGB raster (3 hard passes
total) -> loss stack -> backward -> grouped Adam) at 448^2 on whatever
accelerator JAX exposes, and prints ONE JSON line:

  {"metric": "train_frames_per_sec_448_vgg", "value": N,
   "unit": "frames/s/chip", "vs_baseline": R}

The headline is the VGG-inclusive appearance-stage step — the step the
protocol actually spends its wall clock in (stages 2-3 are 281 of 301
epochs); the geometry-only and arm variants are secondary keys.

vs_baseline: the reference publishes no numbers (BASELINE.md). R is measured
throughput divided by an estimated 8 frames/s for the reference's pytorch3d
pipeline on a V100-class GPU (50 faces/px soft raster + 2 shadow raster
passes + backward at 448^2, batch 18 — order-of-magnitude literature
estimate, to be replaced by a measured value when the reference can run).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

REFERENCE_FRAMES_PER_SEC_ESTIMATE = 8.0


def measure(B: int, use_arm: bool = False, use_vgg: bool = False) -> float:
    """Trimmed-mean steady-state frames/s of the full train step at 448^2."""
    import jax
    import jax.numpy as jnp
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params
    from harp_tpu.fit.optimizer import build_optimizers
    from harp_tpu.fit.driver import make_train_step
    from harp_tpu.render import pipeline
    from __graft_entry__ import _build

    assets, config, rcfg, _ = _build(448, 512, n_frames=B, use_arm=use_arm)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=B, seed=0
    )
    params, aux = init_params(init, assets, config)
    txs, opt_states, group_masks = build_optimizers(params, config)
    vgg = None
    if use_vgg:
        from harp_tpu.losses.perceptual import Vgg16Features, precompute_slices

        vgg = Vgg16Features.create(weights_path=config.vgg_weights or None,
                                   compute_dtype=config.vgg_compute_dtype)
        # GT-side pyramids cached once and the filter bank passed as traced
        # args, like fit_sequence does — the bench measures the step the
        # protocol actually runs (and its executable, like the protocol's,
        # embeds no filter literals).
        vgg_params = tuple(
            (jnp.asarray(w), jnp.asarray(b)) for (w, b) in vgg.params
        )
        masked = images * masks_er[..., None]
        aux = dict(aux, vgg_params=vgg_params, vgg_gt=jax.jit(
            lambda im, vp: precompute_slices(
                dataclasses.replace(vgg, params=tuple(vp)), im,
                chunk=config.vgg_chunk,
            )
        )(masked, vgg_params))
    train_step = make_train_step(assets, config, rcfg, vgg, txs)
    ref_verts, _ = pipeline.mesh_forward(params, jnp.asarray([0]), assets, config)
    ref_verts = ref_verts[0]
    fids = jnp.arange(B)
    key = jax.random.PRNGKey(0)

    def run(p, s):
        return train_step(
            p, s, aux, fids, images, masks, masks_er, ref_verts, key,
            jnp.asarray(1.0, jnp.float32), coarse_on=True, app_on=True,
        )

    # Warmup / compile.
    params2, opt2, total, _ = run(params, opt_states)
    jax.block_until_ready(total)
    assert float(total) == float(total), "non-finite warmup loss"

    # Per-step sync: conservative but immune to async-dispatch artifacts.
    iters = 10
    times = []
    p, s = params2, opt2
    for _ in range(iters):
        t0 = time.perf_counter()
        p, s, total, _ = run(p, s)
        total.block_until_ready()
        times.append(time.perf_counter() - t0)
    import math

    dt = sum(sorted(times)[: max(iters - 2, 1)]) / max(iters - 2, 1)  # trim outliers
    assert math.isfinite(float(total)), "non-finite bench loss"

    return B / dt


def main():
    # HEADLINE: the VGG-inclusive appearance-stage step — the reference's
    # stage-2/3 step (optimize_sequence.py:546-547), the one that governs
    # the protocol wall clock — at the reference protocol batch
    # (optimize_sequence.py:396) and reference mesh density (3093 render
    # verts / 6152 faces — the _build default). The geometry-only step
    # (stage 1 / --no-vgg) and B=8 are reported alongside.
    fps_vgg18 = measure(18, use_vgg=True)
    out = {
        "metric": "train_frames_per_sec_448_vgg",
        "value": round(fps_vgg18, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_vgg18 / REFERENCE_FRAMES_PER_SEC_ESTIMATE, 3),
        # The reference publishes no numbers and cannot run here (no
        # CUDA/pytorch3d): the denominator is an estimate, not a measurement
        # (and it estimates the geometry step — the reference's VGG step is
        # slower than that, so this ratio is conservative).
        "vs_baseline_basis": "estimate:8fps-V100-literature",
    }
    try:
        # Secondary: the geometry-only (stage-1) step, B=18 and B=8.
        out["value_novgg_b18"] = round(measure(18), 3)
        out["value_novgg_b8"] = round(measure(8), 3)
    except Exception as e:  # the headline must survive a secondary failure
        out["novgg_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        # Secondary: the ARM workload (4078 render verts / 8128 faces —
        # reference config 4) at the protocol batch, geometry step.
        out["value_arm_b18"] = round(measure(18, use_arm=True), 3)
    except Exception as e:
        out["arm_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
