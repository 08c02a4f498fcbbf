"""Benchmark: full training-step throughput on the flagship workload.

Runs the complete HARP fitting step (MANO forward -> subdivision ->
displacement -> soft silhouette raster + shadowed RGB raster (3 hard passes
total) -> loss stack -> backward -> grouped Adam) at 448^2 on whatever
accelerator JAX exposes, and prints ONE JSON line:

  {"metric": "train_frames_per_sec_448", "value": N, "unit": "frames/s/chip",
   "vs_baseline": R}

vs_baseline: the reference publishes no numbers (BASELINE.md). R is measured
throughput divided by an estimated 8 frames/s for the reference's pytorch3d
pipeline on a V100-class GPU (50 faces/px soft raster + 2 shadow raster
passes + backward at 448^2, batch 18 — order-of-magnitude literature
estimate, to be replaced by a measured value when the reference can run).
"""

from __future__ import annotations

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
        # GT-side pyramids cached once, like fit_sequence does — the bench
        # measures the step the protocol actually runs.
        masked = images * masks_er[..., None]
        aux = dict(aux, vgg_gt=jax.jit(
            lambda im: precompute_slices(vgg, im, chunk=config.vgg_chunk)
        )(masked))
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
    # HEADLINE: the reference protocol batch (optimize_sequence.py:396) at
    # reference mesh density (3093 render verts / 6152 faces — the _build
    # default). B=8 reported alongside.
    fps18 = measure(18)
    fps8 = measure(8)
    out = {
        "metric": "train_frames_per_sec_448",
        "value": round(fps18, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps18 / REFERENCE_FRAMES_PER_SEC_ESTIMATE, 3),
        # The reference publishes no numbers and cannot run here (no
        # CUDA/pytorch3d): the denominator is an estimate, not a measurement.
        "vs_baseline_basis": "estimate:8fps-V100-literature",
        "value_b8": round(fps8, 3),
    }
    try:
        # Secondary: the ARM workload (4078 render verts / 8128 faces —
        # reference config 4) at the protocol batch.
        out["value_arm_b18"] = round(measure(18, use_arm=True), 3)
    except Exception as e:  # the headline must survive an arm-path failure
        out["arm_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        # Secondary: appearance-stage step including the VGG16 perceptual
        # term (the reference's stage-2/3 step; chunked via config.vgg_chunk).
        out["value_vgg_b18"] = round(measure(18, use_vgg=True), 3)
    except Exception as e:
        out["vgg_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
