"""MFU / roofline accounting of the protocol train step (VERDICT r4 #3).

Answers "how far from the hardware ceiling is the 448^2/B18 step?" with
numbers, not wall-clock: for each program variant it reports

- measured step time (per-step synced, trimmed mean),
- XLA's own cost model (compiled.cost_analysis): FLOPs + HBM bytes accessed,
- an ANALYTIC count of the fundamental MXU work (the VGG conv pyramid — the
  only large dense-matmul block in the step; everything else is
  gather/scatter/VPU work whose FLOPs are noise),
- achieved TFLOP/s and GB/s against v5e peaks, i.e. MFU and %HBM-BW.

v5e (one chip): 197 TFLOP/s bf16 MXU, 819 GB/s HBM (public TPU v5e specs).
The raster/shading/PCF portion of the step has almost no fundamental FLOPs
— its roofline is HBM bandwidth — so the step splits into:
  MFU story  = the VGG-inclusive delta (app-stage step minus geometry step)
  BW story   = the geometry step (raster + shading + scatters)

Usage:  python scripts/mfu_roofline.py [--json out.json]
Writes the table to stdout and the raw numbers as one JSON line.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_F32_TFLOPS = 49.0   # MXU f32 ~= bf16/4 (public scaling-book figure)
V5E_HBM_GBPS = 819.0

B = int(os.environ.get("BENCH_B", "18"))
IMG = 448


def vgg_conv_flops_per_frame(img: int) -> float:
    """Fundamental MAC FLOPs (2*MACs) of one pred-side VGG16 forward to
    relu4_3 at img^2 (the pyramid in losses/perceptual.py:VGG16_LAYOUT)."""
    from harp_tpu.losses.perceptual import VGG16_LAYOUT

    total = 0.0
    cin, hw = 3, img
    for item in VGG16_LAYOUT:
        if item == "M":
            hw //= 2
            continue
        cout = int(item)
        total += 2.0 * 9.0 * cin * cout * hw * hw
        cin = cout
    return total


def build():
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params
    from harp_tpu.fit.optimizer import build_optimizers
    from harp_tpu.fit.driver import make_train_step
    from harp_tpu.render import pipeline
    from harp_tpu.losses.perceptual import Vgg16Features, precompute_slices
    from __graft_entry__ import _build

    assets, config, rcfg, _ = _build(IMG, 512, n_frames=B)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=B, seed=0)
    params, aux = init_params(init, assets, config)
    txs, opt_states, _ = build_optimizers(params, config)
    vgg = Vgg16Features.create(weights_path=config.vgg_weights or None,
                               compute_dtype=config.vgg_compute_dtype)
    vgg_params = tuple((jnp.asarray(w), jnp.asarray(b)) for w, b in vgg.params)
    masked = images * masks_er[..., None]
    aux_vgg = dict(aux, vgg_params=vgg_params, vgg_gt=jax.jit(
        lambda im, vp: precompute_slices(
            dataclasses.replace(vgg, params=tuple(vp)), im,
            chunk=config.vgg_chunk))(masked, vgg_params))
    ref_verts, _ = pipeline.mesh_forward(params, jnp.asarray([0]), assets, config)
    ref_verts = ref_verts[0]
    fids = jnp.arange(B)
    key = jax.random.PRNGKey(0)
    one = jnp.asarray(1.0, jnp.float32)

    step_vgg = make_train_step(assets, config, rcfg, vgg, txs)
    step_novgg = make_train_step(assets, config, rcfg, None, txs)

    def args_for(aux_k):
        # Fresh param/opt buffers per program: the step donates argnums 0-1,
        # so each analyzed program must not share them with the others.
        return (jax.tree.map(jnp.array, params),
                jax.tree.map(jnp.array, opt_states),
                aux_k, fids, images, masks, masks_er, ref_verts, key, one)

    return config, step_vgg, step_novgg, args_for, aux_vgg, aux


def analyze(name, step_fn, args, static):
    """AOT-compile; return dict with cost analysis + measured time."""
    out = {"name": name}
    # make_train_step returns a jitted fn with static stage kwargs.
    low = step_fn.lower(*args, **static)
    comp = low.compile()
    try:
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        out["xla_flops"] = float(ca.get("flops", float("nan")))
        out["xla_bytes"] = float(ca.get("bytes accessed", float("nan")))
    except Exception as e:
        out["cost_analysis_error"] = f"{type(e).__name__}: {e}"[:120]
    try:
        ma = comp.memory_analysis()
        out["temp_gb"] = round(ma.temp_size_in_bytes / 2**30, 2)
    except Exception:
        pass
    # Warmup + timing (per-step sync, trimmed mean of 10). params/opt_states
    # are donated: thread them through like the real fit loop does.
    r = comp(*args)
    jax.block_until_ready(r)
    p, s = r[0], r[1]
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        r = comp(p, s, *args[2:])
        jax.block_until_ready(r[2])
        p, s = r[0], r[1]
        times.append(time.perf_counter() - t0)
    dt = float(np.mean(sorted(times)[:8]))
    out["step_ms"] = round(dt * 1e3, 1)
    if "xla_flops" in out and np.isfinite(out["xla_flops"]):
        out["xla_tflops_per_s"] = round(out["xla_flops"] / dt / 1e12, 2)
    if "xla_bytes" in out and np.isfinite(out["xla_bytes"]):
        out["hbm_gbps"] = round(out["xla_bytes"] / dt / 1e9, 1)
        out["pct_hbm_bw"] = round(100 * out["hbm_gbps"] / V5E_HBM_GBPS, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    config, step_vgg, step_novgg, args_for, aux_vgg, aux = build()

    rows = []
    rows.append(analyze("app_step_vgg_b%d" % B, step_vgg, args_for(aux_vgg),
                        dict(coarse_on=True, app_on=True)))
    rows.append(analyze("geom_step_b%d" % B, step_novgg, args_for(aux),
                        dict(coarse_on=True, app_on=False)))
    rows.append(analyze("app_step_novgg_b%d" % B, step_novgg, args_for(aux),
                        dict(coarse_on=True, app_on=True)))

    # --- analytic VGG accounting -------------------------------------------
    fwd = vgg_conv_flops_per_frame(IMG) * B
    # backward wrt the INPUT image only (conv filters are frozen: one
    # transposed conv per conv ~ 1x fwd) + the jax.checkpoint recompute of
    # the chunked forward (1x fwd) = ~3x fwd total per step, pred side only
    # (GT pyramids ride the per-sequence cache).
    vgg_step_flops = 3.0 * fwd
    vgg_row = next(r for r in rows if "vgg" in r["name"] and "novgg" not in r["name"])
    base_row = next(r for r in rows if r["name"].startswith("app_step_novgg"))
    vgg_ms = vgg_row["step_ms"] - base_row["step_ms"]
    peak = (V5E_PEAK_BF16_TFLOPS if config.vgg_compute_dtype == "bfloat16"
            else V5E_PEAK_F32_TFLOPS)
    analytic = {
        "vgg_fwd_gflop_frame": round(vgg_conv_flops_per_frame(IMG) / 1e9, 1),
        "vgg_step_tflop": round(vgg_step_flops / 1e12, 2),
        "vgg_delta_ms": round(vgg_ms, 1),
        "vgg_achieved_tflops": round(vgg_step_flops / (vgg_ms * 1e-3) / 1e12, 1)
        if vgg_ms > 0 else None,
        "vgg_mfu_pct": round(100 * vgg_step_flops / (vgg_ms * 1e-3) / 1e12 / peak, 1)
        if vgg_ms > 0 else None,
        "vgg_min_ms_at_peak": round(vgg_step_flops / (peak * 1e12) * 1e3, 1),
        "peak_tflops_used": peak,
    }

    print("\n=== per-program cost analysis (v5e: %.0f TF/s bf16, %.0f GB/s HBM) ==="
          % (V5E_PEAK_BF16_TFLOPS, V5E_HBM_GBPS))
    for r in rows:
        print(json.dumps(r))
    print("\n=== analytic VGG (MXU) accounting ===")
    print(json.dumps(analytic))
    result = {"rows": rows, "analytic": analytic, "batch": B, "img": IMG}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
    print("\nRESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
