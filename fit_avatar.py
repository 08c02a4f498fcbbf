#!/usr/bin/env python
"""CLI entry point: fit a personalized hand avatar to a video sequence.

The TPU-native counterpart of `python optimize_sequence.py` (reference main(),
optimize_sequence.py:819-838), with an argparse front-end instead of a
hard-coded config dict. With --synthetic it runs fully hermetically on the
procedural hand (no registration-gated assets or data needed).

Examples:
  python fit_avatar.py --synthetic --img-size 224 --epochs 30
  python fit_avatar.py --metro-output-dir data/1 --image-dir data/1 \
      --train-list 1 2 --mano-pkl mano/models/MANO_RIGHT.pkl
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--synthetic", action="store_true",
                   help="fit a synthetic GT sequence (hermetic demo/e2e run)")
    p.add_argument("--use-arm", action="store_true")
    p.add_argument("--img-size", type=int, default=448)
    p.add_argument("--texture-size", type=int, default=512)
    p.add_argument("--epochs", type=int, default=301)
    p.add_argument("--stages", type=int, nargs=3, default=[100, 100, 100])
    p.add_argument("--batch-size", type=int, default=18)
    p.add_argument("--no-shadow", action="store_true")
    p.add_argument("--no-vgg", action="store_true")
    p.add_argument("--known-appearance", action="store_true")
    p.add_argument("--start-from", default="")
    p.add_argument("--out", default="exp/out/")
    p.add_argument("--n-frames", type=int, default=8, help="synthetic frames")
    p.add_argument("--density", default="reference", choices=["light", "reference"],
                   help="synthetic mesh density: 'reference' matches the "
                        "reference workload (3088 verts / 6152 faces hand)")
    p.add_argument("--raster-cap", type=int, default=None,
                   help="per-tile face capacity (default 448, probed for "
                        "reference density; use 256 for light meshes)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shape-seed", type=int, default=None,
                   help="synthetic GT identity seed: pass the SAME value to "
                        "two runs with different --seed to get the same "
                        "hand under different motions (the known-appearance "
                        "transfer setting)")
    # Real-data paths (reference directory layout).
    p.add_argument("--metro-output-dir", default="")
    p.add_argument("--image-dir", default="")
    p.add_argument("--train-list", nargs="*", default=["1"])
    p.add_argument("--val-list", nargs="*", default=[])
    p.add_argument("--use-smooth-seq", action="store_true", default=True)
    p.add_argument("--mano-pkl", default="", help="MANO_RIGHT.pkl path")
    p.add_argument("--smplx-npz", default="", help="SMPLX_NEUTRAL.npz path")
    p.add_argument("--arm-corr", default="template/arm/smplx_arm_corr.pkl")
    # The reference always renders frame-0 turntable + light-sweep GIFs
    # (optimize_sequence.py:717-727); they are cheap now that renders are
    # fused, so protocol runs default them ON.
    p.add_argument("--turntables", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--anchor", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run the fixed container-fingerprint microbench "
                        "before the fit and record it in fit_summary.json "
                        "(makes wall-clock numbers comparable across "
                        "containers; harp_tpu.utils.anchor)")
    p.add_argument("--active-tiles", type=float, default=None,
                   help="raster tile budget fraction; default 0.28 at "
                        ">=256px (occupied tiles measured mean 140 / max "
                        "146 of 784 at 448^2 reference density — "
                        "scripts/probe_occupancy.py; overflow counters in "
                        "logs flag an insufficient budget), 1.0 below")
    p.add_argument("--uint8-frames", action="store_true",
                   help="store the sequence frames/masks as uint8 in HBM "
                        "(4x smaller; decoded to f32 in-graph per "
                        "minibatch). Lets 300-500 frame sequences fit on "
                        "one chip; images round to 8 bits at ingest.")
    p.add_argument("--debug-nans", action="store_true")
    p.add_argument("--epoch-scan", type=int, default=10,
                   help="fuse N epochs per device dispatch (lax.scan) when "
                        "no host-side logging falls inside the segment; "
                        "0/1 = per-step dispatch loop")
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="fit THIS sequence data-parallel over N devices "
                        "(frame-axis sharding; batch-size must divide by N); "
                        "0 = single device")
    p.add_argument("--resume-orbax", default="",
                   help="resume a fit mid-protocol from an Orbax checkpoint "
                        "directory (restores params+optimizer+epoch+lr "
                        "scale; pairs with --checkpoint-backend orbax)")
    p.add_argument("--checkpoint-backend", default="pickle",
                   choices=["pickle", "orbax"])
    p.add_argument("--reference-exact", action="store_true",
                   help="HarpConfig.reference_exact(): restore the "
                        "reference's numeric semantics in one flag "
                        "(full-res shadow map, f32 VGG both sides without "
                        "the GT cache, K=50 soft list, span 4, every tile "
                        "rasterized); the fast-path defaults deviate in "
                        "those five measured, disclosed ways")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    # The container's sitecustomize may force-register a TPU plugin and
    # override jax_platforms to "axon,cpu" at interpreter startup, which
    # silently discards an explicit JAX_PLATFORMS=cpu from the caller (and
    # hangs hermetic CPU runs when the TPU tunnel is down). Re-apply the
    # env var so it keeps its standard JAX semantics.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np
    from harp_tpu.config import HarpConfig
    from harp_tpu.fit import init_params, FitData, fit_sequence
    from harp_tpu.fit.evaluate import evaluate_sequence, make_eval_program
    from harp_tpu.fit.resume import prepare_resume_params
    from harp_tpu.losses.perceptual import Vgg16Features
    from harp_tpu.utils.io import save_result
    from harp_tpu.utils.profiling import Timer

    make_config = (HarpConfig.reference_exact if args.reference_exact
                   else HarpConfig)
    cfg_kw = dict(
        use_arm=args.use_arm,
        img_size=args.img_size,
        focal_length=2000.0 * args.img_size / 448.0,
        texture_size=args.texture_size,
        total_epoch=args.epochs,
        training_stage=tuple(args.stages),
        batch_size=args.batch_size,
        self_shadow=not args.no_shadow,
        w_vgg=0.0 if args.no_vgg else 1.0,
        known_appearance=args.known_appearance,
        raster_cap=(args.raster_cap if args.raster_cap is not None
                    else (448 if args.density == "reference" else 256)),
        start_from=args.start_from,
        base_output_dir=args.out,
        metro_output_dir=args.metro_output_dir,
        image_dir=args.image_dir,
        checkpoint_backend=args.checkpoint_backend,
    )
    # With --reference-exact the preset's active_fraction=1.0 stands unless
    # the user explicitly budgeted tiles.
    if args.active_tiles is not None:
        cfg_kw["raster_active_fraction"] = args.active_tiles
    elif not args.reference_exact:
        cfg_kw["raster_active_fraction"] = (
            0.28 if args.img_size >= 256 else 1.0
        )
    config = make_config(**cfg_kw)
    os.makedirs(config.base_output_dir, exist_ok=True)
    config.to_yaml(os.path.join(config.base_output_dir, "config.yaml"))
    rcfg = config.raster_config()

    # --- assets ---
    if args.synthetic:
        from harp_tpu.assets import build_synthetic_assets, build_synthetic_arm_assets

        assets = (build_synthetic_arm_assets(uv_size=args.texture_size,
                                             density=args.density)
                  if args.use_arm else
                  build_synthetic_assets(uv_size=args.texture_size,
                                         density=args.density))
    elif args.use_arm:
        from harp_tpu.assets import AvatarAssets, load_obj_with_uv
        from harp_tpu.models.smplx_arm import load_smplx_arm
        from harp_tpu.ops.mesh import build_topology, build_subdivision

        model = load_smplx_arm(args.smplx_npz, args.arm_corr)
        n_arm = model.arm_vert_idx.shape[0]
        coarse = build_topology(model.arm_faces, n_arm)
        sub = build_subdivision(coarse)
        sub_topology = build_topology(sub.faces, sub.num_verts)
        _, _, verts_uvs, faces_uvs = load_obj_with_uv("template/arm/arm_template.obj")
        from PIL import Image

        uv_mask = np.asarray(
            Image.open("template/arm/uv_mask.png").convert("L")
        ).astype(np.float32) / 255.0
        assets = AvatarAssets(
            model=model, coarse_topology=coarse, subdivision=sub,
            sub_topology=sub_topology, verts_uvs=verts_uvs,
            faces_uvs=faces_uvs, uv_mask=uv_mask,
        )
    else:
        from harp_tpu.assets import (
            AvatarAssets, load_mano_model, load_obj_with_uv,
        )
        from harp_tpu.ops.mesh import build_topology, build_subdivision

        model = load_mano_model(args.mano_pkl, flat_hand_mean=False)
        coarse = build_topology(model.faces, model.num_verts)
        sub = build_subdivision(coarse)
        sub_topology = build_topology(sub.faces, sub.num_verts)
        _, _, verts_uvs, faces_uvs = load_obj_with_uv("template/hand/textured_hand.obj")
        from PIL import Image

        uv_mask = np.asarray(
            Image.open("template/hand/uv_mask.png").convert("L")
        ).astype(np.float32) / 255.0
        assets = AvatarAssets(
            model=model, coarse_topology=coarse, subdivision=sub,
            sub_topology=sub_topology, verts_uvs=verts_uvs,
            faces_uvs=faces_uvs, uv_mask=uv_mask,
        )

    # --- data ---
    if args.synthetic:
        from harp_tpu.data.synthetic import make_synthetic_sequence
        from harp_tpu.fit.driver import prewarm_stage_programs

        # The stage-scan executables' shapes depend only on
        # (config, assets, n_frames): start their compiles NOW so they ride
        # alongside the synthetic GT generation below instead of serially
        # heading the fit. Both distinct programs prewarm — stage 1
        # (cold-cache anatomy: ~40-60 s first-program wait) AND the shared
        # app-stage scan, whose ~86 s compile stage 1 is too short to cover
        # (r5 cold anatomy: a 61.8 s wait at the stage-2 boundary).
        if not args.mesh_devices:
            prewarm_stage_programs(
                config, assets, args.n_frames, rcfg,
                epoch_scan=args.epoch_scan,
                stage_epochs=(0, config.training_stage[0]),
                frames_dtype=(jnp.uint8 if args.uint8_frames
                              else jnp.float32),
            )
        images, masks, masks_er, gt, input_params = make_synthetic_sequence(
            assets, config, rcfg, n_frames=args.n_frames, seed=args.seed,
            shape_seed=args.shape_seed,
        )
    else:
        from harp_tpu.data.dataset import load_sequences

        input_params, images, masks, masks_er = load_sequences(
            config.metro_output_dir, config.image_dir, args.train_list,
            use_smooth_seq=args.use_smooth_seq,
        )
        images, masks, masks_er = map(jnp.asarray, (images, masks, masks_er))
    if args.uint8_frames:
        enc = jax.jit(lambda x: jnp.round(
            jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8))
        images, masks, masks_er = enc(images), enc(masks), enc(masks_er)
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    val = None
    if args.val_list and not args.synthetic:
        from harp_tpu.data.dataset import load_sequences as _ls

        v_params, v_img, v_mask, v_er = _ls(
            config.metro_output_dir, config.image_dir, args.val_list,
            use_smooth_seq=args.use_smooth_seq,
        )
        val = (v_params, FitData(images=jnp.asarray(v_img),
                                 masks=jnp.asarray(v_mask),
                                 masks_eroded=jnp.asarray(v_er)))

    # --- params ---
    params, aux = init_params(input_params, assets, config)
    if config.start_from:
        params = prepare_resume_params(config.start_from, input_params, config)
    resume_payload = None
    if args.resume_orbax:
        # Mid-protocol resume: params + optimizer moments + epoch cursor +
        # plateau lr state, from either checkpoint backend.
        from harp_tpu.fit.resume import load_fit_checkpoint

        resume_payload = load_fit_checkpoint(args.resume_orbax, params, config)
        params = resume_payload["params"]
        print(f"resuming at epoch {int(resume_payload['epoch']) + 1} "
              f"from {args.resume_orbax}")
    mesh = None
    if args.mesh_devices:
        from harp_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(args.mesh_devices)

    # --- fit ---
    # out_dir enables the reference driver's observability: per-epoch JSONL
    # scalars incl. raster-overflow counters, image pair grids, periodic
    # checkpoints, and (with a val set) held-out render grids.
    val_kwargs = {}
    if val is not None:
        v_input, v_data = val
        v_params = {k: jnp.asarray(v) for k, v in v_input.items()}
        val_kwargs = dict(val_data=v_data, val_params=v_params)

    # AOT-prefetch the fused eval pass: its executable compiles/loads in
    # fit_sequence's prefetch thread while the last stage trains, so the
    # post-fit eval starts hot instead of paying its compile+load serially.
    import threading

    eval_vgg = Vgg16Features.create(weights_path=config.vgg_weights or None)
    eval_prog, _ = make_eval_program(config, assets, data, rcfg, eval_vgg)
    eval_vgg_params = tuple(
        (jnp.asarray(w), jnp.asarray(b)) for (w, b) in eval_vgg.params
    )
    eval_holder = {}
    eval_ready = threading.Event()
    _abs = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype)
    p_abs = jax.tree.map(_abs, params)
    eval_abs = (p_abs, _abs(data.images), _abs(data.masks),
                jax.tree.map(_abs, eval_vgg_params))

    def _compile_eval():
        try:
            eval_holder["prog"] = eval_prog.lower(*eval_abs).compile()
        finally:
            eval_ready.set()

    anchor = {}
    if args.anchor:
        from harp_tpu.utils.anchor import container_anchor

        anchor = container_anchor()
        print("container anchor:", json.dumps(anchor))

    prefetch_extra = [_compile_eval]
    if args.turntables:
        from harp_tpu.utils import viz as _viz

        # Warm the three turntable/light-sweep programs on the prefetch
        # lanes with a COPY of the initial params (shapes are all that
        # matter; the rendered views are discarded) so the post-fit eval
        # hits a warm jit cache instead of paying ~60-90 s of serial
        # compiles. The copy matters: the fit's first scan call donates
        # the original buffers, and the prefetch lane runs concurrently.
        p_warm = jax.tree.map(jnp.array, params)

        def _compile_turntables():
            _viz.prewarm_turntables(p_warm, assets, config, rcfg)

        prefetch_extra.append(_compile_turntables)

    with Timer() as t_fit:
        params, history = fit_sequence(
            config, assets, data, params, aux, rcfg=rcfg,
            out_dir=config.base_output_dir, image_log_every=10,
            mesh=mesh, resume=resume_payload, epoch_scan=args.epoch_scan,
            prefetch_extra=prefetch_extra,
            **val_kwargs,
        )
    save_result(params, config.base_output_dir, test=config.known_appearance)

    # --- evaluate ---
    with Timer() as t_eval:
        # If the prefetch thread is still mid-compile, finishing its AOT
        # load beats recompiling the same program through the jit path.
        eval_ready.wait(timeout=300)
        stats = evaluate_sequence(
            config, assets, data, params, aux, rcfg=rcfg,
            turntables=args.turntables, vgg=eval_vgg,
            eval_program=eval_holder.get("prog") or eval_prog,
        )
        if val is not None:
            # Validation sequences: optimized shared appearance + their own
            # preprocessing pose/cam (reference visualize_val semantics).
            v_input, v_data = val
            v_fit = dict(params)
            for k in ("pose", "rot", "trans", "cam"):
                v_fit[k] = jnp.asarray(v_input[k], jnp.float32)
            n_val = v_fit["pose"].shape[0]
            v_fit["wrist_pose"] = jnp.zeros((n_val, 3), jnp.float32)
            v_fit["light_positions"] = jnp.broadcast_to(
                params["light_positions"][0], (n_val, 3)
            )
            val_stats = evaluate_sequence(
                config, assets, v_data, v_fit, aux, rcfg=rcfg,
                out_dir=os.path.join(config.base_output_dir, "val"),
            )
            stats.update({f"val {k}": v for k, v in val_stats.items()})
    stats["fit_wall_s"] = round(t_fit.elapsed, 2)
    stats["eval_wall_s"] = round(t_eval.elapsed, 2)
    stats.update(anchor)
    stats["final_loss"] = history[-1]["loss"] if history else None
    print(json.dumps(stats, indent=2))
    with open(os.path.join(config.base_output_dir, "fit_summary.json"), "w") as f:
        json.dump(stats, f, indent=2)


if __name__ == "__main__":
    main()
