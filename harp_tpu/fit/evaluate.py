"""Post-optimization evaluation + export loop (reference
optimize_sequence.py:598-816).

Per frame: silhouette / RGB (with shadow per config) / normal renders,
GT|pred|normal|overlay composites; batched image metrics (IoU, L1,
LPIPS-style, MS-SSIM) every `eval_batch` frames; optional Procrustes-aligned
vertex error against synthetic GT meshes; texture/normal-map PNG export;
turntable + light-sweep renders for frame 0; eval_results[_test].txt.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from harp_tpu.assets import AvatarAssets
from harp_tpu.config import HarpConfig
from harp_tpu.eval.metrics import image_eval, align_w_scale
from harp_tpu.fit.driver import FitData
from harp_tpu.losses.perceptual import Vgg16Features
from harp_tpu.render import pipeline
from harp_tpu.render.rasterizer import RasterConfig
from harp_tpu.render.shadow import render_rgb_with_shadow
from harp_tpu.utils import viz


def load_gt_vert(frame_idx: int, gt_mesh_dir: str, start_from_one: bool = True,
                 idx_offset: int = 500) -> np.ndarray:
    """Synthetic-GT vertex loader (eval_util.py:63-70); returns meters."""
    num = idx_offset + frame_idx + (1 if start_from_one else 0)
    return np.loadtxt(os.path.join(gt_mesh_dir, f"{num}_manov.xyz")) / 1000.0


def _render_frame_batch(params, fids, assets, config, rcfg):
    verts, joints = pipeline.mesh_forward(params, fids, assets, config)
    R, T = pipeline.camera_for_frames(params, fids, config)
    if config.share_light_position:
        light = jnp.broadcast_to(params["light_positions"][0], (fids.shape[0], 3))
    else:
        light = params["light_positions"][fids]
    alpha = pipeline.render_silhouette(verts, assets, R, T, config, rcfg)
    if config.self_shadow:
        rgb = render_rgb_with_shadow(
            verts, assets, config, rcfg, params["cam"][fids], light,
            params["amb_ratio"], params["texture"], params["normal_map"],
        )
    else:
        rgb = pipeline.render_rgb(
            verts, assets, R, T, config, rcfg, params["texture"],
            params["normal_map"], light,
        )
    normal_img = pipeline.render_normal(
        verts, assets, R, T, config, rcfg, params.get("normal_map")
    )
    return verts, alpha, rgb, normal_img


def evaluate_sequence(config: HarpConfig, assets: AvatarAssets, data: FitData,
                      params: dict, aux: dict,
                      rcfg: RasterConfig | None = None,
                      out_dir: str | None = None,
                      vgg: Vgg16Features | None = None,
                      eval_batch: int = 64, render_batch: int = 8,
                      save_images: bool = True, turntables: bool = False) -> dict:
    rcfg = rcfg or config.raster_config()
    out_dir = out_dir or config.base_output_dir
    test_name = "_test" if config.known_appearance else ""
    img_dir = os.path.join(out_dir, "rendered_after_opt" + test_name)
    if save_images:
        os.makedirs(img_dir, exist_ok=True)
    if vgg is None:
        vgg = Vgg16Features.create(weights_path=config.vgg_weights or None)

    n = data.num_frames
    pending = {"ref_image": [], "ref_mask": [], "pred_image": [], "pred_mask": []}
    perc_key = "LPIPS" if vgg.source == "pretrained" else "LPIPS_proxy"
    stats_acc = {"Silhouette IoU": [], "L1": [], perc_key: [], "MS_SSIM": []}
    vert_errs = []

    render_jit = jax.jit(
        lambda p, f: _render_frame_batch(p, f, assets, config, rcfg)
    )
    # Align the batch to the frame count when possible: a ragged tail batch
    # is a SECOND compile of the 3-render program (~20-30 s on the tunnel),
    # which dwarfs any per-batch efficiency difference.
    if n % render_batch:
        aligned = max(
            (b for b in range(2, render_batch + 1) if n % b == 0), default=0
        )
        if aligned >= max(2, render_batch // 2):
            render_batch = aligned
    for start in range(0, n, render_batch):
        fids = jnp.arange(start, min(start + render_batch, n))
        verts, alpha, rgb, normal_img = render_jit(params, fids)
        alpha_np = np.asarray(alpha)
        rgb_np = np.asarray(rgb)
        normal_np = np.asarray(normal_img)

        for bi, f in enumerate(np.asarray(fids)):
            pending["ref_image"].append(np.asarray(data.images[f])[None])
            pending["ref_mask"].append(np.asarray(data.masks[f])[None])
            pending["pred_image"].append(rgb_np[bi][None])
            pending["pred_mask"].append(alpha_np[bi][None])
            if save_images:
                comp = viz.frame_composite(
                    np.asarray(data.images[f]), rgb_np[bi], normal_np[bi],
                    np.asarray(data.masks[f]), alpha_np[bi],
                )
                viz.save_image(comp, os.path.join(img_dir, "%04d.jpg" % f))
            if len(pending["ref_image"]) >= eval_batch:
                st = image_eval(pending, vgg=vgg)
                for k, v in st.items():
                    stats_acc[k].append(v)
                pending = {k: [] for k in pending}

            if config.eval_mesh and config.gt_mesh_dir:
                gt_v = load_gt_vert(int(f), config.gt_mesh_dir)
                if config.use_arm:
                    mano_idx = np.asarray(assets.model.mano_vert_from_arm)
                    pred_v = np.asarray(verts)[bi, mano_idx]
                else:
                    pred_v = np.asarray(verts)[bi, : gt_v.shape[0]]
                aligned = align_w_scale(gt_v, pred_v)
                vert_errs.append(
                    float(np.linalg.norm(gt_v - aligned, axis=1).mean() * 1000.0)
                )

        if turntables and start == 0:
            rgb_dir = viz.render_360(params, 0, assets, config, rcfg, out_dir)
            nrm_dir = viz.render_360(
                params, 0, assets, config, rcfg, out_dir, render_normal=True
            )
            viz.concat_image_dirs(
                rgb_dir, nrm_dir, os.path.join(out_dir, "render_360_combine")
            )
            viz.render_360_light(params, 0, assets, config, rcfg, out_dir)

    if pending["ref_image"]:
        st = image_eval(pending, vgg=vgg)
        for k, v in st.items():
            stats_acc[k].append(v)

    final = {k: float(np.mean(v)) for k, v in stats_acc.items() if v}
    if vert_errs:
        final["Procrustes-aligned vertex error (mm)"] = float(np.mean(vert_errs))
        np.savetxt(os.path.join(out_dir, "eval_vert_mm" + test_name + ".txt"), vert_errs)

    if save_images:
        viz.save_texture_maps(params, aux.get("uv_mask"), out_dir)
        with open(os.path.join(out_dir, "eval_results" + test_name + ".txt"), "w") as f:
            for k, v in final.items():
                f.write(" %s: %.5f\n" % (k, v))
    return final
