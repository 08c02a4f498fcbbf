"""Probe the light-view per-tile bin peak at the protocol's appearance-stage
start: converged(=GT) pose + the INITIAL light position (fit/params.py
inits light_positions to (-0.5,-0.5,-0.5) before any appearance epoch has
moved it). The round-3 protocol logged light_bin_overflow=0.5 with
light_span_overflow=0 exactly at epoch 100 — a genuine per-tile cap excess
in the light view on the first shadowed step. This probe measures the peak
so the light-pass cap headroom (render/shadow.light_raster_config) is set
from data, not guesswork.

Usage: JAX_PLATFORMS=cpu python scripts/probe_light_cap.py [--img 448]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=448)
    ap.add_argument("--frames", type=int, default=18)
    ap.add_argument("--use-arm", action="store_true")
    args = ap.parse_args()

    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params
    from harp_tpu.render import pipeline, camera as cam_mod
    from harp_tpu.render.rasterizer import _bin_faces, as_faces_array
    from harp_tpu.render.shadow import shadow_cameras, light_raster_config
    from __graft_entry__ import _build

    assets, config, rcfg, _ = _build(args.img, 512, n_frames=args.frames,
                                     use_arm=args.use_arm)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=args.frames, seed=0)
    params, aux = init_params(init, assets, config)

    faces = as_faces_array(assets.render_faces)
    fids = jnp.arange(args.frames)

    def light_counts(p, light):
        verts, _ = pipeline.mesh_forward(p, fids, assets, config)
        hand_center = verts.mean(axis=1)
        light_R, light_T, _, _ = shadow_cameras(
            p["cam"][fids], light, hand_center, config)
        rcfg_l = light_raster_config(rcfg, config.shadow_map_scale)
        Hl = rcfg_l.image_size
        focal_l = config.focal_length * (Hl / config.img_size)
        screen_l = cam_mod.screen_from_world(verts, light_R, light_T, focal_l, Hl)
        _, counts, span = _bin_faces(screen_l[:, faces], rcfg_l)
        return counts, span, rcfg_l.cap

    # Case 1: the protocol's epoch-100 state — GT(converged) pose, init light.
    init_light = jnp.broadcast_to(jnp.asarray([-0.5, -0.5, -0.5]),
                                  (args.frames, 3)).astype(jnp.float32)
    c1, s1, cap = jax.jit(lambda p: light_counts(p, init_light))(params)
    # Case 2: the GT light (where the fit converges to).
    c2, s2, _ = jax.jit(lambda p: light_counts(p, gt["light_positions"][:args.frames]))(params)
    print(f"light cap = {cap}")
    print(f"init-light  peak {int(np.asarray(c1).max())}, span_trunc {int(np.asarray(s1).sum())}")
    print(f"gt-light    peak {int(np.asarray(c2).max())}, span_trunc {int(np.asarray(s2).sum())}")
    # Light-position jitter sweep around the unit directions.
    rng = np.random.RandomState(0)
    peak = 0
    for i in range(8):
        d = rng.randn(3).astype(np.float32)
        li = jnp.broadcast_to(jnp.asarray(d), (args.frames, 3))
        c, s, _ = jax.jit(lambda p, l: light_counts(p, l))(params, li)
        peak = max(peak, int(np.asarray(c).max()))
    print(f"8-direction sweep peak {peak}")


if __name__ == "__main__":
    main()
