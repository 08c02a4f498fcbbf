"""Probe the PCF gradient band at protocol scale: how many 256-pixel camera
tiles per frame have any tap inside the f32 sigmoid derivative band.

Sizes HarpConfig.pcf_grad_tiles (the band-compacted backward's budget in
render/shadow._pcf_sum): the budget is exact iff it covers every in-band
group, so the default must carry headroom over the measured peak across
poses/lights. Run on the bench scene (reference density, 448^2, B18).

Usage: python scripts/probe_pcf_band.py [--img 448] [--frames 18] [--sweeps 8]
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
    ap.add_argument("--sweeps", type=int, default=8)
    args = ap.parse_args()

    from __graft_entry__ import _build
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params
    from harp_tpu.render import pipeline
    from harp_tpu.render import camera as cam_mod
    from harp_tpu.render.shadow import (
        shadow_cameras, light_raster_config, pcf_band_groups,
    )
    from harp_tpu.render.rasterizer import (
        raster_compact, as_faces_array, tile_pixel_coords, barycentrics_of_at,
        scatter_tiles,
    )
    from harp_tpu.render import shading

    assets, config, rcfg, _ = _build(args.img, 512, n_frames=args.frames)
    _, _, _, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=args.frames, seed=0)
    params, aux = init_params(init, assets, config)

    faces = as_faces_array(assets.render_faces)
    fids = jnp.arange(args.frames)

    @jax.jit
    def band_for(params):
        verts, _ = pipeline.mesh_forward(params, fids, assets, config)
        R, T = pipeline.camera_for_frames(params, fids, config)
        screen, rout = pipeline.raster_camera_view_compact(
            verts, assets, R, T, config, rcfg, need_soft=False, need_hard=True)
        hand_center = verts.mean(axis=1)
        light = jnp.broadcast_to(params["light_positions"][0],
                                 (args.frames, 3))
        light_R, light_T, cam_R, cam_T = shadow_cameras(
            params["cam"][fids], light, hand_center, config)
        H = config.img_size
        s = config.shadow_map_scale
        Hl = int(round(H * s))
        focal_l = config.focal_length * s
        rcfg_l = light_raster_config(rcfg, s)
        screen_l = cam_mod.screen_from_world(verts, light_R, light_T, focal_l, Hl)
        lout = raster_compact(screen_l, faces, rcfg_l, False, True)
        lpx, lpy = tile_pixel_coords(lout["act_idx"], rcfg_l)
        _, z_l, mask_l = barycentrics_of_at(lout["hard_ids"], screen_l, faces,
                                            rcfg_l, lpx, lpy)
        depth_light = scatter_tiles(jnp.where(mask_l, z_l, -1.0),
                                    lout["act_idx"], rcfg_l, -1.0)
        px, py = tile_pixel_coords(rout["act_idx"], rcfg)
        bary_c, _, _ = barycentrics_of_at(rout["hard_ids"], screen, faces,
                                          rcfg, px, py)
        points = shading.interpolate_face_vertex_attrs(
            verts, faces, rout["hard_ids"], bary_c)
        B, A, P = rout["hard_ids"].shape
        view_l = cam_mod.world_to_view(points.reshape(B, -1, 3), light_R, light_T)
        a = view_l[..., 2].reshape(B, A, P) - config.shadow_bias
        spts = cam_mod.view_to_screen(view_l, focal_l, Hl)
        x = jnp.round(spts[..., 0]).astype(jnp.int32).reshape(B, A, P)
        y = jnp.round(spts[..., 1]).astype(jnp.int32).reshape(B, A, P)
        return pcf_band_groups(depth_light, x, y, a, config, group=P), A

    band, A = jax.device_get(band_for(params))
    print(f"A (active camera tiles): {A}")
    print(f"init pose band tiles/frame: mean {band.mean():.0f} "
          f"max {band.max()}")

    rng = np.random.RandomState(1)
    peaks = [int(band.max())]
    for i in range(args.sweeps):
        p2 = dict(params)
        p2["pose"] = params["pose"] + jnp.asarray(
            0.25 * rng.randn(*params["pose"].shape), jnp.float32)
        p2["light_positions"] = params["light_positions"] + jnp.asarray(
            0.5 * rng.randn(*params["light_positions"].shape), jnp.float32)
        b2, _ = jax.device_get(band_for(p2))
        peaks.append(int(b2.max()))
    print(f"pose/light jitter sweep peaks: max {max(peaks)}, "
          f"mean {np.mean(peaks):.0f}, all {peaks}")


if __name__ == "__main__":
    main()
