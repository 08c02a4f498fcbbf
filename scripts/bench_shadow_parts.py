"""Shadow-path component timing at 448^2 (dense mesh): light raster,
reprojection/PCF, camera shading — forward and backward."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time
import jax, jax.numpy as jnp, numpy as np
from harp_tpu.render import pipeline, camera as cam_mod
from harp_tpu.render.rasterizer import (
    RasterConfig, raster_compact, as_faces_array, tile_pixel_coords,
    barycentrics_of_at, scatter_tiles,
)
from harp_tpu.render import shading
from harp_tpu.render.shadow import shadow_cameras, pcf_visibility
import __graft_entry__ as ge

B = int(os.environ.get('BENCH_B', '18'))
assets, config, rcfg, params = ge._build(448, 512, n_frames=B)
fids = jnp.arange(B)
verts0, _ = pipeline.mesh_forward(params, fids, assets, config)
R, T = pipeline.camera_for_frames(params, fids, config)
faces = as_faces_array(assets.render_faces)
H = config.img_size

def timeit(name, f, *a, n=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print('%-36s %.1f ms' % (name, (time.time()-t0)/n*1e3))
    return out

cam = params['cam'][fids]
light = jnp.broadcast_to(params['light_positions'][0], (B, 3))

def light_depth(verts, scale):
    hand_center = verts.mean(axis=1)
    light_R, light_T, _, _ = shadow_cameras(cam, light, hand_center, config)
    Hl = int(round(H * scale))
    focal_l = config.focal_length * scale
    rcfg_l = rcfg if Hl == H else dataclasses.replace(rcfg, image_size=Hl)
    screen_l = cam_mod.screen_from_world(verts, light_R, light_T, focal_l, Hl)
    lout = raster_compact(screen_l, faces, rcfg_l, False, True)
    lpx, lpy = tile_pixel_coords(lout['act_idx'], rcfg_l)
    _, z_l, mask_l = barycentrics_of_at(lout['hard_ids'], screen_l, faces,
                                        rcfg_l, lpx, lpy)
    depth_c = jnp.where(mask_l, z_l, -1.0)
    return scatter_tiles(depth_c, lout['act_idx'], rcfg_l, -1.0)

for s in (1.0, 0.5):
    timeit('light depth fwd scale=%.1f' % s,
           jax.jit(lambda v, s=s: light_depth(v, s)), verts0)
    timeit('light depth fwd+bwd scale=%.1f' % s,
           jax.jit(lambda v, s=s: jax.grad(
               lambda vv: light_depth(vv, s).sum())(v)), verts0)

# camera raster (shared with silhouette in the real step)
rout = jax.jit(lambda v: raster_compact(
    cam_mod.screen_from_world(v, R, T, config.focal_length, H),
    faces, rcfg, True, True))(verts0)
rout = jax.tree.map(jax.lax.stop_gradient, rout)

def full_shadow_vis(verts, scale):
    from harp_tpu.render.shadow import shadow_visibility_compact
    cfg2 = dataclasses.replace(config, shadow_map_scale=scale)
    screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, H)
    vis, *_ = shadow_visibility_compact(
        verts, assets, cfg2, rcfg, cam, light, screen, rout)
    return vis

for s in (1.0, 0.5):
    timeit('shadow vis fwd scale=%.1f' % s,
           jax.jit(lambda v, s=s: full_shadow_vis(v, s)), verts0)
    timeit('shadow vis fwd+bwd scale=%.1f' % s,
           jax.jit(lambda v, s=s: jax.grad(
               lambda vv: full_shadow_vis(vv, s).sum())(v)), verts0)

# camera-side shading given the raster (fwd and bwd w.r.t. verts+texture)
def shade(verts, texture):
    screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, H)
    rgb_c, mask_c = pipeline.shade_pixels_compact(
        verts, screen, rout, assets, R, T, config, rcfg,
        texture, params['normal_map'], light,
        config.ambient_color, config.diffuse_color, config.specular_color,
        shininess=config.shininess,
    )
    return rgb_c

timeit('camera shading fwd', jax.jit(shade), verts0, params['texture'])
timeit('camera shading fwd+bwd',
       jax.jit(lambda v, t: jax.grad(
           lambda vv, tt: shade(vv, tt).sum(), argnums=(0, 1))(v, t)),
       verts0, params['texture'])

# silhouette alpha backward (pack path)
from harp_tpu.render.rasterizer import soft_alpha_fast_pack
def sil(verts):
    screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, H)
    return soft_alpha_fast_pack(rout['soft_sum'], rout['pack'], screen,
                                faces, rcfg)
timeit('sil alpha fwd+bwd (pallas pack)',
       jax.jit(lambda v: jax.grad(lambda vv: sil(vv).sum())(v)), verts0)

# raster itself
timeit('camera raster_compact', jax.jit(lambda v: raster_compact(
    cam_mod.screen_from_world(v, R, T, config.focal_length, H),
    faces, rcfg, True, True)['hard_ids']), verts0)
