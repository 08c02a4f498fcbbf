import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from harp_tpu.assets import build_synthetic_assets
from harp_tpu.config import HarpConfig
from harp_tpu.render import pipeline
from harp_tpu.render import camera as cam_mod
from harp_tpu.render.rasterizer import RasterConfig, _rasterize_ids, as_faces_array
from harp_tpu.render.pallas.raster_kernel import pallas_rasterize, pallas_raster_compact
import __graft_entry__ as ge

B = 8
assets, config, rcfg, params = ge._build(448, 512, n_frames=B)
fids = jnp.arange(B)
verts, _ = pipeline.mesh_forward(params, fids, assets, config)
R, T = pipeline.camera_for_frames(params, fids, config)
screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, config.img_size)
faces = as_faces_array(assets.render_faces)
print('screen', screen.shape, 'faces', faces.shape, 'cfg cap', rcfg.cap, 'af', rcfg.active_fraction)

# XLA path
f_xla = jax.jit(lambda s: _rasterize_ids(s, faces, rcfg, True, True))
out_x = f_xla(screen); jax.block_until_ready(out_x)
t0=time.time()
for _ in range(10):
    out_x = f_xla(screen); jax.block_until_ready(out_x)
t_xla = (time.time()-t0)/10
print('XLA full raster: %.1f ms' % (t_xla*1e3))

# Pallas path
f_pal = jax.jit(lambda s: pallas_rasterize(s, faces, rcfg))
out_p = f_pal(screen); jax.block_until_ready(out_p)
t0=time.time()
for _ in range(10):
    out_p = f_pal(screen); jax.block_until_ready(out_p)
t_pal = (time.time()-t0)/10
print('Pallas full raster: %.1f ms' % (t_pal*1e3))

# Pallas compact (no scatter)
f_palc = jax.jit(lambda s: pallas_raster_compact(s, faces, rcfg))
out_pc = f_palc(screen); jax.block_until_ready(out_pc)
t0=time.time()
for _ in range(10):
    out_pc = f_palc(screen); jax.block_until_ready(out_pc)
print('Pallas compact raster: %.1f ms' % ((time.time()-t0)/10*1e3))

# parity
hx = np.asarray(out_x['hard_ids']); hp = np.asarray(out_p[2])
print('hard agree:', (hx==hp).mean())
sx = np.sort(np.asarray(out_x['soft_ids']),-1); sp = np.sort(np.asarray(out_p[0]),-1)
print('soft agree:', (sx==sp).mean())
print('ssum close:', np.allclose(np.asarray(out_x['soft_sum']), np.asarray(out_p[1]), rtol=1e-4, atol=1e-5))
