import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from harp_tpu.render import pipeline
from harp_tpu.render import camera as cam_mod
from harp_tpu.render.rasterizer import RasterConfig, _bin_faces, as_faces_array
from harp_tpu.render.pallas import raster_kernel as rk
import __graft_entry__ as ge

B = 8
assets, config, rcfg, params = ge._build(448, 512, n_frames=B)
fids = jnp.arange(B)
verts, _ = pipeline.mesh_forward(params, fids, assets, config)
R, T = pipeline.camera_for_frames(params, fids, config)
screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, config.img_size)
faces = as_faces_array(assets.render_faces)

def timeit(name, f, *a, n=10):
    out = f(*a); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(n):
        out = f(*a); jax.block_until_ready(out)
    print('%-28s %.1f ms' % (name, (time.time()-t0)/n*1e3))
    return out

# 1. binning only
f_bin = jax.jit(lambda s: _bin_faces(s[:, faces], rcfg)[:2])
tile_ids, counts = timeit('bin', f_bin, screen)

# 2. bin + compaction + pre-gather (everything before the kernel)
cfg = rcfg
T_ = (cfg.image_size//cfg.tile)**2
A = min(max(-(-int(T_*cfg.active_fraction)//rk.TC),1)*rk.TC, T_)
def pregather(s):
    fv = s[:, faces]
    tile_ids, counts, _ = _bin_faces(fv, cfg)
    _, act_idx = jax.lax.top_k(counts, A)
    act_idx = act_idx.astype(jnp.int32)
    tile_ids_a = jnp.take_along_axis(tile_ids, act_idx[:,:,None], axis=1)
    counts_a = jnp.minimum(jnp.take_along_axis(counts, act_idx, axis=1), cfg.cap).astype(jnp.int32).reshape(-1)
    fv_pack = jnp.concatenate([fv.reshape(B,-1,9), jnp.zeros((B, fv.shape[1], rk.ROW-9), s.dtype)], -1)
    safe = jnp.maximum(tile_ids_a,0).reshape(B, A*cfg.cap)
    fvt = jnp.take_along_axis(fv_pack, safe[:,:,None], axis=1)
    fvt = jnp.where((tile_ids_a>=0).reshape(B,A*cfg.cap)[:,:,None], fvt, 0.0)
    return fvt.reshape(B, A//rk.TC, rk.TC, cfg.cap, rk.ROW), counts_a, act_idx, tile_ids_a
f_pre = jax.jit(pregather)
fvt, counts_a, act_idx, tile_ids_a = timeit('bin+topk+pre-gather', f_pre, screen)

# 3. kernel alone (fixed inputs)
nt = cfg.image_size//cfg.tile
P = cfg.tile*cfg.tile
K = cfg.faces_per_pixel
kernel = partial(rk._kernel, cfg=cfg, K=K, nt=nt, A=A)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(B, A//rk.TC),
    in_specs=[pl.BlockSpec((1,1,rk.TC,cfg.cap,rk.ROW), lambda b,t,c,a:(b,t,0,0,0))],
    out_specs=[
        pl.BlockSpec((1,rk.TC,P), lambda b,t,c,a:(b*(A//rk.TC)+t,0,0)),
        pl.BlockSpec((1,rk.TC,K,P), lambda b,t,c,a:(b*(A//rk.TC)+t,0,0,0)),
        pl.BlockSpec((1,rk.TC,P), lambda b,t,c,a:(b*(A//rk.TC)+t,0,0)),
    ])
f_k = jax.jit(lambda c,a,f: pl.pallas_call(kernel, grid_spec=grid_spec,
    out_shape=[jax.ShapeDtypeStruct((B*(A//rk.TC),rk.TC,P), jnp.int32),
               jax.ShapeDtypeStruct((B*(A//rk.TC),rk.TC,K,P), jnp.int32),
               jax.ShapeDtypeStruct((B*(A//rk.TC),rk.TC,P), jnp.float32)])(c,a,f))
timeit('kernel alone', f_k, counts_a, act_idx.reshape(-1), fvt)

# 4. full compact
f_palc = jax.jit(lambda s: rk.pallas_raster_compact(s, faces, rcfg))
timeit('pallas compact e2e', f_palc, screen)
print('counts: max %d mean-active %.1f  A=%d' % (np.asarray(counts).max(), np.asarray(jnp.take_along_axis(counts, act_idx, axis=1)).mean(), A))
