"""Chained component timing of the full train step at 448^2 (B=8)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from harp_tpu.data.synthetic import make_synthetic_sequence
from harp_tpu.fit import init_params
from harp_tpu.fit.optimizer import build_optimizers
from harp_tpu.fit.driver import make_train_step, compute_losses
from harp_tpu.render import pipeline
from __graft_entry__ import _build

B = int(os.environ.get('BENCH_B', '8'))
assets, config, rcfg, _ = _build(448, 512, n_frames=B)
images, masks, masks_er, gt, init = make_synthetic_sequence(assets, config, rcfg, n_frames=B, seed=0)
params, aux = init_params(init, assets, config)
txs, opt_states, gm = build_optimizers(params, config)
ref_verts, _ = pipeline.mesh_forward(params, jnp.asarray([0]), assets, config)
ref_verts = ref_verts[0]
fids = jnp.arange(B)
key = jax.random.PRNGKey(0)
one = jnp.asarray(1.0, jnp.float32)

def chain_step(name, coarse_on, app_on, N=15):
    train_step = make_train_step(assets, config, rcfg, None, txs)
    p = jax.tree.map(jnp.array, params); s = jax.tree.map(jnp.array, opt_states)
    p, s, total, _ = train_step(p, s, aux, fids, images, masks, masks_er, ref_verts, key, one, coarse_on=coarse_on, app_on=app_on)
    jax.block_until_ready(total)
    t0 = time.time()
    for _ in range(N):
        p, s, total, _ = train_step(p, s, aux, fids, images, masks, masks_er, ref_verts, key, one, coarse_on=coarse_on, app_on=app_on)
    jax.block_until_ready((total, p))
    dt = (time.time()-t0)/N
    print('%-34s %.1f ms  (%.1f f/s)' % (name, dt*1e3, B/dt))

def chain_fn(name, f, N=15):
    out = f(params); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(N):
        out = f(params)
    jax.block_until_ready(out)
    print('%-34s %.1f ms' % (name, (time.time()-t0)/N*1e3))

import dataclasses
chain_step('full step (coarse+app)', True, True)
chain_step('coarse only', True, False)
chain_step('app only', False, True)

def loss_fwd(p):
    total, _ = compute_losses(p, aux, fids, images, masks, masks_er, assets, config, rcfg, None, ref_verts, key, True, True, None)
    return total
chain_fn('loss fwd only', jax.jit(loss_fwd))
chain_fn('loss fwd+bwd', jax.jit(lambda p: jax.grad(loss_fwd)(p)['pose']))

# no shadow
config_ns = dataclasses.replace(config, self_shadow=False)
def loss_ns(p):
    total, _ = compute_losses(p, aux, fids, images, masks, masks_er, assets, config_ns, rcfg, None, ref_verts, key, True, True, None)
    return total
chain_fn('fwd+bwd no shadow', jax.jit(lambda p: jax.grad(loss_ns)(p)['pose']))

# coarse losses only fwd+bwd
def loss_c(p):
    total, _ = compute_losses(p, aux, fids, images, masks, masks_er, assets, config, rcfg, None, ref_verts, key, True, False, None)
    return total
chain_fn('coarse fwd+bwd', jax.jit(lambda p: jax.grad(loss_c)(p)['pose']))

# app losses only
def loss_a(p):
    total, _ = compute_losses(p, aux, fids, images, masks, masks_er, assets, config, rcfg, None, ref_verts, key, False, True, None)
    return total
chain_fn('app fwd+bwd', jax.jit(lambda p: jax.grad(loss_a)(p)['pose']))
