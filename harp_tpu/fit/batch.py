"""Pod-scale batch fitting: optimize MANY sequences simultaneously
(BASELINE.json config 5; no reference equivalent — the reference fits one
sequence per GPU-process run).

Design: every per-sequence quantity (parameter pytree, optimizer state,
images, masks, anchors, ARAP reference) gains a leading sequence axis S; the
single-sequence `compute_losses` + masked-Adam update is vmapped over that
axis inside ONE jitted step. On a device mesh the sequence axis is sharded
(each device fits its own sequences; zero cross-device communication in the
common case — embarrassingly parallel, which is exactly why the frame
DataLoader model of the reference wastes a pod).

All sequences must share static shapes (frame count, image size, topology);
ragged sets are padded/bucketed by the caller.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from harp_tpu.assets import AvatarAssets
from harp_tpu.config import HarpConfig
from harp_tpu.fit.driver import compute_losses, stage_flags
from harp_tpu.fit.optimizer import build_optimizers, PlateauState, plateau_update
from harp_tpu.losses import Vgg16Features
from harp_tpu.render import pipeline
from harp_tpu.render.rasterizer import RasterConfig


@dataclasses.dataclass
class BatchFitData:
    """(S, N, ...) stacked sequence data."""

    images: jnp.ndarray  # (S, N, H, W, 3)
    masks: jnp.ndarray  # (S, N, H, W)
    masks_eroded: jnp.ndarray  # (S, N, H, W)

    @property
    def num_sequences(self) -> int:
        return self.images.shape[0]

    @property
    def num_frames(self) -> int:
        return self.images.shape[1]


def stack_params(params_list):
    """List of per-sequence param pytrees -> one pytree with leading S axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def unstack_params(batched, s: int):
    return jax.tree.map(lambda x: x[s], batched)


def make_batch_train_step(assets: AvatarAssets, config: HarpConfig,
                          rcfg: RasterConfig, vgg: Vgg16Features | None,
                          txs, mesh=None):
    """Batched-over-sequences train step (one jit).

    The per-sequence step is driver._grad_step — the same definition the
    single-sequence fit uses, so the batch path cannot drift.

    Two batching strategies, picked by `mesh`:

    - mesh=None (single device): jax.vmap over S. The Mosaic kernels
      (fused raster, PCF-grad one-hot) FAULT the TPU when batching-lifted
      by vmap (the pallas_call batching rule prepends a grid dim the
      PrefetchScalarGridSpec index maps don't expect — measured: S=1 runs,
      S=2 kernel-faults at 6.2 GiB, far from HBM limits), so this path
      pins the bit-exact XLA tile-pass/scatter backends (~2.9× slower per
      sequence; RESULTS round 5).
    - mesh given (the pod path): shard_map over the mesh's first axis with
      an UNBATCHED per-device body (a lax.map over the device's local
      sequences — sequential scan iterations, no batching lift), so every
      device runs the fast Mosaic kernels. Zero collectives — sequences
      are embarrassingly parallel. Requires S % mesh_size == 0."""
    from harp_tpu.fit.driver import _grad_step

    if mesh is None:
        rcfg = dataclasses.replace(rcfg, backend="xla")
        config = dataclasses.replace(config, pcf_backend="xla")

    def one(p, s, a, f, i, m, me, rv, k, ls, vp, coarse_on, app_on):
        # The VGG filter bank rides in ONCE as a broadcast argument — not
        # embedded as an executable literal (~31 MB of codegen, see
        # fit/driver.compute_losses) and not stacked S times in HBM.
        if vp is not None:
            a = dict(a, vgg_params=vp)
        return _grad_step(
            p, s, a, f, i, m, me, rv, k, ls, assets=assets,
            config=config, rcfg=rcfg, vgg=vgg, txs=txs, extras=None,
            coarse_on=coarse_on, app_on=app_on,
        )

    if mesh is None:
        @partial(jax.jit, static_argnames=("coarse_on", "app_on"),
                 donate_argnums=(0, 1))
        def batch_step(params_S, opt_states_S, aux_S, fids_S, imgs_S, m_S,
                       me_S, ref_verts_S, keys_S, lr_scales_S, vgg_params, *,
                       coarse_on, app_on):
            return jax.vmap(
                partial(one, coarse_on=coarse_on, app_on=app_on),
                in_axes=(0,) * 10 + (None,),
            )(params_S, opt_states_S, aux_S, fids_S, imgs_S, m_S, me_S,
              ref_verts_S, keys_S, lr_scales_S, vgg_params)

        return batch_step

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    @partial(jax.jit, static_argnames=("coarse_on", "app_on"),
             donate_argnums=(0, 1))
    def batch_step_sharded(params_S, opt_states_S, aux_S, fids_S, imgs_S,
                           m_S, me_S, ref_verts_S, keys_S, lr_scales_S,
                           vgg_params, *, coarse_on, app_on):
        def per_device(p, s, a, f, i, m, me, rv, k, ls, vp):
            return jax.lax.map(
                lambda x: one(*x, vp, coarse_on, app_on),
                (p, s, a, f, i, m, me, rv, k, ls),
            )

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(axis),) * 10 + (P(),),
            out_specs=P(axis),
            check_rep=False,
        )(params_S, opt_states_S, aux_S, fids_S, imgs_S, m_S, me_S,
          ref_verts_S, keys_S, lr_scales_S, vgg_params)

    return batch_step_sharded


def fit_sequences_batch(config: HarpConfig, assets: AvatarAssets,
                        data: BatchFitData, params_list, aux_list,
                        rcfg: RasterConfig | None = None,
                        vgg: Vgg16Features | None = None, seed: int = 0,
                        mesh=None):
    """Fit S sequences simultaneously. Returns (list of per-seq params,
    list of per-seq loss histories).

    mesh: optional jax.sharding.Mesh whose first axis shards the sequence
    dimension of every stacked array.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rcfg = rcfg or config.raster_config()
    if vgg is None and config.w_vgg > 0:
        vgg = Vgg16Features.create(weights_path=config.vgg_weights or None,
                                   compute_dtype=config.vgg_compute_dtype)
    vgg_params = None
    if vgg is not None:
        vgg_params = tuple(
            (jnp.asarray(w), jnp.asarray(b)) for (w, b) in vgg.params
        )

    S = data.num_sequences
    n = data.num_frames
    bs = min(config.batch_size, n)
    steps = max(n // bs, 1)

    params_S = stack_params(params_list)
    aux_S = stack_params(aux_list)
    # Optimizer: template from sequence 0, then stacked state.
    txs, _, _ = build_optimizers(params_list[0], config)
    opt_states_S = stack_params(
        [{g: txs[g].init(p) for g in txs} for p in params_list]
    )
    if mesh is not None and S % mesh.devices.size != 0:
        raise ValueError(
            f"S={S} sequences must divide over the {mesh.devices.size}-device"
            " mesh (pad/bucket the sequence set)"
        )
    batch_step = make_batch_train_step(assets, config, rcfg, vgg, txs,
                                       mesh=mesh)

    ref_fids = jnp.zeros((S, 1), jnp.int32)
    ref_verts_S = jax.vmap(
        lambda p, f: pipeline.mesh_forward(p, f, assets, config)[0][0]
    )(params_S, ref_fids)

    if mesh is not None:
        axis = mesh.axis_names[0]
        shard = lambda t: jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), t
        )
        params_S = shard(params_S)
        opt_states_S = shard(opt_states_S)
        aux_S = shard(aux_S)
        data = BatchFitData(
            images=shard(data.images), masks=shard(data.masks),
            masks_eroded=shard(data.masks_eroded),
        )
        ref_verts_S = shard(ref_verts_S)

    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    plateaus = [PlateauState() for _ in range(S)]
    histories = [[] for _ in range(S)]

    for epoch in range(config.total_epoch):
        coarse_on, app_on = stage_flags(epoch, config)
        perms = np.stack([rng.permutation(n) for _ in range(S)])
        # lr scales change only at epoch boundaries -> hoist out of the loop.
        lr_scales_S = jnp.asarray([p.scale for p in plateaus], jnp.float32)
        totals_acc = None
        overflow_acc = None
        for s in range(steps):
            fids_S = jnp.asarray(perms[:, s * bs : (s + 1) * bs])
            key, *subs = jax.random.split(key, S + 1)
            keys_S = jnp.stack(subs)
            imgs_S = jnp.take_along_axis(
                data.images, fids_S[:, :, None, None, None], axis=1
            )
            m_S = jnp.take_along_axis(data.masks, fids_S[:, :, None, None], axis=1)
            me_S = jnp.take_along_axis(
                data.masks_eroded, fids_S[:, :, None, None], axis=1
            )
            params_S, opt_states_S, totals, breakdown = batch_step(
                params_S, opt_states_S, aux_S, fids_S, imgs_S, m_S, me_S,
                ref_verts_S, keys_S, lr_scales_S, vgg_params,
                coarse_on=coarse_on, app_on=app_on,
            )
            # Accumulate ON DEVICE: one host sync per epoch below, not per
            # step (a per-step sync costs ~25 ms on the tunnel — the same
            # fix the single-sequence driver carries, fit/driver.py).
            over = sum(v for k, v in breakdown.items() if k.endswith("overflow"))
            totals_acc = totals if totals_acc is None else totals_acc + totals
            overflow_acc = over if overflow_acc is None else overflow_acc + over
        host = np.asarray(jnp.stack([totals_acc, overflow_acc]))
        epoch_losses = host[0] / steps
        overflows = host[1]
        for si in range(S):
            if coarse_on:
                plateaus[si] = plateau_update(
                    plateaus[si], float(epoch_losses[si]),
                    config.plateau_patience, config.plateau_factor,
                )
            histories[si].append({"epoch": epoch, "loss": float(epoch_losses[si]),
                                  "raster_overflow": float(overflows[si])})

    out_params = [unstack_params(params_S, s) for s in range(S)]
    return out_params, histories
