"""Halo exchange for temporal (neighbor-frame) losses on a sharded frame axis.

The reference's temporal-smoothness losses index frames fid±1
(loss/smooth.py:38-40, preprocessing hand_utils.py:499-513). When the frame
axis is sharded across devices, the ±1 neighbors of shard-boundary frames
live on the neighboring device — a 1-frame halo moved with lax.ppermute
inside shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from harp_tpu.parallel.sharding import FRAME_AXIS


def neighbor_shift(mesh: Mesh, x: jnp.ndarray):
    """For frame-sharded x (N, ...), return (left, right) neighbor arrays:
    left[i] = x[i-1] (clamped at 0), right[i] = x[i+1] (clamped at N-1) —
    the reference's boundary convention (fid stays put at sequence ends).

    Implemented as a local shift + ppermute of the single boundary row.
    """
    axis = FRAME_AXIS
    n_shards = mesh.shape[axis]

    def body(xs):
        idx = jax.lax.axis_index(axis)
        # Receive my right neighbor's first row (for `right` at my last slot)
        # and my left neighbor's last row (for `left` at my first slot).
        from_left = jax.lax.ppermute(
            xs[-1:], axis, [(i, (i + 1) % n_shards) for i in range(n_shards)]
        )
        from_right = jax.lax.ppermute(
            xs[:1], axis, [(i, (i - 1) % n_shards) for i in range(n_shards)]
        )
        left = jnp.concatenate([from_left, xs[:-1]], axis=0)
        right = jnp.concatenate([xs[1:], from_right], axis=0)
        # Clamp at the global sequence boundary.
        left = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (xs.shape[0],) + (1,) * (xs.ndim - 1), 0)
             == 0) & (idx == 0),
            xs, left,
        )
        right = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (xs.shape[0],) + (1,) * (xs.ndim - 1), 0)
             == xs.shape[0] - 1) & (idx == n_shards - 1),
            xs, right,
        )
        return left, right

    return shard_map(
        body, mesh=mesh, in_specs=P(axis), out_specs=(P(axis), P(axis))
    )(x)
