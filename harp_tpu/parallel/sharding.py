"""Multi-chip execution via jax.sharding over a device Mesh.

HARP's workload has no large weights — parallelism is over the FRAME axis
(SURVEY.md §2: the reference is single-GPU; the TPU-native scaling axis is
data-parallel frames within/across sequences). Strategy:

- per-frame parameter rows, images and masks are sharded along axis 0 with
  NamedSharding(mesh, P("frames"));
- shared parameters (shape, texture, normal map, ...) are replicated;
- one jitted step under GSPMD: XLA inserts the psum for the shared-parameter
  gradients over ICI automatically.

Tensor/pipeline parallelism intentionally do not exist here: parameters are
KB-MB scale (SURVEY §2 table), so sharding them would only add collective
latency. Rasterization work scales with frames, which is exactly the axis
we shard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAME_AXIS = "frames"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (FRAME_AXIS,))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(FRAME_AXIS))


def shard_frames(mesh: Mesh, tree):
    """Place every leaf with its leading axis sharded across the mesh."""
    sh = frame_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


# Per-frame parameter keys (leading axis = frame) vs shared/replicated keys.
PER_FRAME_KEYS = ("trans", "pose", "rot", "wrist_pose", "cam", "light_positions")


def shard_params(mesh: Mesh, params: dict) -> dict:
    """Shard per-frame parameter rows, replicate shared parameters."""
    out = {}
    fsh = frame_sharding(mesh)
    rsh = NamedSharding(mesh, P())
    for k, v in params.items():
        out[k] = jax.device_put(v, fsh if k in PER_FRAME_KEYS else rsh)
    return out
