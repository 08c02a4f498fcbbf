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


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host initialization for pod-scale batch fitting (SURVEY §2
    comm-backend row).

    On TPU pods the three arguments are discovered from the environment
    (TPU_WORKER_HOSTNAMES etc.) and `jax.distributed.initialize()` takes no
    parameters; pass them explicitly for CPU/GPU clusters. Safe to call
    when already initialized (no-op). After this, `jax.devices()` is global
    across hosts and `make_mesh()`/`global_batch_mesh()` build pod-wide
    meshes; GSPMD routes frame-axis collectives over ICI within a slice and
    DCN across slices with no further code changes.
    """
    # NOTE: do not probe jax.process_count() here — it INITIALIZES the XLA
    # backend, after which jax.distributed.initialize() refuses to run.
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:  # already initialized
            return
    except Exception:
        pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:  # single-process / already init
        if "already initialized" in str(e):
            return
        if kwargs:
            raise
        # No explicit coordinator: auto-discovery failed. On a real pod
        # (worker env vars present) this is a fatal misconfiguration, not a
        # single-host run — proceeding would silently fit N independent
        # jobs instead of one distributed job.
        import os
        import warnings

        pod_vars = [v for v in ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
                                "MEGASCALE_COORDINATOR_ADDRESS")
                    if os.environ.get(v)]
        if pod_vars:
            raise RuntimeError(
                f"jax.distributed.initialize() failed with pod env vars "
                f"{pod_vars} set: {e}"
            ) from e
        warnings.warn(
            f"jax.distributed.initialize() unavailable ({e}); continuing "
            "single-process", RuntimeWarning,
        )


def global_batch_mesh(seq_axis: int | None = None) -> Mesh:
    """Pod-wide mesh for the batch-over-sequences flagship config: axis 0 =
    sequences (across hosts/slices, DCN), axis 1 = frames (within a slice,
    ICI). With seq_axis=None, uses jax.process_count() as the sequence
    axis — one sequence group per host."""
    devices = np.asarray(jax.devices())
    n = devices.size
    s = seq_axis if seq_axis is not None else max(jax.process_count(), 1)
    if n % s != 0:
        s = 1
    return Mesh(devices.reshape(s, n // s), ("sequences", FRAME_AXIS))


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
