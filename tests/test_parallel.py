"""Sharding tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from harp_tpu.parallel.sharding import (
    make_mesh, frame_sharding, shard_params, replicate,
)
from harp_tpu.parallel.halo import neighbor_shift

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_and_sharding_placement():
    mesh = make_mesh(8)
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, frame_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_neighbor_shift_matches_reference_indexing():
    """left/right must equal x[fid -/+ 1] with clamping at sequence ends
    (loss/smooth.py:38-40 convention)."""
    mesh = make_mesh(8)
    n = 16
    x = jnp.arange(n * 3.0).reshape(n, 3)
    xs = jax.device_put(x, frame_sharding(mesh))
    left, right = neighbor_shift(mesh, xs)
    xn = np.asarray(x)
    fid = np.arange(n)
    fid_l = np.where(fid == 0, fid, fid - 1)
    fid_r = np.where(fid == n - 1, fid, fid + 1)
    np.testing.assert_allclose(np.asarray(left), xn[fid_l])
    np.testing.assert_allclose(np.asarray(right), xn[fid_r])


def test_sharded_grad_matches_single_device():
    """A frame-sharded loss + shared-parameter gradient must equal the
    unsharded computation (GSPMD inserts the psum)."""
    mesh = make_mesh(8)
    n = 8
    frames = jnp.arange(n * 4.0).reshape(n, 4) / 10.0
    shared = jnp.asarray([0.3, -0.2, 0.5, 0.1])

    def loss(shared, frames):
        return jnp.sum(jnp.sin(frames * shared)) / n

    g_ref = jax.grad(loss)(shared, frames)
    fsh = frame_sharding(mesh)
    frames_sharded = jax.device_put(frames, fsh)
    shared_repl = jax.device_put(shared, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    g_sharded = jax.jit(jax.grad(loss))(shared_repl, frames_sharded)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-6)


def test_shard_params_placement():
    mesh = make_mesh(8)
    params = {
        "pose": jnp.zeros((8, 45)),
        "shape": jnp.zeros((10,)),
        "texture": jnp.zeros((16, 16, 3)),
        "cam": jnp.zeros((8, 3)),
    }
    sharded = shard_params(mesh, params)
    assert len(sharded["pose"].sharding.device_set) == 8
    spec = sharded["pose"].sharding.spec
    assert spec[0] == "frames"
    # Shared params replicated.
    assert sharded["shape"].sharding.is_fully_replicated
    assert sharded["texture"].sharding.is_fully_replicated
