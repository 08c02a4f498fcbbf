"""Orbax async checkpointing + multi-host helpers (CPU mesh)."""
import os

import numpy as np
import jax.numpy as jnp

from harp_tpu.assets import build_synthetic_assets
from harp_tpu.config import HarpConfig
from harp_tpu.fit.optimizer import build_optimizers
from harp_tpu.utils.orbax_io import OrbaxCheckpointer


def _small_setup():
    from harp_tpu.fit.params import init_params

    assets = build_synthetic_assets(uv_size=32)
    config = HarpConfig(img_size=32, texture_size=32, batch_size=2,
                        total_epoch=4, training_stage=(2, 1, 1))
    n = 2
    inp = {
        "trans": np.zeros((n, 3)), "pose": np.zeros((n, 45)),
        "rot": np.zeros((n, 3)), "shape": np.zeros((n, 10)),
        "cam": np.asarray([[4.0, 0.0, 0.0]] * n),
        "joints": np.zeros((n, 21, 3)),
    }
    params, _ = init_params(inp, assets, config)
    txs, opt_states, masks = build_optimizers(params, config)
    return params, opt_states


def test_orbax_roundtrip_with_structure(tmp_path):
    params, opt_states = _small_setup()
    like = {"params": params, "opt_states": opt_states, "epoch": 0,
            "plateau_scale": 1.0, "extra": {}}
    with OrbaxCheckpointer(str(tmp_path), max_to_keep=2) as ckpt:
        ckpt.save(2, params, opt_states, plateau_scale=0.5)
        ckpt.save(4, params, opt_states, plateau_scale=0.25)
        ckpt.save(6, params, opt_states, plateau_scale=0.125)
        ckpt.wait()
        assert ckpt.latest_step() == 6
        payload = ckpt.restore(like=like)
    assert payload["epoch"] == 6
    assert payload["plateau_scale"] == 0.125


def test_orbax_restore_values_and_retention(tmp_path):
    import jax

    params, opt_states = _small_setup()
    like = {"params": params, "opt_states": opt_states, "epoch": 0,
            "plateau_scale": 1.0, "extra": {}}
    ckpt = OrbaxCheckpointer(str(tmp_path), max_to_keep=2)
    ckpt.save(1, params, opt_states)
    ckpt.save(2, jax.tree.map(lambda x: x + 1.0, params), opt_states)
    ckpt.save(3, jax.tree.map(lambda x: x + 2.0, params), opt_states)
    ckpt.wait()
    steps = sorted(ckpt.manager.all_steps())
    assert steps == [2, 3], steps  # retention: max_to_keep=2
    payload = ckpt.restore(like=like)
    np.testing.assert_allclose(
        np.asarray(payload["params"]["texture"]),
        np.asarray(params["texture"]) + 2.0,
    )
    # Structure equality: restored tree matches the live tree's treedef.
    live_def = jax.tree.structure((params, opt_states))
    restored_def = jax.tree.structure((payload["params"], payload["opt_states"]))
    assert live_def == restored_def
    ckpt.close()


def test_initialize_distributed_singleprocess_noop(monkeypatch):
    from harp_tpu.parallel.sharding import initialize_distributed

    # A true single-host environment has no pod coordination variables; the
    # CI host may carry them (e.g. a tunneled TPU worker sets
    # TPU_WORKER_HOSTNAMES), and with them set initialize_distributed
    # correctly refuses to proceed silently — tested separately below.
    for v in ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    initialize_distributed()  # must not raise in a single-process run
    import jax

    assert jax.process_count() == 1


def test_initialize_distributed_raises_on_pod_vars(monkeypatch):
    """Auto-discovery failure WITH pod env vars present is a fatal
    misconfiguration (ADVICE r2: never silently fit N independent jobs)."""
    import pytest

    from harp_tpu.parallel.sharding import initialize_distributed

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    with pytest.raises(RuntimeError, match="pod env vars"):
        initialize_distributed()


def test_global_batch_mesh_axes():
    from harp_tpu.parallel.sharding import global_batch_mesh

    mesh = global_batch_mesh(seq_axis=2)
    assert mesh.axis_names == ("sequences", "frames")
    assert mesh.devices.shape[0] == 2
    mesh1 = global_batch_mesh()
    assert mesh1.devices.size == mesh.devices.size


def _tiny_fit_setup(total_epoch):
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    from harp_tpu.assets import build_synthetic_assets
    from harp_tpu.config import HarpConfig
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params
    from harp_tpu.fit.driver import FitData
    from harp_tpu.render.rasterizer import RasterConfig

    assets = build_synthetic_assets(uv_size=32)
    config = HarpConfig(
        img_size=32, focal_length=2000.0 * 32 / 448.0, texture_size=32,
        self_shadow=False, w_vgg=0.0, batch_size=4,
        total_epoch=total_epoch, training_stage=(2, 2, 1),
    )
    rcfg = RasterConfig(image_size=32, tile=8, cap=64, bin_chunk=8,
                        tile_chunk=4, face_chunk=32, faces_per_pixel=4)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=4, seed=0
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, assets, config)
    return assets, config, rcfg, data, params, aux


def test_killed_and_resumed_fit_matches_uninterrupted(tmp_path):
    """A fit killed after a checkpoint and resumed via load_fit_checkpoint
    must reproduce the uninterrupted fit exactly: optimizer moments, epoch
    cursor, plateau state, AND the rng streams (permutations + texture-reg
    keys) are all restored/replayed (VERDICT round-2 #6b)."""
    import dataclasses as dc
    import jax
    import numpy as np
    from harp_tpu.fit.driver import fit_sequence
    from harp_tpu.fit.resume import load_fit_checkpoint

    assets, config, rcfg, data, params, aux = _tiny_fit_setup(5)
    params_host = jax.tree.map(np.asarray, params)

    # Uninterrupted 5-epoch fit.
    import jax.numpy as jnp
    p_full, h_full = fit_sequence(
        config, assets, data, jax.tree.map(jnp.asarray, params_host),
        dict(aux), rcfg=rcfg, seed=0,
    )
    p_full = jax.tree.map(np.asarray, p_full)

    # "Killed" after epoch 2 (checkpoint_every=2 saves at epoch 2), using
    # the ORBAX backend, then resumed for epochs 3-4.
    cfg3 = dc.replace(config, total_epoch=3, checkpoint_backend="orbax")
    out_dir = str(tmp_path / "run")
    fit_sequence(
        cfg3, assets, data, jax.tree.map(jnp.asarray, params_host),
        dict(aux), rcfg=rcfg, seed=0, out_dir=out_dir, checkpoint_every=2,
    )
    payload = load_fit_checkpoint(
        out_dir, jax.tree.map(jnp.asarray, params_host), config)
    assert int(payload["epoch"]) == 2
    p_res, h_res = fit_sequence(
        config, assets, data, payload["params"], dict(aux), rcfg=rcfg,
        seed=0, resume=payload,
    )
    assert [h["epoch"] for h in h_res] == [3, 4]
    for k in p_full:
        np.testing.assert_allclose(
            np.asarray(p_res[k]), p_full[k], rtol=1e-6, atol=1e-7,
            err_msg=f"param {k} diverged after resume",
        )
    # Loss history of the resumed epochs matches the uninterrupted run.
    for a, b in zip(h_full[3:], h_res):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)
