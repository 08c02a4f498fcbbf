"""Pod-scale batch fitting: S sequences optimized in one vmapped step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from harp_tpu.assets import build_synthetic_assets
from harp_tpu.config import HarpConfig
from harp_tpu.data.synthetic import make_synthetic_sequence
from harp_tpu.fit import init_params
from harp_tpu.fit.batch import BatchFitData, fit_sequences_batch
from harp_tpu.render.rasterizer import RasterConfig

ASSETS = build_synthetic_assets(uv_size=64)
RCFG = RasterConfig(image_size=64, tile=8, cap=256, bin_chunk=16, tile_chunk=8,
                    face_chunk=64, faces_per_pixel=8)
CONFIG = HarpConfig(img_size=64, focal_length=285.0, texture_size=64,
                    self_shadow=False, total_epoch=10, training_stage=(10, 0, 0),
                    batch_size=2, w_vgg=0.0)


def _make_batch(n_seq=2, n_frames=2):
    imgs, masks, masks_er, params_l, aux_l = [], [], [], [], []
    for s in range(n_seq):
        i, m, me, gt, init = make_synthetic_sequence(
            ASSETS, CONFIG, RCFG, n_frames=n_frames, seed=10 + s, perturb=0.2
        )
        p, a = init_params(init, ASSETS, CONFIG)
        imgs.append(i)
        masks.append(m)
        masks_er.append(me)
        params_l.append(p)
        aux_l.append(a)
    data = BatchFitData(
        images=jnp.stack(imgs), masks=jnp.stack(masks),
        masks_eroded=jnp.stack(masks_er),
    )
    return data, params_l, aux_l


def test_batch_fit_losses_drop_per_sequence():
    data, params_l, aux_l = _make_batch()
    out_params, hist = fit_sequences_batch(CONFIG, ASSETS, data, params_l, aux_l,
                                           rcfg=RCFG)
    assert len(out_params) == 2
    for h in hist:
        # Allow the first-steps Adam transient; the tail must beat epoch 0.
        assert min(x["loss"] for x in h[3:]) < h[0]["loss"], h
    # Sequences stay independent: different data -> different fitted poses.
    d = np.abs(np.asarray(out_params[0]["pose"]) - np.asarray(out_params[1]["pose"]))
    assert d.max() > 1e-3


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_batch_fit_sharded_matches_unsharded():
    from jax.sharding import Mesh

    import dataclasses

    # Short horizon: partitioning reorders f32 reductions, so trajectories
    # drift over many steps; two epochs isolates the sharding semantics.
    config = dataclasses.replace(CONFIG, total_epoch=2, training_stage=(2, 0, 0))
    data, params_l, aux_l = _make_batch()
    ref_params, _ = fit_sequences_batch(config, ASSETS, data, params_l, aux_l,
                                        rcfg=RCFG, seed=0)
    data2, params_l2, aux_l2 = _make_batch()
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("seq",))
    sh_params, _ = fit_sequences_batch(config, ASSETS, data2, params_l2, aux_l2,
                                       rcfg=RCFG, seed=0, mesh=mesh)
    for k in ("pose", "shape", "cam"):
        np.testing.assert_allclose(
            np.asarray(ref_params[0][k]), np.asarray(sh_params[0][k]),
            atol=2e-4, rtol=1e-3,
        )


def test_batch_fit_mesh_divisibility_guard():
    """The shard_map pod path requires S to divide over the mesh."""
    from jax.sharding import Mesh

    data, params_l, aux_l = _make_batch(n_seq=3)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("seq",))
    with pytest.raises(ValueError, match="divide"):
        fit_sequences_batch(CONFIG, ASSETS, data, params_l, aux_l,
                            rcfg=RCFG, mesh=mesh)
