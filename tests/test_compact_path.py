"""Compact active-tile loss path vs full-image reference computation."""

import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.assets import build_synthetic_assets
from harp_tpu.config import HarpConfig
from harp_tpu.data.synthetic import make_synthetic_sequence
from harp_tpu.fit import init_params
from harp_tpu.fit.driver import compute_losses
from harp_tpu.losses import silhouette_loss, photometric_loss
from harp_tpu.render import pipeline
from harp_tpu.render.rasterizer import RasterConfig
from harp_tpu.render.shadow import render_rgb_with_shadow

ASSETS = build_synthetic_assets(uv_size=64)
RCFG = RasterConfig(image_size=64, tile=8, cap=256, bin_chunk=16, tile_chunk=8,
                    face_chunk=64, faces_per_pixel=8, active_fraction=0.75)


def _setup(self_shadow):
    config = HarpConfig(img_size=64, focal_length=285.0, texture_size=64,
                        self_shadow=self_shadow, w_vgg=0.0,
                        raster_active_fraction=0.75)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=2, seed=2
    )
    params, aux = init_params(init, ASSETS, config)
    fids = jnp.asarray([0, 1])
    ref_verts, _ = pipeline.mesh_forward(params, jnp.asarray([0]), ASSETS, config)
    return config, images, masks, masks_er, params, aux, fids, ref_verts[0]


def _full_reference_losses(config, params, aux, fids, images, masks, masks_er):
    """Losses via the full-image render functions."""
    verts, joints = pipeline.mesh_forward(params, fids, ASSETS, config)
    R, T = pipeline.camera_for_frames(params, fids, config)
    alpha = pipeline.render_silhouette(verts, ASSETS, R, T, config, RCFG)
    sil = silhouette_loss(alpha, masks)
    light = jnp.broadcast_to(params["light_positions"][0], (fids.shape[0], 3))
    if config.self_shadow:
        rgb = render_rgb_with_shadow(
            verts, ASSETS, config, RCFG, params["cam"][fids], light,
            params["amb_ratio"], params["texture"], params["normal_map"],
        )
    else:
        rgb = pipeline.render_rgb(
            verts, ASSETS, R, T, config, RCFG, params["texture"],
            params["normal_map"], light,
        )
    photo = photometric_loss(rgb, images, masks_er)
    return float(sil), float(photo)


def test_compact_losses_match_full_no_shadow():
    config, images, masks, masks_er, params, aux, fids, ref_verts = _setup(False)
    total, br = compute_losses(
        params, aux, fids, images, masks, masks_er, ASSETS, config, RCFG,
        None, ref_verts, jax.random.PRNGKey(0), True, True,
    )
    sil_ref, photo_ref = _full_reference_losses(
        config, params, aux, fids, images, masks, masks_er
    )
    np.testing.assert_allclose(float(br["silhouette"]), sil_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(br["photo"]), photo_ref, rtol=1e-4, atol=1e-6)


def test_compact_losses_match_full_shadow():
    config, images, masks, masks_er, params, aux, fids, ref_verts = _setup(True)
    total, br = compute_losses(
        params, aux, fids, images, masks, masks_er, ASSETS, config, RCFG,
        None, ref_verts, jax.random.PRNGKey(0), True, True,
    )
    sil_ref, photo_ref = _full_reference_losses(
        config, params, aux, fids, images, masks, masks_er
    )
    np.testing.assert_allclose(float(br["silhouette"]), sil_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(br["photo"]), photo_ref, rtol=1e-4, atol=1e-5)


def test_compact_gradients_match_full_silhouette():
    """Gradient of the compact silhouette loss == full-image gradient."""
    config, images, masks, masks_er, params, aux, fids, ref_verts = _setup(False)

    def compact_sil(p):
        _, br = compute_losses(
            p, aux, fids, images, masks, masks_er, ASSETS, config, RCFG,
            None, ref_verts, jax.random.PRNGKey(0), True, False,
        )
        return br["silhouette"]

    def full_sil(p):
        verts, _ = pipeline.mesh_forward(p, fids, ASSETS, config)
        R, T = pipeline.camera_for_frames(p, fids, config)
        alpha = pipeline.render_silhouette(verts, ASSETS, R, T, config, RCFG)
        return silhouette_loss(alpha, masks)

    g_c = jax.grad(compact_sil)(params)
    g_f = jax.grad(full_sil)(params)
    for k in ("pose", "cam", "shape"):
        np.testing.assert_allclose(
            np.asarray(g_c[k]), np.asarray(g_f[k]), rtol=1e-3, atol=1e-6
        )
