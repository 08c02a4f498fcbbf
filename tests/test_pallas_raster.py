"""Pallas rasterizer kernel vs the XLA reference, in interpreter mode (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from harp_tpu.render.rasterizer import RasterConfig, rasterize
from harp_tpu.render.pallas.raster_kernel import pallas_rasterize

CFG = RasterConfig(image_size=32, tile=8, cap=64, bin_chunk=8, tile_chunk=4,
                   face_chunk=16, faces_per_pixel=4)


def _random_scene(seed=0, n=30, B=2):
    rng = np.random.RandomState(seed)
    verts = np.zeros((B, n * 3, 3), np.float32)
    for b in range(B):
        centers = rng.uniform(2, 30, size=(n, 2))
        offsets = rng.uniform(-4, 4, size=(n, 3, 2))
        verts[b, :, :2] = (centers[:, None] + offsets).reshape(-1, 2)
        verts[b, :, 2] = rng.uniform(0.5, 3.0, size=(n, 1)).repeat(3, 1).reshape(-1)
    faces = np.arange(n * 3).reshape(n, 3)
    return jnp.asarray(verts), faces


def test_pallas_matches_xla_random_scene():
    verts, faces = _random_scene()
    soft_x, hard_x = rasterize(verts, faces, CFG)
    soft_p, ssum_p, hard_p = pallas_rasterize(verts, faces, CFG, interpret=True)
    np.testing.assert_array_equal(np.asarray(hard_p), np.asarray(hard_x))
    sp = np.sort(np.asarray(soft_p), -1)
    sx = np.sort(np.asarray(soft_x), -1)
    np.testing.assert_array_equal(sp, sx)
    # Coverage log-sum matches the XLA accumulation.
    from harp_tpu.render.rasterizer import _rasterize_ids
    out = _rasterize_ids(verts, jnp.asarray(faces, jnp.int32), CFG, True, False)
    np.testing.assert_allclose(
        np.asarray(ssum_p), np.asarray(out["soft_sum"]), rtol=1e-5, atol=1e-6
    )


def test_pallas_single_triangle():
    v = np.array([[[4.0, 4.0, 1.0], [28.0, 6.0, 1.0], [8.0, 28.0, 1.0]]], np.float32)
    faces = np.array([[0, 1, 2]])
    soft_p, _, hard_p = pallas_rasterize(jnp.asarray(v), faces, CFG, interpret=True)
    soft_x, hard_x = rasterize(jnp.asarray(v), faces, CFG)
    np.testing.assert_array_equal(np.asarray(hard_p), np.asarray(hard_x))
    np.testing.assert_array_equal(
        np.sort(np.asarray(soft_p), -1), np.sort(np.asarray(soft_x), -1)
    )


def test_pallas_compaction_matches():
    import dataclasses

    verts, faces = _random_scene(seed=3, n=20)
    # Budgets round to different granularities (XLA: tile_chunk, Pallas:
    # TC=8); 0.5 of 16 tiles lands on 8 for both.
    cfg = dataclasses.replace(CFG, active_fraction=0.5)
    soft_x, hard_x = rasterize(verts, faces, cfg)
    soft_p, ssum_p, hard_p = pallas_rasterize(verts, faces, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(hard_p), np.asarray(hard_x))
    np.testing.assert_array_equal(
        np.sort(np.asarray(soft_p), -1), np.sort(np.asarray(soft_x), -1)
    )


def test_coverage_grad_kernel_matches_brute():
    """Fused Pallas alpha-backward (soft_alpha_fast_pack) == the all-faces
    brute-force gradient, interpreter mode."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from harp_tpu.render.rasterizer import (
        RasterConfig, soft_alpha_fast_pack, face_pixel_geometry,
        _pixel_centers, scatter_tiles,
    )
    from harp_tpu.render.pallas.raster_kernel import pallas_raster_compact

    IMG = 32
    cfg = RasterConfig(image_size=IMG, tile=8, cap=32, faces_per_pixel=8,
                       active_fraction=1.0)
    rng = np.random.RandomState(0)
    V = 30
    verts = np.stack(
        [rng.uniform(2, 30, V), rng.uniform(2, 30, V),
         rng.uniform(1.5, 3.0, V)], 1
    ).astype(np.float32)[None]
    faces = rng.choice(V, (18, 3)).astype(np.int32)
    verts = jnp.asarray(verts)
    target = jnp.asarray(
        (np.indices((IMG, IMG)).sum(0) % 2).astype(np.float32)
    )[None]

    def alpha_brute(v):
        fv = v[:, faces]
        px, py = _pixel_centers(cfg)
        g = face_pixel_geometry(
            fv[:, :, None, None, :, :], px[None, None], py[None, None], cfg
        )
        d_px2 = g["signed_d_ndc2"] / (cfg.ndc_scale**2)
        hit = g["valid"] & (d_px2 <= cfg.blur_px2)
        contrib = -jax.nn.softplus(-g["signed_d_ndc2"] / cfg.sigma)
        return 1.0 - jnp.exp(jnp.where(hit, contrib, 0.0).sum(axis=1))

    def loss_brute(v):
        return jnp.abs(alpha_brute(v) - target).mean()

    def loss_pallas(v):
        out = pallas_raster_compact(jax.lax.stop_gradient(v), faces, cfg,
                                    interpret=True)
        alpha_c = soft_alpha_fast_pack(out["soft_sum"], out["pack"], v,
                                       faces, cfg, interpret=True)
        alpha = scatter_tiles(alpha_c, out["act_idx"], cfg, 0.0)
        return jnp.abs(alpha - target).mean()

    np.testing.assert_allclose(float(loss_brute(verts)),
                               float(loss_pallas(verts)), rtol=1e-6)
    gb = np.asarray(jax.grad(loss_brute)(verts))
    gp = np.asarray(jax.grad(loss_pallas)(verts))
    # f32 reassociation noise bound (the sum orders differ: per-pixel-
    # -over-faces vs per-tile-slot accumulation).
    assert np.abs(gb - gp).max() < 2e-4 * max(np.abs(gb).max(), 1e-6)


def test_depth_only_mode_matches_full_kernel():
    """need_soft=False (the shadow light pass's depth-only kernel) must
    produce identical hard ids to the full kernel, with soft outputs absent."""
    from harp_tpu.render.pallas.raster_kernel import pallas_raster_compact

    verts, faces = _random_scene(seed=3, n=40)
    full = pallas_raster_compact(verts, jnp.asarray(faces, jnp.int32), CFG,
                                 interpret=True)
    hard_only = pallas_raster_compact(verts, jnp.asarray(faces, jnp.int32),
                                      CFG, interpret=True, need_soft=False)
    np.testing.assert_array_equal(np.asarray(hard_only["act_idx"]),
                                  np.asarray(full["act_idx"]))
    np.testing.assert_array_equal(np.asarray(hard_only["hard_ids"]),
                                  np.asarray(full["hard_ids"]))
    assert "soft_ids" not in hard_only and "pack" not in hard_only
    s, ss, h = pallas_rasterize(verts, faces, CFG, interpret=True,
                                need_soft=False)
    assert s is None and ss is None
    _, _, h_full = pallas_rasterize(verts, faces, CFG, interpret=True)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_full))
