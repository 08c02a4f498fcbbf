"""Raster budget + Pallas kernel coverage at ARM reference density.

BASELINE config 4 runs the SMPL-X arm (4078 render verts / 8128 faces at
the reference workload density, optimize_sequence.py:198-212). The fit
raster budget (cap 448, span 3, active 0.28 at 448^2) was originally probed
on the hand; these tests pin that the ARM scene also fits it with zero cap
overflow and zero span truncation, and that the Pallas kernel reproduces
the XLA rasterizer on the arm mesh at protocol scale (VERDICT round-2 #10:
config 4 must not silently truncate).
"""

import numpy as np
import jax.numpy as jnp

from harp_tpu.config import HarpConfig
from harp_tpu.render.rasterizer import RasterConfig, _bin_faces
from harp_tpu.render import pipeline
from harp_tpu.render import camera as cam_mod


def _arm_screen(B=2, img=448, seed=0, jitter=0.0):
    from harp_tpu.assets import build_synthetic_arm_assets

    assets = build_synthetic_arm_assets(density="reference")
    config = HarpConfig(
        img_size=img, focal_length=2000.0 * img / 448.0, use_arm=True,
    )
    rng = np.random.RandomState(seed)
    V = assets.num_render_verts
    params = {
        "pose": jnp.asarray(0.15 * rng.randn(B, 45) + jitter * rng.randn(B, 45),
                            jnp.float32),
        "rot": jnp.asarray(0.05 * rng.randn(B, 3), jnp.float32),
        "trans": jnp.zeros((B, 3), jnp.float32),
        "shape": jnp.zeros((10,), jnp.float32),
        "wrist_pose": jnp.asarray(0.1 * rng.randn(B, 3), jnp.float32),
        "cam": jnp.asarray(
            np.tile([5.0, 0.05, -0.01], (B, 1))
            * (1.0 + jitter * rng.randn(B, 1)),
            jnp.float32,
        ),
        "verts_disps": jnp.zeros((V, 1), jnp.float32),
    }
    fids = jnp.arange(B)
    verts, _ = pipeline.mesh_forward(params, fids, assets, config)
    R, T = pipeline.camera_for_frames(params, fids, config)
    screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, img)
    return screen, assets


def test_arm_reference_density_fits_protocol_budget():
    """cap 448 / span 3 / active 0.28 hold the arm at 448^2: per-tile counts
    never exceed cap (a span-truncated face would bump its tile past cap,
    so this also asserts zero truncation) and occupied tiles stay under the
    0.28 active budget, across a pose/cam jitter sweep."""
    rcfg = RasterConfig(image_size=448, cap=448, span_tiles=3,
                        active_fraction=0.28)
    A = 224  # ceil(784 * 0.28 / 8) * 8
    for seed, jitter in ((0, 0.0), (1, 0.1), (2, 0.2)):
        screen, assets = _arm_screen(B=2, img=448, seed=seed, jitter=jitter)
        fv = screen[:, jnp.asarray(assets.render_faces)]
        _, counts, _ = _bin_faces(fv, rcfg)
        counts = np.asarray(counts)
        assert counts.max() <= rcfg.cap, (
            f"arm per-tile count {counts.max()} exceeds cap {rcfg.cap} "
            f"(or a face was span-truncated) at seed {seed}"
        )
        occ = (counts > 0).sum(-1).max()
        assert occ <= A, f"arm occupies {occ} tiles > active budget {A}"


def test_pallas_parity_arm_reference_density():
    """Pallas kernel (interpret) == XLA rasterizer on the reference-density
    arm at 448^2 with the protocol budget — hard ids exactly, soft id sets
    exactly, coverage log-sum to f32 tolerance."""
    from harp_tpu.render.rasterizer import rasterize, _rasterize_ids
    from harp_tpu.render.pallas.raster_kernel import pallas_rasterize

    rcfg = RasterConfig(image_size=448, cap=448, span_tiles=3,
                        active_fraction=0.28, faces_per_pixel=4)
    screen, assets = _arm_screen(B=1, img=448, seed=3)
    faces = assets.render_faces
    soft_x, hard_x = rasterize(screen, faces, rcfg)
    soft_p, ssum_p, hard_p = pallas_rasterize(screen, faces, rcfg,
                                              interpret=True)
    np.testing.assert_array_equal(np.asarray(hard_p), np.asarray(hard_x))
    np.testing.assert_array_equal(
        np.sort(np.asarray(soft_p), -1), np.sort(np.asarray(soft_x), -1)
    )
    out = _rasterize_ids(screen, jnp.asarray(faces, jnp.int32), rcfg,
                         True, False)
    np.testing.assert_allclose(
        np.asarray(ssum_p), np.asarray(out["soft_sum"]), rtol=1e-5, atol=1e-6
    )
