import numpy as np
import jax
import jax.numpy as jnp
import pytest

from harp_tpu.assets import build_synthetic_assets
from harp_tpu.config import HarpConfig
from harp_tpu.render import pipeline
from harp_tpu.render.rasterizer import RasterConfig
from harp_tpu.render.shadow import render_rgb_with_shadow

ASSETS = build_synthetic_assets(uv_size=64)
CONFIG = HarpConfig(img_size=64, focal_length=285.0, texture_size=64)
RCFG = RasterConfig(image_size=64, tile=8, cap=256, bin_chunk=16, tile_chunk=4, span_tiles=8,
                    face_chunk=64, faces_per_pixel=8)


def make_params(n_frames=2, tex_size=64, seed=0):
    rng = np.random.RandomState(seed)
    V = ASSETS.num_render_verts
    return {
        "pose": jnp.asarray(0.1 * rng.randn(n_frames, 45), jnp.float32),
        "rot": jnp.asarray(0.05 * rng.randn(n_frames, 3), jnp.float32),
        "trans": jnp.zeros((n_frames, 3), jnp.float32),
        "shape": jnp.zeros((10,), jnp.float32),
        "wrist_pose": jnp.zeros((n_frames, 3), jnp.float32),
        "cam": jnp.asarray(np.tile([6.0, -0.08, -0.01], (n_frames, 1)), jnp.float32),
        "verts_disps": jnp.zeros((V, 1), jnp.float32),
        "texture": jnp.asarray(
            np.tile(np.array([232, 190, 172]) / 255.0, (tex_size, tex_size, 1)),
            jnp.float32,
        ),
        "normal_map": jnp.asarray(
            np.tile([0.0, 0.0, 1.0], (tex_size, tex_size, 1)), jnp.float32
        ),
        "light_positions": jnp.asarray(np.tile([-0.5, -0.5, -0.5], (n_frames, 1)), jnp.float32),
        "amb_ratio": jnp.asarray(0.4, jnp.float32),
    }


def test_mesh_forward_shapes():
    params = make_params()
    fids = jnp.asarray([0, 1])
    verts, joints = pipeline.mesh_forward(params, fids, ASSETS, CONFIG)
    assert verts.shape == (2, ASSETS.num_render_verts, 3)
    assert joints.shape == (2, 21, 3)
    # verts in meters (hand scale), joints in mm.
    assert float(jnp.abs(verts).max()) < 1.0
    assert float(jnp.abs(joints).max()) > 10.0


def test_silhouette_render():
    params = make_params()
    fids = jnp.asarray([0])
    verts, _ = pipeline.mesh_forward(params, fids, ASSETS, CONFIG)
    R, T = pipeline.camera_for_frames(params, fids, CONFIG)
    alpha = pipeline.render_silhouette(verts, ASSETS, R, T, CONFIG, RCFG)
    a = np.asarray(alpha)[0]
    assert a.shape == (64, 64)
    cov = (a > 0.5).mean()
    assert 0.05 < cov < 0.9, f"hand should cover a sane image fraction, got {cov}"
    assert a.min() >= 0 and a.max() <= 1 + 1e-5


def test_rgb_render_range_and_background():
    params = make_params()
    fids = jnp.asarray([0])
    verts, _ = pipeline.mesh_forward(params, fids, ASSETS, CONFIG)
    R, T = pipeline.camera_for_frames(params, fids, CONFIG)
    img = np.asarray(
        pipeline.render_rgb(
            verts, ASSETS, R, T, CONFIG, RCFG, params["texture"],
            params["normal_map"], params["light_positions"][fids],
        )
    )[0]
    assert img.shape == (64, 64, 3)
    # Corner should be background (white).
    np.testing.assert_allclose(img[0, 0], [1.0, 1.0, 1.0], atol=1e-5)
    # Covered pixels are skin-ish: not white, not black.
    alpha = np.asarray(
        pipeline.render_silhouette(verts, ASSETS, R, T, CONFIG, RCFG)
    )[0]
    inside = alpha > 0.99
    assert inside.sum() > 50
    assert img[inside].mean() > 0.1 and img[inside].mean() < 0.99


def test_normal_render():
    params = make_params()
    fids = jnp.asarray([0])
    verts, _ = pipeline.mesh_forward(params, fids, ASSETS, CONFIG)
    R, T = pipeline.camera_for_frames(params, fids, CONFIG)
    img = np.asarray(pipeline.render_normal(verts, ASSETS, R, T, CONFIG, RCFG))[0]
    assert img.shape == (64, 64, 3)
    assert img.min() >= -1e-5 and img.max() <= 1 + 1e-5


def test_gradients_flow_to_all_params():
    params = make_params()
    fids = jnp.asarray([0, 1])

    def loss_fn(p):
        verts, joints = pipeline.mesh_forward(p, fids, ASSETS, CONFIG)
        R, T = pipeline.camera_for_frames(p, fids, CONFIG)
        alpha = pipeline.render_silhouette(verts, ASSETS, R, T, CONFIG, RCFG)
        img = pipeline.render_rgb(
            verts, ASSETS, R, T, CONFIG, RCFG, p["texture"], p["normal_map"],
            p["light_positions"][fids],
        )
        return alpha.mean() + img.mean() + 1e-6 * joints.sum()

    grads = jax.grad(loss_fn)(params)
    for k in ["pose", "rot", "trans", "shape", "cam", "verts_disps", "texture",
              "normal_map", "light_positions"]:
        g = np.asarray(grads[k])
        assert np.all(np.isfinite(g)), f"non-finite grad for {k}"
        assert np.abs(g).sum() > 0, f"zero grad for {k}"


def test_shadow_render_smoke():
    params = make_params()
    fids = jnp.asarray([0])
    verts, _ = pipeline.mesh_forward(params, fids, ASSETS, CONFIG)
    img = render_rgb_with_shadow(
        verts, ASSETS, CONFIG, RCFG, params["cam"][fids],
        params["light_positions"][fids], params["amb_ratio"],
        params["texture"], params["normal_map"],
    )
    img = np.asarray(img)[0]
    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img))
    np.testing.assert_allclose(img[0, 0], [1.0, 1.0, 1.0], atol=1e-5)


def test_shadow_darkens_occluded_region():
    """Analytic scene: small quad in front of a big quad, light head-on from
    -z; the small quad's shadow must darken the big quad behind it."""
    from harp_tpu.assets import AvatarAssets, build_topology
    import dataclasses

    # Big quad z=2 spanning x,y in [-0.5, 0.5]; small quad z=1 in [-0.15, 0.15].
    v = np.array(
        [
            [-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.5, 0.5, 2.0], [-0.5, 0.5, 2.0],
            [-0.15, -0.15, 1.0], [0.15, -0.15, 1.0], [0.15, 0.15, 1.0], [-0.15, 0.15, 1.0],
        ],
        np.float32,
    )
    # Wound so face normals point toward -z (toward camera and light).
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 6, 5], [4, 7, 6]], np.int64)
    topo = build_topology(f, 8)
    uvs = np.full((8, 2), 0.5, np.float32)
    scene = AvatarAssets(
        model=ASSETS.model, coarse_topology=topo, subdivision=None,
        sub_topology=topo, verts_uvs=uvs, faces_uvs=topo.faces,
        uv_mask=np.ones((8, 8), np.float32),
    )
    config = dataclasses.replace(CONFIG, shadow_light_radius=5.0)
    # Camera head-on from -z; light off-axis so the cast shadow is visible
    # beside the occluder (geometry worked out in screen space below).
    cam = jnp.asarray([[3.0, 0.0, 0.0]])
    light = jnp.asarray([[1.5, 0.0, -5.0]])
    tex = jnp.ones((8, 8, 3), jnp.float32)
    img = np.asarray(
        render_rgb_with_shadow(
            jnp.asarray(v)[None], scene, config, RCFG, cam, light,
            jnp.asarray(0.0), tex, None,
        )
    )[0]
    # The small quad's shadow band on the big quad projects to columns
    # ~44..57 of row 32 (x mirrored); column ~10 is unshadowed big quad.
    lit = img[32, 10].mean()
    shadowed = img[32, 50].mean()
    assert shadowed < lit - 0.2, (shadowed, lit)
    # Occluder itself is lit (nearly facing the light).
    assert img[32, 32].mean() > lit - 0.1


def test_shadow_half_res_map_close_to_full():
    """shadow_map_scale=0.5 renders nearly the same image (depth-map
    resolution only affects PCF sampling granularity)."""
    import dataclasses

    params = make_params()
    fids = jnp.asarray([0])
    verts, _ = pipeline.mesh_forward(params, fids, ASSETS, CONFIG)
    args = (params["cam"][fids], params["light_positions"][fids],
            params["amb_ratio"], params["texture"], params["normal_map"])
    full = np.asarray(render_rgb_with_shadow(verts, ASSETS, CONFIG, RCFG, *args))
    half_cfg = dataclasses.replace(CONFIG, shadow_map_scale=0.5)
    half = np.asarray(render_rgb_with_shadow(verts, ASSETS, half_cfg, RCFG, *args))
    # Mean difference small; only shadow-edge pixels may differ.
    assert np.abs(full - half).mean() < 0.02


def test_shadow_scale_rounds_light_map_to_tile_multiple():
    """A scale whose raw light-map size is not a tile multiple must round to
    one (a non-multiple silently shrinks the binned area below the
    projection's extent) and the render must stay close to full-res."""
    import dataclasses
    from harp_tpu.render.shadow import light_raster_config

    rl = light_raster_config(RCFG, 0.4)
    assert rl.image_size % rl.tile == 0
    # Budget-fraction widening only applies when compaction is on.
    assert rl.active_fraction == RCFG.active_fraction
    compact = dataclasses.replace(RCFG, active_fraction=0.5)
    assert light_raster_config(compact, 0.5).active_fraction == 0.75
    # The failure case this guards: 360 at scale 0.5 with tile 16 would
    # raw-round to 180 (not a tile multiple); it must land on 176.
    big = dataclasses.replace(RCFG, image_size=360, tile=16)
    assert light_raster_config(big, 0.5).image_size == 176

    params = make_params()
    fids = jnp.asarray([0])
    verts, _ = pipeline.mesh_forward(params, fids, ASSETS, CONFIG)
    args = (params["cam"][fids], params["light_positions"][fids],
            params["amb_ratio"], params["texture"], params["normal_map"])
    full = np.asarray(render_rgb_with_shadow(verts, ASSETS, CONFIG, RCFG, *args))
    cfg4 = dataclasses.replace(CONFIG, shadow_map_scale=0.4)
    quarter = np.asarray(render_rgb_with_shadow(verts, ASSETS, cfg4, RCFG, *args))
    assert np.all(np.isfinite(quarter))
    assert np.abs(full - quarter).mean() < 0.03
