"""End-to-end forward model: parameters -> posed mesh -> rendered images.

The functional replacement for the reference's prepare_mesh / render_image
object soup (utils/visualize.py:16-108,258-285): one pure function per render
mode, all jit/vmap/grad-compatible, with static assets closed over.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from harp_tpu.assets import AvatarAssets
from harp_tpu.config import HarpConfig
from harp_tpu.models.mano import mano_forward
from harp_tpu.ops.mesh import apply_subdivision, vertex_normals
from harp_tpu.render import camera as cam_mod
from harp_tpu.render.rasterizer import (
    RasterConfig,
    get_ids,
    raster_full,
    soft_alpha_fast,
    barycentrics_of,
)
from harp_tpu.render import shading


def mesh_forward(params: dict, fids: jnp.ndarray, assets: AvatarAssets,
                 config: HarpConfig):
    """Pose the model, subdivide, displace. Mirrors prepare_mesh
    (visualize.py:16-65).

    Returns:
      verts: (B, V_render, 3) world-space meters.
      joints: (B, 21, 3) millimeters (kps losses operate in mm).
    """
    B = fids.shape[0]
    pose = params["pose"][fids]
    rot = params["rot"][fids]
    trans = params["trans"][fids]
    shape = jnp.broadcast_to(params["shape"][None], (B, params["shape"].shape[0]))

    if config.model_type == "nimble":
        from harp_tpu.models.nimble import (
            nimble_forward, nimble_to_mano, mano_protocol_joints,
        )

        posed = jnp.concatenate([rot, pose], axis=1)
        verts_mm, _ = nimble_forward(assets.model, posed, shape, trans)
        # Keypoint losses run in the MANO joint protocol for every family
        # (reference fits MANO joints to NIMBLE output, hand_utils.py:296).
        joints_mm = mano_protocol_joints(
            assets.model, nimble_to_mano(assets.model, verts_mm)
        )
    elif config.use_arm:
        from harp_tpu.models.smplx_arm import smplx_arm_forward

        verts_mm, joints_mm = smplx_arm_forward(
            assets.model, shape, rot, trans, pose, params["wrist_pose"][fids]
        )
    else:
        pose48 = jnp.concatenate([rot, pose], axis=1)
        verts_mm, joints_mm = mano_forward(assets.model, pose48, shape, trans)

    verts = verts_mm / 1000.0
    if assets.subdivision is not None:
        verts = apply_subdivision(assets.subdivision, verts)

    disps = params.get("verts_disps")
    if disps is not None:
        if disps.shape[-1] == 1:
            normals = vertex_normals(verts, assets.render_faces)
            verts = verts + normals * disps[None]
        else:
            verts = verts + disps[None]
    return verts, joints_mm


def camera_for_frames(params: dict, fids: jnp.ndarray, config: HarpConfig):
    """(R, T) for the standard OpenCV-flip camera from weak-persp params."""
    cam = params["cam"][fids]
    T = cam_mod.weak_perspective_to_translation(cam, config.focal_length, config.img_size)
    R = jnp.broadcast_to(jnp.asarray(cam_mod.OPENCV_TO_P3D_R), (fids.shape[0], 3, 3))
    return R, T


def render_silhouette(verts, assets: AvatarAssets, R, T, config: HarpConfig,
                      raster_cfg: RasterConfig):
    """Soft silhouette alpha (B, H, W) — SoftSilhouetteShader semantics.

    Forward alpha comes from the raster pass's coverage log-sum; the
    backward recomputes through the recorded ids (soft_alpha_fast)."""
    screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, config.img_size)
    out = raster_full(screen, assets.render_faces, raster_cfg, True, False)
    return soft_alpha_fast(
        out["soft_ids"], out["soft_sum"], screen, assets.render_faces, raster_cfg
    )


def raster_camera_view(verts, assets: AvatarAssets, R, T, config: HarpConfig,
                       raster_cfg: RasterConfig, need_soft=True, need_hard=True):
    """Shared camera-view rasterization for silhouette + color renders:
    one binning + one tile pass produces both id sets (+ coverage sum).
    Returns (screen, raster_out_dict)."""
    screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, config.img_size)
    out = raster_full(screen, assets.render_faces, raster_cfg, need_soft, need_hard)
    return screen, out


def _shade_pixels(verts, ids, bary, mask, assets, R, T, config: HarpConfig,
                  texture, normal_map, light_positions,
                  ambient_color, diffuse_color, specular_color,
                  vis_map=None, shininess: float = 0.0):
    """Common Phong shading given a hard rasterization.

    Gather-packing: per-face vertex attributes (position, normal, wedge uv)
    are concatenated so the per-pixel interpolation needs a SINGLE gather,
    and albedo + normal map are sampled as one packed texture — TPU gathers
    are the shading bottleneck (measured ~210 ms/step unpacked at 448^2x8).
    """
    faces = assets.render_faces
    normals_v = vertex_normals(verts, faces)
    attrs = shading.interpolate_packed_attrs(
        verts, normals_v, faces, assets.verts_uvs, assets.faces_uvs, ids, bary
    )
    points = attrs[..., 0:3]
    pixel_normals = attrs[..., 3:6]
    uv = attrs[..., 6:8]

    if normal_map is not None:
        packed_tex = jnp.concatenate(
            [texture, shading.safe_normalize(normal_map)], axis=-1
        )
        sampled = shading.sample_texture_bilinear(packed_tex, uv)
        texels = sampled[..., 0:3]
        pixel_normals = shading.apply_normal_map(pixel_normals, sampled[..., 3:6])
    else:
        texels = shading.sample_texture_bilinear(texture, uv)

    cam_center = cam_mod.camera_center(R, T)
    amb, diff, spec = shading.phong_lighting(
        points, pixel_normals, light_positions, cam_center,
        ambient_color, diffuse_color, specular_color, shininess=shininess,
    )
    if vis_map is not None:
        colors = (amb + diff * vis_map[..., None]) * texels + spec
    else:
        colors = (amb + diff) * texels + spec
    return shading.composite_hard(colors, mask, config.background_color)


def render_rgb(verts, assets: AvatarAssets, R, T, config: HarpConfig,
               raster_cfg: RasterConfig, texture, normal_map, light_positions,
               precomputed=None):
    """Phong color render without shadows (B, H, W, 3).

    precomputed: optional (screen, hard_ids) from raster_camera_view to
    share the rasterization with the silhouette render.
    """
    if precomputed is None:
        screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, config.img_size)
        _, ids = get_ids(screen, assets.render_faces, raster_cfg, False, True)
    else:
        screen, ids = precomputed
    bary, _, mask = barycentrics_of(ids, screen, assets.render_faces, raster_cfg)
    return _shade_pixels(
        verts, ids, bary, mask, assets, R, T, config, texture, normal_map,
        light_positions, config.ambient_color, config.diffuse_color,
        config.specular_color, shininess=config.shininess,
    )


def render_normal(verts, assets: AvatarAssets, R, T, config: HarpConfig,
                  raster_cfg: RasterConfig, normal_map=None, precomputed=None):
    """Normals-as-colors render (B, H, W, 3) — SoftPhongNormalShader semantics:
    interpolated (optionally normal-mapped) normals, y/z negated, mapped to
    [0,1], composited over the background."""
    if precomputed is None:
        screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, config.img_size)
        _, ids = get_ids(screen, assets.render_faces, raster_cfg, False, True)
    else:
        screen, ids = precomputed
    bary, _, mask = barycentrics_of(ids, screen, assets.render_faces, raster_cfg)
    faces = assets.render_faces
    normals_v = vertex_normals(verts, faces)
    pixel_normals = shading.interpolate_face_vertex_attrs(normals_v, faces, ids, bary)
    if normal_map is not None:
        uv = shading.pixel_uvs(ids, bary, assets.verts_uvs, assets.faces_uvs)
        nm = shading.safe_normalize(normal_map)
        nm_px = shading.sample_texture_bilinear(nm, uv)
        pixel_normals = shading.apply_normal_map(pixel_normals, nm_px)
    flipped = pixel_normals * jnp.asarray([1.0, -1.0, -1.0])
    colors = (flipped + 1.0) / 2.0
    return shading.composite_hard(colors, mask, config.background_color)


# ---------------------------------------------------------------------------
# Compact (active-tile) render path: all differentiable per-pixel work on
# (B, A, P) arrays. Exact: inactive tiles are background by construction
# (losses add closed-form background terms; see fit/driver.py).
# ---------------------------------------------------------------------------


def raster_camera_view_compact(verts, assets: AvatarAssets, R, T,
                               config: HarpConfig, raster_cfg: RasterConfig,
                               need_soft=True, need_hard=True):
    from harp_tpu.render.rasterizer import raster_compact

    screen = cam_mod.screen_from_world(verts, R, T, config.focal_length, config.img_size)
    out = raster_compact(screen, assets.render_faces, raster_cfg,
                         need_soft, need_hard)
    return screen, out


def pixel_geometry_compact(verts, screen, rout, assets: AvatarAssets,
                           raster_cfg: RasterConfig):
    """Shared per-pixel geometry for the compact path: ONE barycentric
    recompute + ONE packed attribute gather serving both the shadow
    reprojection and the Phong shading (they consumed identical
    interpolations; fusing halves the pixel gathers and their backward
    scatter families).

    Returns dict(points, normals, uv, mask), each (B, A, P, ...).
    """
    from harp_tpu.render.rasterizer import tile_pixel_coords, barycentrics_of_at

    faces = assets.render_faces
    px, py = tile_pixel_coords(rout["act_idx"], raster_cfg)
    ids = rout["hard_ids"]
    bary, _, mask = barycentrics_of_at(ids, screen, faces, raster_cfg, px, py)
    normals_v = vertex_normals(verts, faces)
    attrs = shading.interpolate_packed_attrs(
        verts, normals_v, faces, assets.verts_uvs, assets.faces_uvs, ids, bary
    )
    return {
        "points": attrs[..., 0:3],
        "normals": attrs[..., 3:6],
        "uv": attrs[..., 6:8],
        "mask": mask,
    }


def shade_pixels_compact(verts, screen, rout, assets: AvatarAssets, R, T,
                         config: HarpConfig, raster_cfg: RasterConfig,
                         texture, normal_map, light_positions,
                         ambient_color, diffuse_color, specular_color,
                         vis_map=None, shininess: float = 0.0, geom=None):
    """Phong shading on compact tiles -> (colors (B, A, P, 3), mask).

    geom: optional precomputed pixel_geometry_compact output (shared with
    the shadow pass)."""
    if geom is None:
        geom = pixel_geometry_compact(verts, screen, rout, assets, raster_cfg)
    points = geom["points"]
    pixel_normals = geom["normals"]
    uv = geom["uv"]
    mask = geom["mask"]
    if normal_map is not None:
        packed_tex = jnp.concatenate(
            [texture, shading.safe_normalize(normal_map)], axis=-1
        )
        sampled = shading.sample_texture_bilinear(packed_tex, uv)
        texels = sampled[..., 0:3]
        pixel_normals = shading.apply_normal_map(pixel_normals, sampled[..., 3:6])
    else:
        texels = shading.sample_texture_bilinear(texture, uv)

    cam_center = cam_mod.camera_center(R, T)
    amb, diff, spec = shading.phong_lighting(
        points, pixel_normals, light_positions, cam_center,
        ambient_color, diffuse_color, specular_color, shininess=shininess,
    )
    if vis_map is not None:
        colors = (amb + diff * vis_map[..., None]) * texels + spec
    else:
        colors = (amb + diff) * texels + spec
    bg = jnp.asarray(config.background_color, colors.dtype)
    return jnp.where(mask[..., None], colors, bg), mask
