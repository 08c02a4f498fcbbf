"""Two-pass self-shadow rendering with percentage-closer filtering.

Semantics of the reference MeshRendererShadow (renderer_helper.py:331-412) +
get_shadow_renderers/process_info_for_shadow (:416-468):

1. place the light on a sphere of radius `shadow_light_radius` around the
   hand center, looking at it (pytorch3d look_at_rotation)
2. rasterize a depth map from the light
3. rasterize from the camera; lift hit pixels to world points
4. reproject the points into light screen space, 3x3 PCF-average of
   sigmoid((light_depth - (point_depth - bias)) * sharpness)
5. shade with learned ambient/diffuse split:
   colors = (amb + diff * relu(n.l) * vis) * texels  (specular = 0)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from harp_tpu.assets import AvatarAssets
from harp_tpu.config import HarpConfig
from harp_tpu.ops.numerics import safe_norm
from harp_tpu.render import camera as cam_mod
from harp_tpu.render.rasterizer import (
    RasterConfig,
    barycentrics_of,
)
from harp_tpu.render import shading


def light_raster_config(raster_cfg: RasterConfig, scale: float,
                        active_scale: float = 1.5,
                        cap_slack: float = 1.5) -> RasterConfig:
    """Raster config for the light-view depth pass at `scale` resolution.

    A downscaled light map concentrates faces: per-tile peak counts at
    scale 0.5 measured ~1.9x the camera view's (577 vs 305 hand, 548 vs 339
    arm at reference density) — the cap is scaled by 1/scale so the light
    pass cannot silently truncate what the camera pass holds, times
    `cap_slack` headroom: the light DIRECTION moves during the fit and
    oblique directions concentrate further (scripts/probe_light_cap.py:
    1274 peak over an 8-direction sweep vs 626 at the converged light at
    reference hand density / 448^2 / scale 0.5 — the unslacked cap 896
    overflowed one tile on the protocol's first shadowed epoch). The
    light-map size is rounded to a tile multiple (a non-multiple would
    silently shrink the binned area below the projection's extent);
    callers must derive Hl and the effective focal scale from the returned
    `image_size`, not from `round(H * scale)`. The active-tile budget
    fraction is widened by `active_scale` (the light view can frame the
    subject larger than the camera view; its overflow counters are
    surfaced as light_bin_overflow / light_active_overflow in the fit
    breakdown, so a too-small budget is loud, not silent)."""
    if scale >= 1.0:
        return raster_cfg
    t = raster_cfg.tile
    Hl = max(t, int(round(raster_cfg.image_size * scale / t)) * t)
    s_eff = Hl / raster_cfg.image_size
    cap = -(-int(round(raster_cfg.cap / s_eff * cap_slack)) // 8) * 8
    af = raster_cfg.active_fraction
    if af < 1.0:
        af = min(1.0, af * active_scale)
    return dataclasses.replace(raster_cfg, image_size=Hl, cap=cap,
                               active_fraction=af)


def shadow_cameras(cam, light_positions, hand_center, config: HarpConfig):
    """Light/camera extrinsics for the shadow pass
    (process_info_for_shadow, renderer_helper.py:454-468).

    cam: (B, 3) weak-perspective params; light_positions: (B, 3) world;
    hand_center: (B, 3) world mean of hand verts.
    Returns (light_R, light_T, cam_R, cam_T).
    """
    cam_T = cam_mod.weak_perspective_to_translation(cam, config.focal_length, config.img_size)
    B = cam.shape[0]
    cam_R = jnp.broadcast_to(jnp.asarray(cam_mod.OPENCV_TO_P3D_R), (B, 3, 3))

    # Project the light onto a sphere around the hand.
    delta = light_positions - hand_center
    radius = config.shadow_light_radius
    light_pos = hand_center + delta * (
        radius / jnp.maximum(safe_norm(delta, axis=1, keepdims=True), 1e-9)
    )
    light_R = cam_mod.look_at_rotation(light_pos, at=hand_center)
    light_T = cam_mod.translation_for_position(light_R, light_pos)
    return light_R, light_T, cam_R, cam_T


# f32 saturation band of d/dx sigmoid(x): below -104, sigmoid(x) computes
# exactly 0 (exp underflow); above 17, exactly 1 (1 + e^-x rounds to 1 once
# e^-x < 2^-24); either way s*(1-s) is exactly 0.0 in float32. Rows whose 9
# taps all sit outside (-104, 17) therefore contribute EXACTLY zero to the
# light-map gradient and can be dropped from the backward scatter.
_PCF_BAND_LO = -104.0
_PCF_BAND_HI = 17.0


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pcf_sum(stack, pos, a, sharp: float, grad_tiles: int, group: int):
    """sum_taps sigmoid((stack[pos] - a) * sharp) with a band-compacted
    backward scatter.

    stack: (B, Q, 9) pre-shifted tap planes; pos: (B, N) int32 tap-stack
    rows; a: (B, N) biased point depths. Returns (B, N).

    The backward w.r.t. `stack` is the transpose of the tap gather — a
    9-wide row scatter over ALL N rows (28.9 ms/step at 448^2 x B18, the
    single largest op in the train step). At sharpness ~1000 the sigmoid
    derivative is EXACTLY 0.0 in f32 outside a thin depth band (see
    _PCF_BAND_LO/HI), i.e. only shadow-boundary pixels carry gradient.
    grad_tiles > 0 selects the top grad_tiles groups of `group` consecutive
    rows by in-band pixel count (the compact path's pixel groups ARE the
    16x16 camera tiles) and scatters only those — exact whenever the band
    fits in the budget, which pcf_band_groups() verifies and
    tests/test_shading.py pins. grad_tiles == 0 keeps the dense scatter."""
    taps = jnp.take_along_axis(stack, pos[:, :, None], axis=1)
    return jax.nn.sigmoid((taps - a[:, :, None]) * sharp).sum(-1)


def _pcf_sum_fwd(stack, pos, a, sharp: float, grad_tiles: int, group: int):
    taps = jnp.take_along_axis(stack, pos[:, :, None], axis=1)
    vis = jax.nn.sigmoid((taps - a[:, :, None]) * sharp).sum(-1)
    return vis, (taps, pos, a, stack.shape[1])


def _pcf_sum_bwd(sharp: float, grad_tiles: int, group: int, res, g):
    taps, pos, a, Q = res
    B, N = pos.shape
    x = (taps - a[:, :, None]) * sharp
    s = jax.nn.sigmoid(x)
    sp = s * (1.0 - s) * sharp  # d tap; exactly 0 outside the f32 band
    upd = g[:, :, None] * sp  # (B, N, 9)
    da = -upd.sum(-1)
    brow = jnp.arange(B)[:, None]
    if grad_tiles <= 0 or grad_tiles * group >= N or N % group != 0:
        dstack = jnp.zeros((B, Q, 9), taps.dtype).at[brow, pos].add(upd)
    else:
        nG = N // group
        band = ((x > _PCF_BAND_LO) & (x < _PCF_BAND_HI)).any(-1)
        cnt = band.reshape(B, nG, group).sum(-1)  # (B, nG)
        _, sel = jax.lax.top_k(cnt, grad_tiles)  # (B, Gs) group ids
        sel_px = (
            sel[:, :, None] * group
            + jnp.arange(group, dtype=sel.dtype)[None, None, :]
        ).reshape(B, -1)
        pos_s = jnp.take_along_axis(pos, sel_px, axis=1)
        upd_s = jnp.take_along_axis(upd, sel_px[:, :, None], axis=1)
        dstack = jnp.zeros((B, Q, 9), taps.dtype).at[brow, pos_s].add(upd_s)
    return dstack, None, da


_pcf_sum.defvjp(_pcf_sum_fwd, _pcf_sum_bwd)


def pcf_band_groups(depth_light, x, y, a, config: HarpConfig, group: int = 256):
    """Per-frame count of `group`-pixel groups with any in-band PCF tap —
    the exact budget _pcf_sum's compacted backward needs for zero gradient
    truncation. Diagnostic (probe scripts + tests); not on the train path."""
    B, Hl = depth_light.shape[0], depth_light.shape[1]
    stack, pos = _tap_stack(depth_light, x, y)
    taps = jnp.take_along_axis(stack, pos[:, :, None], axis=1)
    xs = (taps - a.reshape(B, -1)[:, :, None]) * config.shadow_sharpness
    band = ((xs > _PCF_BAND_LO) & (xs < _PCF_BAND_HI)).any(-1)
    n = band.shape[1]
    nG = n // group
    return (band[:, : nG * group].reshape(B, nG, group).any(-1)).sum(-1)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pcf_sum_depth(depth_light, xf, yf, af, sharp: float, interpret: bool):
    """sum_taps sigmoid((tap - af) * sharp) with the Pallas backward.

    Same forward as _pcf_sum (tap-stack gather), but the custom-vjp boundary
    encloses the stack CONSTRUCTION too: the backward scatters the 9 tap
    gradients straight into the padded depth-map gradient with the MXU
    one-hot kernel (pallas/pcf_grad_kernel.py) and folds the edge padding —
    replacing both the 79.4 ms XLA row-scatter AND the pad/slice transpose.
    xf, yf: (B, N) int32 raw tap centers; af: (B, N) biased depths.
    """
    stack, pos = _tap_stack(depth_light, xf, yf)
    taps = jnp.take_along_axis(stack, pos[:, :, None], axis=1)
    return jax.nn.sigmoid((taps - af[:, :, None]) * sharp).sum(-1)


def _pcf_sum_depth_fwd(depth_light, xf, yf, af, sharp: float, interpret: bool):
    stack, pos = _tap_stack(depth_light, xf, yf)
    taps = jnp.take_along_axis(stack, pos[:, :, None], axis=1)
    vis = jax.nn.sigmoid((taps - af[:, :, None]) * sharp).sum(-1)
    return vis, (taps, xf, yf, af, depth_light.shape[1])


def _pcf_sum_depth_bwd(sharp: float, interpret: bool, res, g):
    from harp_tpu.render.pallas.pcf_grad_kernel import (
        pallas_pcf_scatter, fold_pad2,
    )

    taps, xf, yf, af, Hl = res
    x = (taps - af[:, :, None]) * sharp
    s = jax.nn.sigmoid(x)
    upd = g[:, :, None] * (s * (1.0 - s) * sharp)  # (B, N, 9)
    da = -upd.sum(-1)
    # Center coordinates in the twice-edge-padded map (matches _tap_stack:
    # row clip(y)+1 of the Hp-stack reads padded2 row clip(y)+2+di).
    yc = jnp.clip(yf, -1, Hl) + 2
    xc = jnp.clip(xf, -1, Hl) + 2
    dpad = pallas_pcf_scatter(yc, xc, upd, Hl, interpret=interpret)
    return fold_pad2(dpad), None, None, da


_pcf_sum_depth.defvjp(_pcf_sum_depth_fwd, _pcf_sum_depth_bwd)


def _use_pallas_pcf(config: HarpConfig) -> bool:
    if config.pcf_backend in ("pallas", "pallas_interpret"):
        return True
    if config.pcf_backend == "xla":
        return False
    # "auto": Mosaic kernel on TPU, XLA scatter elsewhere (same gate as
    # rasterizer._use_pallas).
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    return platform == "tpu"


def _tap_stack(depth_light, x, y):
    """Pre-shifted 9-tap stack (B, (Hl+2)^2, 9) + flat row positions (B, N)
    for integer tap centers x, y (see pcf_visibility PERF note)."""
    B, Hl = depth_light.shape[0], depth_light.shape[1]
    padded2 = jnp.pad(depth_light, ((0, 0), (2, 2), (2, 2)), mode="edge")
    Hp = Hl + 2
    planes = [
        padded2[:, 1 + di : 1 + di + Hp, 1 + dj : 1 + dj + Hp]
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
    ]
    stack = jnp.stack(planes, axis=-1).reshape(B, Hp * Hp, 9)
    u = jnp.clip(y.reshape(B, -1), -1, Hl) + 1
    v = jnp.clip(x.reshape(B, -1), -1, Hl) + 1
    return stack, u * Hp + v


def pcf_visibility(depth_light, x, y, a, config: HarpConfig,
                   group: int = 256):
    """3x3 percentage-closer filtering (renderer_helper.py:391-408).

    depth_light: (B, Hl, Hl) light-view depth map (-1 empty); x, y: (B, ...)
    int tap centers in light-map pixels; a: (B, ...) biased point depths.
    Returns mean_taps sigmoid((tap - a) * sharpness), shape (B, ...).

    PERF: the 9 taps are fetched as ONE gather of packed 9-float rows from a
    pre-shifted tap stack (B, (Hl+2)^2, 9) built by 9 static slices of an
    edge-padded map. Its transpose in the loss backward is a single 9-float
    row scatter + 9 slice-adds — vs 9 separate scalar gathers/scatters
    (measured 9 x ~4.4 ms gathers alone at 448^2 x B18). A 3x3 PATCH gather
    (jax.lax.gather with slice_sizes) would also be one op but its transpose
    lowers to a pathological scatter on TPU (4000 ms vs 87 ms, round-2
    micro bench) — the shifted-stack keeps the fast take_along_axis form.

    Exactness: tap (clip(y+di), clip(x+dj)) for y in [-1, Hl] equals
    padded2[clip(y,-1,Hl)+2+di] where padded2 edge-pads 2 rows/cols; for
    y < -1 or y > Hl every tap saturates to the same border row, identical
    to the clipped-sum form (parity-tested vs the 9-gather loop).

    The loss backward scatters tap grads through _pcf_sum, which drops
    rows outside the f32 sigmoid saturation band when
    config.pcf_grad_tiles > 0 (see _pcf_sum). `group` is the pixel-row
    group size of that compaction — callers on the compact path pass the
    raster tile area (tile^2) so groups ARE camera tiles; the full-image
    path keeps contiguous 256-pixel runs.
    """
    B = depth_light.shape[0]
    shape = a.shape
    if _use_pallas_pcf(config):
        vis = _pcf_sum_depth(
            depth_light, x.reshape(B, -1), y.reshape(B, -1),
            a.reshape(B, -1), config.shadow_sharpness,
            config.pcf_backend == "pallas_interpret",
        )
    else:
        stack, pos = _tap_stack(depth_light, x, y)
        vis = _pcf_sum(
            stack, pos, a.reshape(B, -1), config.shadow_sharpness,
            config.pcf_grad_tiles, group,
        )
    return (vis / 9.0).reshape(shape)


def _pcf_visibility_loop(depth_light, x, y, a, config: HarpConfig):
    """Reference 9-gather formulation of pcf_visibility (parity check)."""
    B, Hl = depth_light.shape[0], depth_light.shape[1]
    shape = a.shape
    flat = depth_light.reshape(B, -1)
    xf = x.reshape(B, -1)
    yf = y.reshape(B, -1)
    af = a.reshape(B, -1)
    vis = jnp.zeros_like(af)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            yy = jnp.clip(yf + di, 0, Hl - 1)
            xx = jnp.clip(xf + dj, 0, Hl - 1)
            tap = jnp.take_along_axis(flat, yy * Hl + xx, axis=1)
            vis = vis + jax.nn.sigmoid((tap - af) * config.shadow_sharpness)
    return (vis / 9.0).reshape(shape)


def render_rgb_with_shadow(
    verts, assets: AvatarAssets, config: HarpConfig, raster_cfg: RasterConfig,
    cam, light_positions, amb_ratio_logit, texture, normal_map,
    camera_raster=None,
):
    """Shadowed Phong color render (B, H, W, 3).

    amb_ratio_logit: scalar parameter; sigmoid gives the ambient fraction
    (reference optimize_sequence.py:480 nn.Sigmoid()(params['amb_ratio'])).
    camera_raster: optional precomputed (screen_c, hard_ids_c) to share the
    camera-view rasterization with the silhouette render.
    """
    from harp_tpu.render.rasterizer import get_ids

    hand_center = verts.mean(axis=1)
    light_R, light_T, cam_R, cam_T = shadow_cameras(cam, light_positions, hand_center, config)
    faces = assets.render_faces
    H = config.img_size

    # Pass 1: depth from the light, optionally at reduced resolution
    # (scaling focal length and image size together scales screen
    # coordinates uniformly).
    rcfg_l = light_raster_config(raster_cfg, config.shadow_map_scale)
    Hl = rcfg_l.image_size
    focal_l = config.focal_length * (Hl / H)
    screen_l = cam_mod.screen_from_world(verts, light_R, light_T, focal_l, Hl)
    _, ids_l = get_ids(screen_l, faces, rcfg_l, False, True)
    _, z_l, mask_l = barycentrics_of(ids_l, screen_l, faces, rcfg_l)
    # pytorch3d zbuf convention: -1 where no face.
    depth_light = jnp.where(mask_l, z_l, -1.0)

    # Pass 2: camera rasterization (possibly shared with the silhouette).
    if camera_raster is None:
        screen_c = cam_mod.screen_from_world(verts, cam_R, cam_T, config.focal_length, H)
        _, ids_c = get_ids(screen_c, faces, raster_cfg, False, True)
    else:
        screen_c, ids_c = camera_raster
    bary_c, _, mask_c = barycentrics_of(ids_c, screen_c, faces, raster_cfg)

    # World position of camera hits -> light view depth + light screen xy.
    points = shading.interpolate_face_vertex_attrs(verts, faces, ids_c, bary_c)
    B = verts.shape[0]
    pts_flat = points.reshape(B, -1, 3)
    view_l = cam_mod.world_to_view(pts_flat, light_R, light_T)
    depth_from_light = view_l[..., 2].reshape(B, H, H)
    screen_pts = cam_mod.view_to_screen(view_l, focal_l, Hl)
    x = jnp.round(screen_pts[..., 0]).astype(jnp.int32).reshape(B, H, H)
    y = jnp.round(screen_pts[..., 1]).astype(jnp.int32).reshape(B, H, H)

    # 3x3 PCF (renderer_helper.py:391-408), taps in light-map pixels.
    a = depth_from_light - config.shadow_bias
    vis = pcf_visibility(depth_light, x, y, a, config)

    amb = jax.nn.sigmoid(amb_ratio_logit)
    ambient_color = jnp.stack([amb] * 3)
    diffuse_color = 1.0 - ambient_color
    from harp_tpu.render.pipeline import _shade_pixels

    return _shade_pixels(
        verts, ids_c, bary_c, mask_c, assets, cam_R, cam_T, config, texture,
        normal_map, light_positions, ambient_color, diffuse_color,
        jnp.zeros(3, verts.dtype), vis_map=vis,
    )


def shadow_visibility_compact(verts, assets: AvatarAssets, config: HarpConfig,
                              raster_cfg: RasterConfig, cam, light_positions,
                              screen_c, rout, points=None):
    """Shadow PCF visibility for compact camera tiles -> vis (B, A, P).

    Light depth pass rasterizes compactly in the light view, scatters the
    depth map to a full image (fill -1, pytorch3d's empty-zbuf convention),
    then gathers the 3x3 PCF taps only for the camera's active pixels.
    Returns (vis, light_R, light_T, cam_R, cam_T, light_counts) where
    light_counts carries the light pass's raster-budget overflow counters
    ({"bin_overflow", "active_overflow"}, each (B,)) — the fit surfaces
    them in the loss breakdown so a truncated light view is loud.

    points: optional precomputed camera-hit world points (B, A, P, 3) from
    pipeline.pixel_geometry_compact — skips this function's own
    barycentric + interpolation recompute (shared with shading).
    """
    from harp_tpu.render.rasterizer import (
        raster_compact, as_faces_array, tile_pixel_coords,
        barycentrics_of_at, scatter_tiles,
    )

    faces = as_faces_array(assets.render_faces)
    hand_center = verts.mean(axis=1)
    light_R, light_T, cam_R, cam_T = shadow_cameras(
        cam, light_positions, hand_center, config
    )
    H = config.img_size
    rcfg_l = light_raster_config(raster_cfg, config.shadow_map_scale)
    Hl = rcfg_l.image_size
    focal_l = config.focal_length * (Hl / H)

    # Light pass (compact) -> full depth map.
    screen_l = cam_mod.screen_from_world(verts, light_R, light_T, focal_l, Hl)
    lout = raster_compact(screen_l, faces, rcfg_l, False, True)
    lpx, lpy = tile_pixel_coords(lout["act_idx"], rcfg_l)
    _, z_l, mask_l = barycentrics_of_at(lout["hard_ids"], screen_l, faces,
                                        rcfg_l, lpx, lpy)
    depth_c = jnp.where(mask_l, z_l, -1.0)
    depth_light = scatter_tiles(depth_c, lout["act_idx"], rcfg_l, -1.0)

    # Camera hit points (compact) -> light view -> PCF.
    if points is None:
        px, py = tile_pixel_coords(rout["act_idx"], raster_cfg)
        bary_c, _, _ = barycentrics_of_at(rout["hard_ids"], screen_c, faces,
                                          raster_cfg, px, py)
        from harp_tpu.render import shading as _shading

        points = _shading.interpolate_face_vertex_attrs(
            verts, faces, rout["hard_ids"], bary_c
        )
    B, A, P = rout["hard_ids"].shape
    view_l = cam_mod.world_to_view(points.reshape(B, -1, 3), light_R, light_T)
    depth_from_light = view_l[..., 2].reshape(B, A, P)
    spts = cam_mod.view_to_screen(view_l, focal_l, Hl)
    x = jnp.round(spts[..., 0]).astype(jnp.int32).reshape(B, A, P)
    y = jnp.round(spts[..., 1]).astype(jnp.int32).reshape(B, A, P)

    a = depth_from_light - config.shadow_bias
    vis = pcf_visibility(depth_light, x, y, a, config,
                         group=raster_cfg.tile * raster_cfg.tile)
    light_counts = {"bin_overflow": lout["bin_overflow"],
                    "active_overflow": lout["active_overflow"],
                    "span_overflow": lout["span_overflow"]}
    return vis, light_R, light_T, cam_R, cam_T, light_counts
