"""Shading: UV texture sampling, TBN normal mapping, Phong lighting, blending.

Pure JAX on rasterizer outputs. Semantics follow the reference shader stack
(renderer/renderer_helper.py: phong_shading_PBR :147-190, SoftPhongNormalShader
:216-236; renderer/pbr_materials.py: compute_tangent/apply_normal_map :58-124;
pytorch3d TexturesUV sampling and point-light model), so converged appearance
parameters are interchangeable with the reference:

- texture sampling: bilinear, align_corners=True, border clamp, v flipped
  (uv origin bottom-left; texture row 0 is the top of the map)
- point light: ambient + diffuse * relu(n.l) + specular * relu(v.r)^shininess
- normal map applied in a per-pixel tangent frame built from the interpolated
  surface normal via the Pixar orthonormal-basis construction, with the two
  tangents negated (pbr_materials.py:105 convention)
- hard composite: covered pixels take the shaded color, background elsewhere
  (the reference's softmax_rgb_blend degenerates to exactly this for its
  blur=0 / gamma=1e-4 color renderers)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from harp_tpu.ops.numerics import safe_normalize
from harp_tpu.render.rasterizer import as_faces_array


def sample_texture_bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) texture at (..., 2) uv in [0,1]^2.

    align_corners=True grid: u=0 -> texel center 0, u=1 -> texel center W-1.
    v is flipped (uv origin bottom-left). Border padding (clamped).

    PERF: the 4 corner texels are fetched as ONE gather of packed 4C-float
    rows from a corner stack (H*W, 4C) built by 4 static slices of a
    bottom/right edge-padded texture. Its transpose in the loss backward
    (grad w.r.t. the 512^2 texture parameter) is a single row scatter + 4
    slice-adds — vs 4 separate scatters (round-3 measurement; ~23 ms of
    scatters + ~19 ms of gathers at 448^2 x B18). A 2x2 PATCH gather
    (jax.lax.gather with slice_sizes) would also be one op, but its
    transpose lowers to a pathological scatter on TPU (round-2 measurement:
    the full 448^2 x B8 train step regressed 267 ms -> 1412 ms) — the
    corner stack keeps the fast element-row gather form. Same pattern as
    the PCF taps in render/shadow.py.
    """
    H, W = tex.shape[0], tex.shape[1]
    C = tex.shape[-1]
    x = jnp.clip(uv[..., 0] * (W - 1), 0.0, W - 1)
    y = jnp.clip((1.0 - uv[..., 1]) * (H - 1), 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # Corner stack: plane (dy, dx) at (y0, x0) = tex[min(y0+dy, H-1),
    # min(x0+dx, W-1)] — exactly the clipped corner of the 4-gather form.
    padded = jnp.pad(tex, ((0, 1), (0, 1), (0, 0)), mode="edge")
    stack = jnp.concatenate(
        [padded[dy : dy + H, dx : dx + W] for dy in (0, 1) for dx in (0, 1)],
        axis=-1,
    ).reshape(H * W, 4 * C)
    rows = stack[y0i * W + x0i]  # (..., 4C)
    t00, t01 = rows[..., 0:C], rows[..., C : 2 * C]
    t10, t11 = rows[..., 2 * C : 3 * C], rows[..., 3 * C :]
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def _sample_texture_bilinear_4gather(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Reference 4-corner-gather formulation (parity check for the packed
    corner-stack sample_texture_bilinear)."""
    H, W = tex.shape[0], tex.shape[1]
    x = jnp.clip(uv[..., 0] * (W - 1), 0.0, W - 1)
    y = jnp.clip((1.0 - uv[..., 1]) * (H - 1), 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    t00 = tex[y0i, x0i]
    t01 = tex[y0i, x1i]
    t10 = tex[y1i, x0i]
    t11 = tex[y1i, x1i]
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def interpolate_face_vertex_attrs(
    attrs: jnp.ndarray, faces, ids: jnp.ndarray, bary: jnp.ndarray
) -> jnp.ndarray:
    """Interpolate per-vertex attributes at pixels.

    attrs: (B, V, C); faces: (F, 3); ids: (B, H, W) face ids (clipped at 0 for
    background, mask separately); bary: (B, H, W, 3). Returns (B, H, W, C).
    """
    faces = as_faces_array(faces)
    B, V, C = attrs.shape
    fattr = attrs[:, faces]  # (B, F, 3, C)
    safe = jnp.maximum(ids, 0)
    g = jnp.take_along_axis(
        fattr.reshape(B, -1, 3 * C), safe.reshape(B, -1, 1), axis=1
    ).reshape(ids.shape + (3, C))
    return (g * bary[..., None]).sum(-2)


def interpolate_packed_attrs(verts, normals_v, faces, verts_uvs, faces_uvs,
                             ids, bary) -> jnp.ndarray:
    """One-gather interpolation of (position | normal | uv) -> (B, H, W, 8).

    Packs per-face-vertex attributes (B, F, 3, 8) = [pos3, nrm3, uv2] and
    gathers once per pixel, instead of three separate gathers.
    """
    faces = as_faces_array(faces)
    faces_uvs = as_faces_array(faces_uvs)
    verts_uvs = jnp.asarray(verts_uvs)
    B = verts.shape[0]
    fuv = jnp.broadcast_to(verts_uvs[faces_uvs][None], (B,) + verts_uvs[faces_uvs].shape)
    packed = jnp.concatenate(
        [verts[:, faces], normals_v[:, faces], fuv], axis=-1
    )  # (B, F, 3, 8)
    safe = jnp.maximum(ids, 0)
    g = jnp.take_along_axis(
        packed.reshape(B, -1, 24), safe.reshape(B, -1, 1), axis=1
    ).reshape(ids.shape + (3, 8))
    return (g * bary[..., None]).sum(-2)


def pixel_uvs(ids: jnp.ndarray, bary: jnp.ndarray, verts_uvs, faces_uvs) -> jnp.ndarray:
    """Wedge-UV interpolation: (B, H, W, 2) uv coordinates at pixels."""
    verts_uvs = jnp.asarray(verts_uvs)
    faces_uvs = as_faces_array(faces_uvs)
    fuv = verts_uvs[faces_uvs]  # (F, 3, 2)
    safe = jnp.maximum(ids, 0)
    g = fuv.reshape(-1, 6)[safe].reshape(ids.shape + (3, 2))
    return (g * bary[..., None]).sum(-2)


def pixar_tangent_frame(normals: jnp.ndarray):
    """(..., 3) unit normals -> two tangents (u, v), each (..., 3).

    'Building an orthonormal basis, revisited' (Pixar 2017), matching
    pbr_materials.compute_tangent.
    """
    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    s = 2.0 * (z >= 0) - 1.0
    a = -1.0 / (s + z)
    b = x * y * a
    u = jnp.stack([1 + s * x * x * a, s * b, -s * x], axis=-1)
    v = jnp.stack([b, s + y * y * a, -y], axis=-1)
    return u, v


def apply_normal_map(pixel_normals: jnp.ndarray, sampled_nm: jnp.ndarray) -> jnp.ndarray:
    """Perturb surface normals by a tangent-space normal map sample.

    new_n = normalize(-u*nx - v*ny + n*nz): the TBN matrix rows are
    (-tangent_u, -tangent_v, n) per the reference's axis-flip convention
    (pbr_materials.py:100-116).
    """
    u, v = pixar_tangent_frame(pixel_normals)
    nx, ny, nz = sampled_nm[..., 0:1], sampled_nm[..., 1:2], sampled_nm[..., 2:3]
    out = -u * nx - v * ny + pixel_normals * nz
    return safe_normalize(out)


def phong_lighting(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    light_position: jnp.ndarray,
    camera_position: jnp.ndarray,
    ambient_color,
    diffuse_color,
    specular_color,
    shininess: float = 0.0,
):
    """Point-light Phong terms at pixels.

    points/normals: (B, H, W, 3) world space; light/camera position: (B, 3).
    Returns (ambient, diffuse, specular), each (B, H, W, 3).
    """
    nrm = safe_normalize(normals)
    ldir = light_position[:, None, None, :] - points
    ldir = safe_normalize(ldir)
    cos = (nrm * ldir).sum(-1, keepdims=True)
    amb = jnp.broadcast_to(jnp.asarray(ambient_color), points.shape[:1] + (1, 1, 3))
    diff = jnp.asarray(diffuse_color) * jax.nn.relu(cos)

    vdir = camera_position[:, None, None, :] - points
    vdir = safe_normalize(vdir)
    reflect = -ldir + 2.0 * cos * nrm
    alpha = jax.nn.relu((vdir * reflect).sum(-1, keepdims=True)) * (cos > 0)
    # The reference's non-shadow phong path uses pytorch3d's default
    # Materials with shininess=64 (renderer_helper.py:264, pbr_materials.py:18)
    # — a tight highlight; its shadow path has specular_color=(0,0,0)
    # (renderer_helper.py:441), where shininess is irrelevant. shininess=0
    # keeps torch.pow's alpha^0 := 1 semantics as a constant specular term,
    # special-cased because autodiff of power() emits 0 * alpha^-1 = NaN at
    # alpha == 0.
    if isinstance(shininess, (int, float)) and float(shininess) == 0.0:
        spec = jnp.asarray(specular_color) * jnp.ones_like(alpha)
    else:
        spec = jnp.asarray(specular_color) * jnp.power(alpha, shininess)
    return amb, diff, spec


def composite_hard(colors: jnp.ndarray, mask: jnp.ndarray, background) -> jnp.ndarray:
    """(B, H, W, 3) shaded colors composited over a constant background."""
    bg = jnp.asarray(background, colors.dtype)
    return jnp.where(mask[..., None], colors, bg)
