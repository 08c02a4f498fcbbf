"""Camera model: weak-perspective METRO cameras -> screen-space projection.

Replicates the reference chain (utils/visualize.py:258-285 +
pytorch3d PerspectiveCameras(in_ndc=False)) collapsed into one explicit
formula set:

- world -> view:  X_v = X_w @ R + T   (row-vector convention),
  with R = diag(-1,-1,1) for the OpenCV->render flip and
  T = (-tx, -ty, 2f / (size*s)) from the METRO weak-perspective cam (s,tx,ty).
- view -> screen: u = f*x_v/z_v + size/2, v = f*y_v/z_v + size/2, where
  (u, v) are pixel coordinates (origin top-left, pixel centers at +0.5).
  This is exactly where pytorch3d's screen-space projection + its NDC x/y
  flips land pixels, so rendered images are pixel-aligned with the reference.

Distances measured in pixels convert to pytorch3d NDC units by the factor
(2 / min(H, W)); the soft-rasterizer sigma/gamma/blur constants are defined
in NDC (renderer_helper.py:37-48) and converted in the rasterizer config.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from harp_tpu.ops.numerics import safe_norm, safe_normalize

# OpenCV-convention to render-convention axis flip (reference visualize.py:271).
OPENCV_TO_P3D_R = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)


def weak_perspective_to_translation(cam: jnp.ndarray, focal: float, image_size: int) -> jnp.ndarray:
    """(B, 3) METRO cam (s, tx, ty) -> (B, 3) camera translation T.

    T_z = 2 f / (size * s): the depth at which the weak-perspective scale s
    matches the perspective projection (reference visualize.py:268).
    """
    s, tx, ty = cam[:, 0], cam[:, 1], cam[:, 2]
    tz = 2.0 * focal / (image_size * s + 1e-9)
    return jnp.stack([-tx, -ty, tz], axis=1)


def world_to_view(verts: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3) @ (B, 3, 3) + (B, 3) row-vector convention."""
    return jnp.einsum("bvj,bjk->bvk", verts, R) + T[:, None, :]


def view_to_screen(view: jnp.ndarray, focal: float, image_size: int) -> jnp.ndarray:
    """(B, V, 3) view -> (B, V, 3) (u_px, v_px, z_view)."""
    z = view[..., 2]
    half = image_size / 2.0
    u = focal * view[..., 0] / z + half
    v = focal * view[..., 1] / z + half
    return jnp.stack([u, v, z], axis=-1)


def screen_from_world(
    verts: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray, focal: float, image_size: int
) -> jnp.ndarray:
    return view_to_screen(world_to_view(verts, R, T), focal, image_size)


def look_at_rotation(camera_position: jnp.ndarray, at: jnp.ndarray,
                     up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """(B, 3) positions -> (B, 3, 3) R with columns = camera x/y/z axes.

    Matches pytorch3d look_at_rotation (used by process_info_for_shadow,
    renderer_helper.py:466): z = normalize(at - pos), x = normalize(up x z),
    y = z x x; world_to_view is then X_v = (X - pos) @ R.
    """
    up = jnp.broadcast_to(jnp.asarray(up, camera_position.dtype), camera_position.shape)
    z = at - camera_position
    z = z / jnp.maximum(safe_norm(z, axis=-1, keepdims=True), 1e-5)
    x = jnp.cross(up, z)
    xn = safe_norm(x, axis=-1, keepdims=True)
    # Degenerate (up parallel to z): fall back to +X like pytorch3d.
    x = jnp.where(xn < 1e-5, jnp.asarray([1.0, 0.0, 0.0], z.dtype), x / jnp.maximum(xn, 1e-12))
    y = jnp.cross(z, x)
    y = safe_normalize(y)
    return jnp.stack([x, y, z], axis=-1)  # columns are axes


def translation_for_position(R: jnp.ndarray, position: jnp.ndarray) -> jnp.ndarray:
    """T such that world_to_view(X) = (X - position) @ R, i.e. T = -position @ R."""
    return -jnp.einsum("bj,bjk->bk", position, R)


def camera_center(R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """World-space camera center: solves C @ R + T = 0 -> C = -T @ R^T."""
    return -jnp.einsum("bj,bkj->bk", T, R)
