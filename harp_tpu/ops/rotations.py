"""Rotation representations as pure JAX functions.

Semantics match the reference implementations used by HARP (studied at
/root/reference/manopth/rodrigues_layer.py, rot6d.py, rotproj.py) so that
converged parameters are interchangeable:

- axis-angle -> quaternion -> rotation matrix (the "Rodrigues" path used by
  the MANO layer, including its 1e-8 norm regularizer)
- 6D rotation representation (Zhou et al., CVPR'19)
- SVD projection of approximate matrices onto SO(3)

All functions are batched over leading axes and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def axis_angle_to_quaternion(axisang: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 4) quaternion (w, x, y, z).

    Mirrors reference `batch_rodrigues` (rodrigues_layer.py:43-51): the angle
    is the L2 norm of (v + 1e-8) — the epsilon keeps the gradient finite at
    the identity — and the axis is v / angle.
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3, 3) rotation matrix.

    Normalizes the quaternion first (reference quat2mat, rodrigues_layer.py:15-40).
    """
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def axis_angle_to_matrix(axisang: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix (quaternion path)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axisang))


def rot6d_to_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) continuous 6D representation -> (..., 3, 3) rotation matrix.

    Gram-Schmidt on the two 3-vectors (reference rot6d.py:4-24). The COLUMNS
    of the result are the orthonormalized basis vectors — the reference
    concatenates (x, y, z) along dim=2 of a (B, 3, 3) matrix (golden-pinned
    by tests/test_golden_parity.py against the executed reference).
    """
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-8)
    b3 = jnp.cross(b1, a2)
    b3 = b3 / jnp.linalg.norm(b3, axis=-1, keepdims=True).clip(1e-8)
    b2 = jnp.cross(b3, b1)
    return jnp.stack([b1, b2, b3], axis=-1)


def project_to_rotation(m: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) matrices onto SO(3) via SVD (reference rotproj.py:4-21).

    R = U diag(1, 1, det(UV^T)) V^T — the closest rotation in Frobenius norm.
    Unlike the reference (a Python loop over CPU SVDs), this is a batched
    XLA SVD.
    """
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return jnp.einsum("...ij,...j,...jk->...ik", u, d, vt)


def flat_pose_map(rotmats: jnp.ndarray) -> jnp.ndarray:
    """(..., K, 3, 3) rotation matrices -> (..., K*9) of (R - I) flattened.

    The SMPL/MANO pose-corrective feature (reference tensutils.subtract_flat_id).
    """
    eye = jnp.eye(3, dtype=rotmats.dtype)
    delta = rotmats - eye
    return delta.reshape(delta.shape[:-3] + (-1,))
