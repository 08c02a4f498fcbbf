"""Temporal smoothness losses (reference loss/smooth.py:29-131).

Defined-but-uncalled in the reference's training loop; kept for parity and
usable either with in-batch neighbor indexing (single device) or with the
halo-exchange variant when the frame axis is sharded
(harp_tpu.parallel.halo.neighbor_shift).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def neighbor_fids(fids: jnp.ndarray, n_frames: int):
    """fid-1 / fid+1 with clamping at sequence boundaries
    (loss/smooth.py:38-40)."""
    left = jnp.where(fids % n_frames == 0, fids, fids - 1)
    right = jnp.where(fids % n_frames == n_frames - 1, fids, fids + 1)
    return left, right


def smooth_poses_loss(joints, joints_left, joints_right):
    """Root-aligned joints vs the (detached) 3-frame interpolation
    (LossSmoothPoses.smooth_pose, loss/smooth.py:29-72). Inputs in mm."""
    def root_align(j):
        return j - j[:, 0:1]

    j = root_align(joints)
    jl = root_align(joints_left)
    jr = root_align(joints_right)
    interp = jax.lax.stop_gradient((jl + j + jr) / 3.0)
    return jnp.sum((j - interp) ** 2) / joints.shape[0]


def smooth_roots_loss(joints, joints_left, joints_right,
                      cam, cam_left, cam_right,
                      focal_length: float, image_size: int):
    """Camera-relative root smoothing (LossSmoothRoots, loss/smooth.py:75-131).

    NOTE the reference uses the UNnegated (tx, ty) here, unlike the render
    camera — replicated.
    """
    def cam_rel(c, j):
        t = jnp.stack(
            [c[:, 1], c[:, 2], 2 * focal_length / (image_size * c[:, 0] + 1e-9)], 1
        )
        return t + jax.lax.stop_gradient(j[:, 0]) / 1000.0

    r = cam_rel(cam, joints)
    rl = cam_rel(cam_left, joints_left)
    rr = cam_rel(cam_right, joints_right)
    interp = jax.lax.stop_gradient((rl + r + rr) / 3.0)
    return jnp.sum((r - interp) ** 2) / joints.shape[0]
