"""MANO hand model as a pure JAX function.

Numerical semantics follow the reference layer (manopth/manolayer.py:108-296,
METRO-compatible configuration: use_pca=False, flat_hand_mean=False) so that
pose/shape parameters fitted by the preprocessing stage drive identical
geometry:

  verts, joints = mano_forward(model, pose48, betas10, trans3)

- pose48 = [global_rot(3), hand_pose(45 axis-angle or ncomps PCA coeffs)]
- output vertices (B, 778, 3) and 21 joints (B, 21, 3), both in millimeters
- 21 joints = 16 skeleton joints + 5 fingertip vertices, reordered to the
  visualization order used throughout HARP.

The model struct is plain numpy (static under jit); all math is f32 JAX.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from harp_tpu.ops.rotations import axis_angle_to_matrix, flat_pose_map
from harp_tpu.models.lbs import (
    kinematic_levels,
    forward_kinematics,
    linear_blend_skinning,
)

# Fingertip vertex ids (right / left hand) and the joint reorder used by the
# reference (manolayer.py:269-279).
TIPS_RIGHT = np.array([745, 317, 444, 556, 673])
TIPS_LEFT = np.array([745, 317, 445, 556, 673])
JOINT_REORDER = np.array(
    [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]
)


@dataclasses.dataclass(frozen=True)
class ManoModel:
    """Static MANO assets (numpy; treated as compile-time constants)."""

    v_template: np.ndarray  # (V, 3)
    shapedirs: np.ndarray  # (V, 3, S)
    posedirs: np.ndarray  # (V, 3, 9*(K-1))
    J_regressor: np.ndarray  # (K, V) dense
    weights: np.ndarray  # (V, K)
    faces: np.ndarray  # (F, 3) int32
    parents: np.ndarray  # (K,)
    hands_components: np.ndarray  # (45, 45) PCA basis (rows = components)
    hands_mean: np.ndarray  # (45,)
    tips_idx: np.ndarray  # (5,) fingertip vertex ids
    joint_reorder: np.ndarray  # (21,)
    use_pca: bool = False
    ncomps: int = 45
    flat_hand_mean: bool = False

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]


def mano_forward(
    model: ManoModel,
    pose_coeffs: jnp.ndarray,
    betas: jnp.ndarray,
    trans: jnp.ndarray,
):
    """MANO forward pass.

    Args:
      model: static ManoModel.
      pose_coeffs: (B, 3 + ncomps) [global_rot | hand pose coeffs].
      betas: (B, S) shape coefficients.
      trans: (B, 3) root translation (meters).

    Returns:
      verts: (B, V, 3) in millimeters.
      joints: (B, 21, 3) in millimeters, reference joint ordering.
    """
    f32 = jnp.float32
    pose_coeffs = pose_coeffs.astype(f32)
    betas = betas.astype(f32)
    trans = trans.astype(f32)
    B = pose_coeffs.shape[0]
    K = model.num_joints

    hand_coeffs = pose_coeffs[:, 3 : 3 + model.ncomps]
    if model.use_pca:
        comps = jnp.asarray(model.hands_components[: model.ncomps], f32)
        hand_pose = hand_coeffs @ comps
    else:
        hand_pose = hand_coeffs
    if not model.flat_hand_mean:
        hand_pose = hand_pose + jnp.asarray(model.hands_mean, f32)

    full_pose = jnp.concatenate([pose_coeffs[:, :3], hand_pose], axis=1)
    rotmats = axis_angle_to_matrix(full_pose.reshape(B, K, 3))
    pose_map = flat_pose_map(rotmats[:, 1:])  # (B, (K-1)*9)

    shapedirs = jnp.asarray(model.shapedirs, f32)
    posedirs = jnp.asarray(model.posedirs, f32)
    v_template = jnp.asarray(model.v_template, f32)
    J_reg = jnp.asarray(model.J_regressor, f32)

    v_shaped = v_template + jnp.einsum("vcs,bs->bvc", shapedirs, betas)
    joints_rest = jnp.einsum("kv,bvc->bkc", J_reg, v_shaped)
    v_posed = v_shaped + jnp.einsum("vcp,bp->bvc", posedirs, pose_map)

    levels = kinematic_levels(model.parents)
    R_g, t_g = forward_kinematics(rotmats, joints_rest, model.parents, levels)
    verts = linear_blend_skinning(
        R_g, t_g, joints_rest, jnp.asarray(model.weights, f32), v_posed
    )

    tips = verts[:, jnp.asarray(model.tips_idx)]
    joints = jnp.concatenate([t_g, tips], axis=1)
    joints = joints[:, jnp.asarray(model.joint_reorder)]

    verts = (verts + trans[:, None, :]) * 1000.0
    joints = (joints + trans[:, None, :]) * 1000.0
    return verts, joints
