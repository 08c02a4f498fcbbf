"""SMPL-X right-arm hand model (HARP's SMPLXARM) as a pure JAX function.

Semantics studied at hand_models_harp/body_models.py:1904-2408 (+ the smplx
package's lbs it delegates to):

- full 55-joint SMPL-X LBS (shape + expression blendshapes, pose correctives)
- the optimizable right-wrist axis-angle is injected into body_pose dims
  60:63 (joint 21)
- output is wrist-centered (joint 21 subtracted) before translation
- extra "joints" are fingertip vertices appended after the 55 skeleton
  joints (smplx VertexJointSelector), and the arm correspondence file
  (template/arm/smplx_arm_corr.pkl) selects: the 1026-vert right-arm
  submesh, its 778-vert MANO subset, and the 22 output joints (21 MANO-order
  joints + right elbow)
- outputs scaled to millimeters.

The render mesh is this 1026-vert arm mesh subdivided once to 4083 verts by
the shared subdivision op.
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

# Standard SMPL-X kinematic tree (55 joints: 22 body, jaw, 2 eyes, 2x15 hand).
SMPLX_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 15, 15, 15,
     20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,  # left hand
     21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53]  # right hand
)
RIGHT_WRIST_JOINT = 21
RIGHT_ELBOW_JOINT = 19
NUM_JOINTS = 55
NUM_BODY_JOINTS = 21  # body_pose covers joints 1..21 (63 dof)

# VertexJointSelector extra-joint order (smplx vertex_joint_selector +
# vertex_ids): appended after the 55 skeleton joints -> indices 55..75.
EXTRA_JOINT_NAMES = [
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
]


@dataclasses.dataclass(frozen=True)
class SmplxArmModel:
    """Static SMPL-X assets + arm correspondence (numpy)."""

    v_template: np.ndarray  # (V, 3)
    shapedirs: np.ndarray  # (V, 3, S_betas)
    expr_dirs: np.ndarray  # (V, 3, S_expr)
    posedirs: np.ndarray  # (V, 3, 9*(K-1))
    J_regressor: np.ndarray  # (55, V)
    weights: np.ndarray  # (V, 55)
    parents: np.ndarray  # (55,)
    pose_mean: np.ndarray  # (165,)
    extra_joint_vertex_ids: np.ndarray  # (21,) fingertip/face vertex ids
    # Arm correspondence (smplx_arm_corr.pkl layout):
    arm_vert_idx: np.ndarray  # (1026,) right-arm submesh vertex ids
    mano_vert_from_arm: np.ndarray  # (778,) MANO verts within the arm mesh
    arm_faces: np.ndarray  # (2032, 3) faces over the arm submesh
    mano_faces: np.ndarray  # (1538, 3)
    joint_idx: np.ndarray  # (22,) output joints in MANO viz order + elbow

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def smplx_arm_forward(
    model: SmplxArmModel,
    betas: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: jnp.ndarray,
    right_hand_pose: jnp.ndarray,
    right_wrist_pose: jnp.ndarray | None = None,
    expression: jnp.ndarray | None = None,
    return_type: str = "mano_w_arm",
):
    """SMPLXARM.forward equivalent (body_models.py:2163-2390).

    Args (B-batched): betas (B, S), global_orient (B, 3), transl (B, 3),
    right_hand_pose (B, 45) axis-angle, right_wrist_pose (B, 3).

    Returns (verts_mm, joints_mm): the 1026-vert arm submesh (or its 778
    MANO subset for return_type='mano') and 22 joints, both in millimeters.
    """
    f32 = jnp.float32
    B = betas.shape[0]
    K = NUM_JOINTS

    body_pose = jnp.zeros((B, NUM_BODY_JOINTS * 3), f32)
    if right_wrist_pose is not None:
        body_pose = body_pose.at[:, 60:63].set(right_wrist_pose)
    zeros3 = jnp.zeros((B, 3), f32)
    left_hand = jnp.zeros((B, 45), f32)
    full_pose = jnp.concatenate(
        [global_orient, body_pose, zeros3, zeros3, zeros3, left_hand,
         right_hand_pose],
        axis=1,
    ) + jnp.asarray(model.pose_mean, f32)

    if expression is None:
        expression = jnp.zeros((B, model.expr_dirs.shape[-1]), f32)
    shape_comp = jnp.concatenate([betas, expression], axis=1)
    shapedirs = jnp.concatenate(
        [jnp.asarray(model.shapedirs, f32), jnp.asarray(model.expr_dirs, f32)], axis=-1
    )

    rotmats = axis_angle_to_matrix(full_pose.reshape(B, K, 3))
    pose_map = flat_pose_map(rotmats[:, 1:])

    v_template = jnp.asarray(model.v_template, f32)
    v_shaped = v_template + jnp.einsum("vcs,bs->bvc", shapedirs, shape_comp)
    joints_rest = jnp.einsum("kv,bvc->bkc", jnp.asarray(model.J_regressor, f32), v_shaped)
    v_posed = v_shaped + jnp.einsum(
        "vcp,bp->bvc", jnp.asarray(model.posedirs, f32), pose_map
    )

    levels = kinematic_levels(model.parents)
    R_g, t_g = forward_kinematics(rotmats, joints_rest, model.parents, levels)
    verts = linear_blend_skinning(
        R_g, t_g, joints_rest, jnp.asarray(model.weights, f32), v_posed
    )
    joints = t_g

    # Wrist-centering (body_models.py:2342-2343).
    wrist = joints[:, RIGHT_WRIST_JOINT : RIGHT_WRIST_JOINT + 1]
    verts = verts - wrist
    joints = joints - wrist

    # VertexJointSelector extras, then translation.
    extra = verts[:, jnp.asarray(model.extra_joint_vertex_ids)]
    joints_ext = jnp.concatenate([joints, extra], axis=1)
    verts = verts + transl[:, None]
    joints_ext = joints_ext + transl[:, None]

    arm_verts = verts[:, jnp.asarray(model.arm_vert_idx)] * 1000.0
    out_joints = joints_ext[:, jnp.asarray(model.joint_idx)] * 1000.0
    if return_type == "mano":
        return arm_verts[:, jnp.asarray(model.mano_vert_from_arm)], out_joints[:, :21]
    return arm_verts, out_joints


def load_smplx_arm(npz_path: str, corr_path: str, num_betas: int = 10,
                   num_expression: int = 10,
                   flat_hand_mean: bool = False) -> SmplxArmModel:
    """Load SMPLX_NEUTRAL.npz + smplx_arm_corr.pkl into a SmplxArmModel."""
    from harp_tpu.assets import load_arm_correspondence

    data = np.load(npz_path, allow_pickle=True)
    corr = load_arm_correspondence(corr_path)
    shapedirs_all = np.asarray(data["shapedirs"], np.float32)
    shapedirs = shapedirs_all[:, :, :num_betas]
    expr_dirs = shapedirs_all[:, :, 300 : 300 + num_expression]
    posedirs = np.asarray(data["posedirs"], np.float32)
    if posedirs.ndim == 2:  # (486, V*3) layout
        posedirs = posedirs.T.reshape(-1, 3, posedirs.shape[0])

    pose_mean = np.zeros(165, np.float32)
    if not flat_hand_mean:
        pose_mean[75:120] = np.asarray(data["hands_meanl"], np.float32)
        pose_mean[120:165] = np.asarray(data["hands_meanr"], np.float32)

    # Fingertip/face vertex ids: smplx vertex_ids table (public constants).
    vertex_ids = {
        "nose": 9120, "reye": 9929, "leye": 9448, "rear": 616, "lear": 6,
        "LBigToe": 5770, "LSmallToe": 5780, "LHeel": 8846,
        "RBigToe": 8463, "RSmallToe": 8474, "RHeel": 8635,
        "lthumb": 5361, "lindex": 4933, "lmiddle": 5058, "lring": 5169,
        "lpinky": 5286,
        "rthumb": 8079, "rindex": 7669, "rmiddle": 7794, "rring": 7905,
        "rpinky": 8022,
    }
    extra_ids = np.array([vertex_ids[n] for n in EXTRA_JOINT_NAMES])

    return SmplxArmModel(
        v_template=np.asarray(data["v_template"], np.float32),
        shapedirs=shapedirs,
        expr_dirs=expr_dirs,
        posedirs=posedirs,
        J_regressor=np.asarray(data["J_regressor"], np.float32),
        weights=np.asarray(data["weights"], np.float32),
        parents=SMPLX_PARENTS.copy(),
        pose_mean=pose_mean,
        extra_joint_vertex_ids=extra_ids,
        arm_vert_idx=corr["arm_vert"].astype(np.int64),
        mano_vert_from_arm=corr["mano_vert_from_arm"].astype(np.int64),
        arm_faces=corr["face"].astype(np.int32),
        mano_faces=corr["mano_face"].astype(np.int32),
        joint_idx=corr["mano_joint"].astype(np.int64),
    )
