"""MANOARM: HARP's SMPL+H-based right-arm hand model as a pure JAX function.

Semantics studied at hand_models_harp/body_models.py:885-1165 (class MANOARM,
an SMPL subclass over SMPLH assets). Differences from SMPLXARM
(models/smplx_arm.py) that this module reproduces faithfully:

- 52-joint SMPL+H skeleton (22 body, 2x15 hands), 156-dof full pose =
  [global 3 | body 63 | left hand 45 | right hand 45] + pose_mean
  (body_models.py:1129-1135); hand poses optionally through the per-side PCA
  components (:1126-1131);
- NO right-wrist override and NO wrist-centering (both are SMPLXARM-only,
  :2299-2301, :2342-2343);
- outputs stay in METERS (SMPLXARM scales x1000; MANOARM.forward :1147-1152
  returns raw model units);
- vertices sliced to the right-arm submesh (template/arm/arm_vert.npy,
  :1049-1054), joints sliced by rel_joint_idx (:1062-1063) — 22 entries:
  wrist, right-hand chain joints, right fingertips, right elbow. The
  reference's index list contains a literal repeat of joint 41 at slot 15
  (body_models.py:1062) — replicated verbatim so outputs are interchangeable.
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

# SMPL+H kinematic tree: SMPL body joints 0..21, then 15 left-hand joints
# (parented from wrist 20), then 15 right-hand joints (from wrist 21).
SMPLH_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19,
     20, 22, 23, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35,  # left hand
     21, 37, 38, 21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50]  # right hand
)
NUM_JOINTS = 52
NUM_BODY_JOINTS = 21  # body_pose covers joints 1..21 (63 dof)
RIGHT_WRIST_JOINT = 21
RIGHT_ELBOW_JOINT = 19

# VertexJointSelector extra-joint order (same as SMPLX; appended after the
# 52 skeleton joints -> indices 52..72; right fingertips at 68..72).
EXTRA_JOINT_NAMES = [
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
]

# Reference output-joint selection (body_models.py:1062): wrist, right-hand
# chain, right tips, elbow — including the verbatim joint-41 repeat.
REL_JOINT_IDX = np.array(
    [21, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 41,
     68, 69, 70, 71, 72, 19]
)


@dataclasses.dataclass(frozen=True)
class ManoArmModel:
    """Static SMPL+H assets + right-arm slicing (numpy)."""

    v_template: np.ndarray  # (V, 3)
    shapedirs: np.ndarray  # (V, 3, S)
    posedirs: np.ndarray  # (V, 3, 9*(K-1))
    J_regressor: np.ndarray  # (52, V)
    weights: np.ndarray  # (V, 52)
    parents: np.ndarray  # (52,)
    pose_mean: np.ndarray  # (156,)
    hands_components_l: np.ndarray  # (45, 45) PCA basis rows
    hands_components_r: np.ndarray  # (45, 45)
    extra_joint_vertex_ids: np.ndarray  # (21,)
    arm_vert_idx: np.ndarray  # right-arm submesh vertex ids
    arm_faces: np.ndarray  # faces over the arm submesh
    joint_idx: np.ndarray  # (22,) REL_JOINT_IDX
    use_pca: bool = False
    num_pca_comps: int = 6

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def manoarm_forward(
    model: ManoArmModel,
    betas: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: jnp.ndarray,
    right_hand_pose: jnp.ndarray,
    body_pose: jnp.ndarray | None = None,
    left_hand_pose: jnp.ndarray | None = None,
):
    """MANOARM.forward equivalent (body_models.py:1096-1165).

    Args (B-batched): betas (B, S), global_orient (B, 3), transl (B, 3),
    right_hand_pose (B, 45) axis-angle or (B, num_pca_comps) PCA when
    model.use_pca. Returns (verts, joints) in METERS: the right-arm submesh
    and the 22 REL_JOINT_IDX joints.
    """
    f32 = jnp.float32
    B = betas.shape[0]
    K = NUM_JOINTS

    if body_pose is None:
        body_pose = jnp.zeros((B, NUM_BODY_JOINTS * 3), f32)
    if left_hand_pose is None:
        dim = model.num_pca_comps if model.use_pca else 45
        left_hand_pose = jnp.zeros((B, dim), f32)
    if model.use_pca:
        left_hand_pose = left_hand_pose @ jnp.asarray(
            model.hands_components_l[: model.num_pca_comps], f32)
        right_hand_pose = right_hand_pose @ jnp.asarray(
            model.hands_components_r[: model.num_pca_comps], f32)

    full_pose = jnp.concatenate(
        [global_orient, body_pose, left_hand_pose, right_hand_pose], axis=1
    ) + jnp.asarray(model.pose_mean, f32)

    rotmats = axis_angle_to_matrix(full_pose.reshape(B, K, 3))
    pose_map = flat_pose_map(rotmats[:, 1:])

    v_template = jnp.asarray(model.v_template, f32)
    v_shaped = v_template + jnp.einsum(
        "vcs,bs->bvc", jnp.asarray(model.shapedirs, f32), betas
    )
    joints_rest = jnp.einsum(
        "kv,bvc->bkc", jnp.asarray(model.J_regressor, f32), v_shaped
    )
    v_posed = v_shaped + jnp.einsum(
        "vcp,bp->bvc", jnp.asarray(model.posedirs, f32), pose_map
    )

    levels = kinematic_levels(model.parents)
    R_g, t_g = forward_kinematics(rotmats, joints_rest, model.parents, levels)
    verts = linear_blend_skinning(
        R_g, t_g, joints_rest, jnp.asarray(model.weights, f32), v_posed
    )
    joints = t_g

    # VertexJointSelector extras, then translation — NO wrist centering and
    # NO millimeter scaling (MANOARM semantics, body_models.py:1143-1152).
    extra = verts[:, jnp.asarray(model.extra_joint_vertex_ids)]
    joints_ext = jnp.concatenate([joints, extra], axis=1)
    verts = verts + transl[:, None]
    joints_ext = joints_ext + transl[:, None]

    arm_verts = verts[:, jnp.asarray(model.arm_vert_idx)]
    out_joints = joints_ext[:, jnp.asarray(model.joint_idx)]
    return arm_verts, out_joints


def load_manoarm(smplh_path: str, arm_vert_npy: str, arm_face_npy: str,
                 num_betas: int = 10, use_pca: bool = False,
                 num_pca_comps: int = 6,
                 flat_hand_mean: bool = False) -> ManoArmModel:
    """Load SMPLH_*.pkl/.npz + template/arm/arm_vert.npy / arm_face.npy
    (body_models.py:955-985, 1049-1058)."""
    if smplh_path.endswith(".npz"):
        data = dict(np.load(smplh_path, allow_pickle=True))
    else:
        from harp_tpu.assets import _load_pickle_no_chumpy, _to_numpy

        raw = _load_pickle_no_chumpy(smplh_path)
        data = {k: _to_numpy(v) for k, v in raw.items()}

    posedirs = np.asarray(data["posedirs"], np.float32)
    if posedirs.ndim == 2:  # (9*(K-1), V*3) layout
        posedirs = posedirs.T.reshape(-1, 3, posedirs.shape[0])
    pose_mean = np.zeros(156, np.float32)
    if not flat_hand_mean:
        pose_mean[66:111] = np.asarray(data["hands_meanl"], np.float32)
        pose_mean[111:156] = np.asarray(data["hands_meanr"], np.float32)

    # smplx vertex_ids['smplh'] table (public constants).
    vertex_ids = {
        "nose": 332, "reye": 6260, "leye": 2800, "rear": 4071, "lear": 583,
        "LBigToe": 3216, "LSmallToe": 3226, "LHeel": 3387,
        "RBigToe": 6617, "RSmallToe": 6624, "RHeel": 6787,
        "lthumb": 2746, "lindex": 2319, "lmiddle": 2445, "lring": 2556,
        "lpinky": 2673,
        "rthumb": 6191, "rindex": 5782, "rmiddle": 5905, "rring": 6016,
        "rpinky": 6133,
    }
    extra_ids = np.array([vertex_ids[n] for n in EXTRA_JOINT_NAMES])

    return ManoArmModel(
        v_template=np.asarray(data["v_template"], np.float32),
        shapedirs=np.asarray(data["shapedirs"], np.float32)[:, :, :num_betas],
        posedirs=posedirs,
        J_regressor=np.asarray(data["J_regressor"], np.float32),
        weights=np.asarray(data["weights"], np.float32),
        parents=SMPLH_PARENTS.copy(),
        pose_mean=pose_mean,
        hands_components_l=np.asarray(data["hands_componentsl"], np.float32),
        hands_components_r=np.asarray(data["hands_componentsr"], np.float32),
        extra_joint_vertex_ids=extra_ids,
        arm_vert_idx=np.load(arm_vert_npy).astype(np.int64),
        arm_faces=np.load(arm_face_npy).astype(np.int32),
        joint_idx=REL_JOINT_IDX.copy(),
        use_pca=use_pca,
        num_pca_comps=num_pca_comps,
    )


def build_synthetic_manoarm(n_ring: int = 8, seed: int = 0,
                            use_pca: bool = False) -> ManoArmModel:
    """Synthetic ManoArmModel: the procedural hand + forearm geometry mapped
    onto the 52-joint SMPL+H skeleton (right-hand chain joints 37..51,
    wrist 21, elbow 19). Exercises the MANOARM code path without the
    registration-gated SMPLH pkl."""
    from harp_tpu.assets import build_synthetic_hand, _tube, _resample_polyline

    rng = np.random.RandomState(seed + 23)
    hand = build_synthetic_hand(n_ring=n_ring, seed=seed)
    n_hand = hand.num_verts

    chain = np.stack(
        [np.array([-0.26, 0.0, 0.0]), np.array([-0.17, 0.0, 0.0]),
         np.array([-0.08, 0.0, 0.0]), np.array([0.01, 0.0, 0.0])], 0
    )
    radii = np.array([0.030, 0.032, 0.034, 0.036])
    fa_verts, fa_faces, _ = _tube(chain, radii, n_ring + 2)
    n_fore = fa_verts.shape[0]
    dummy = np.array([[0.0, -0.8, 0.0], [0.1, -0.8, 0.0], [0.0, -0.9, 0.1]],
                     np.float32)
    v_template = np.concatenate([hand.v_template, fa_verts, dummy], 0)
    V = v_template.shape[0]
    K = NUM_JOINTS

    # Hand skinning columns: wrist 0 -> 21, finger joint j in 1..15 -> 36+j.
    weights = np.zeros((V, K), np.float32)
    weights[:n_hand, 21] = hand.weights[:, 0]
    for j in range(1, 16):
        weights[:n_hand, 36 + j] = hand.weights[:, j]
    t = np.clip((fa_verts[:, 0] + 0.26) / 0.27, 0, 1)
    weights[n_hand:n_hand + n_fore, 19] = 1 - t
    weights[n_hand:n_hand + n_fore, 21] = t
    weights[n_hand + n_fore:, 0] = 1.0
    weights /= weights.sum(1, keepdims=True)

    J_reg = np.zeros((K, V), np.float32)
    J_reg[21, :n_hand] = hand.J_regressor[0]
    for j in range(1, 16):
        J_reg[36 + j, :n_hand] = hand.J_regressor[j]
    J_reg[19, n_hand:n_hand + n_ring + 2] = 1.0 / (n_ring + 2)
    for j in (0, 3, 6, 9, 14, 17):
        J_reg[j, n_hand + n_fore] = 1.0

    S = 10
    shapedirs = np.zeros((V, 3, S), np.float32)
    shapedirs[:, :, 0] = v_template - v_template.mean(0)
    for s in range(1, S):
        freq = rng.uniform(10.0, 40.0, size=3)
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        shapedirs[:, :, s] = 0.003 * np.sin(v_template @ freq)[:, None] * axis
    posedirs = (0.0001 * rng.randn(V, 3, 9 * (K - 1))).astype(np.float32)

    tip_map = {"rthumb": 0, "rindex": 1, "rmiddle": 2, "rring": 3, "rpinky": 4}
    extra_ids = np.zeros(len(EXTRA_JOINT_NAMES), np.int64) + (V - 1)
    for name, k in tip_map.items():
        extra_ids[EXTRA_JOINT_NAMES.index(name)] = hand.tips_idx[k]

    arm_vert_idx = np.arange(n_hand + n_fore)
    arm_faces = np.concatenate([hand.faces, fa_faces + n_hand], 0).astype(np.int32)

    return ManoArmModel(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=J_reg,
        weights=weights,
        parents=SMPLH_PARENTS.copy(),
        pose_mean=np.zeros(156, np.float32),
        hands_components_l=np.eye(45, dtype=np.float32),
        hands_components_r=np.eye(45, dtype=np.float32),
        extra_joint_vertex_ids=extra_ids,
        arm_vert_idx=arm_vert_idx,
        arm_faces=arm_faces,
        joint_idx=REL_JOINT_IDX.copy(),
        use_pca=use_pca,
    )
