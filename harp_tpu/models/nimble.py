"""NIMBLE hand model adapter (reference utils/hand_model_utils.py:28-56,
metro_modifications/hand_utils.py:244-360).

NIMBLE (Li et al., SIGGRAPH'22) is a three-layer anatomical hand model:
bone + muscle + skin meshes driven by one 25-joint skeleton, with a
30-component PCA pose space and a 20-component shape space. The reference
integrates it through the external `NIMBLELayer` release and uses:

  skin_v, muscle_v, bone_v, joints, tex = layer.forward(pose30, shape20,
      tex10, rot, trans, global_scale)          # hand_utils.py:287-289
  mano_v = layer.nimble_to_mano(skin_v)          # hand_utils.py:290

This module provides the TPU-native equivalent on the same asset files
(NIMBLE_DICT_9137.pkl / NIMBLE_MANO_VREG.pkl, registration-gated):

- `NimbleModel`: plain-numpy asset struct (static under jit);
- `nimble_forward`: PCA pose -> axis-angle -> FK -> LBS skin verts + joints,
  sharing the level-batched LBS engine in harp_tpu.models.lbs;
- `nimble_to_mano`: per-vertex linear regression of the MANO-topology
  surface from skin vertices (the NIMBLE_MANO_VREG mapping);
- `build_synthetic_nimble`: procedural stand-in with identical structure
  so the whole fit path is exercised hermetically (the real release, like
  every hand-model asset here, is registration-gated — the reference has
  the same constraint, README.md NIMBLE section).

The muscle/bone layers ride the same skeleton: the adapter exposes them
through `nimble_forward(..., layer="skin"|"muscle"|"bone")`; HARP's
optimization renders the skin layer only (the reference does the same, it
discards muscle_v/bone_v outside debugging).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from harp_tpu.models.lbs import (
    kinematic_levels,
    forward_kinematics,
    linear_blend_skinning,
)
from harp_tpu.ops.rotations import axis_angle_to_matrix


@dataclasses.dataclass(frozen=True)
class NimbleModel:
    """Static NIMBLE assets (numpy; compile-time constants under jit)."""

    # Skin layer (the rendered surface).
    v_template: np.ndarray  # (V, 3)
    shapedirs: np.ndarray  # (V, 3, S) shape PCA (S=20 in the release)
    weights: np.ndarray  # (V, K) skinning weights
    faces: np.ndarray  # (F, 3)
    # Skeleton.
    J_regressor: np.ndarray  # (K, V) joints from skin verts
    parents: np.ndarray  # (K,)
    # Pose PCA: coeffs (P,) -> axis-angle of the K-1 non-root joints.
    pose_basis: np.ndarray  # (P, (K-1)*3), rows = components
    pose_mean: np.ndarray  # ((K-1)*3,)
    # Optional anatomical layers (same skeleton, own verts/weights).
    muscle_v_template: np.ndarray | None = None
    muscle_weights: np.ndarray | None = None
    bone_v_template: np.ndarray | None = None
    bone_weights: np.ndarray | None = None
    # MANO-surface regression (NIMBLE_MANO_VREG): mano_vert[i] =
    # sum_j vreg_w[i, j] * skin_v[vreg_idx[i, j]].
    mano_vreg_idx: np.ndarray | None = None  # (Vm, nk) int
    mano_vreg_w: np.ndarray | None = None  # (Vm, nk)
    # MANO-protocol joint extraction from the regressed surface.
    mano_J_regressor: np.ndarray | None = None  # (16, Vm)
    mano_tips_idx: np.ndarray | None = None  # (5,)
    mano_joint_reorder: np.ndarray | None = None  # (21,)
    ncomps: int = 30
    nshape: int = 20

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]


def nimble_forward(model: NimbleModel, pose_coeffs: jnp.ndarray,
                   betas: jnp.ndarray, trans: jnp.ndarray,
                   global_scale: jnp.ndarray | None = None,
                   layer: str = "skin"):
    """NIMBLE forward pass.

    Args:
      pose_coeffs: (B, 3 + ncomps) [global rot axis-angle | pose PCA coeffs].
      betas: (B, nshape) shape coefficients.
      trans: (B, 3) translation in meters.
      global_scale: optional (B,) or scalar uniform scale about the root
        (reference `global_scale`, hand_utils.py:287).
      layer: which anatomical layer's vertices to skin.

    Returns:
      verts: (B, V_layer, 3) millimeters.
      joints: (B, K, 3) skeleton joints, millimeters.
    """
    f32 = jnp.float32
    pose_coeffs = pose_coeffs.astype(f32)
    betas = betas.astype(f32)
    trans = trans.astype(f32)
    B = pose_coeffs.shape[0]
    K = model.num_joints

    coeffs = pose_coeffs[:, 3 : 3 + model.ncomps]
    basis = jnp.asarray(model.pose_basis[: model.ncomps], f32)
    body_pose = coeffs @ basis + jnp.asarray(model.pose_mean, f32)
    full_pose = jnp.concatenate([pose_coeffs[:, :3], body_pose], axis=1)
    rotmats = axis_angle_to_matrix(full_pose.reshape(B, K, 3))

    v_shaped = jnp.asarray(model.v_template, f32) + jnp.einsum(
        "vcs,bs->bvc", jnp.asarray(model.shapedirs, f32), betas
    )
    joints_rest = jnp.einsum(
        "kv,bvc->bkc", jnp.asarray(model.J_regressor, f32), v_shaped
    )

    levels = kinematic_levels(model.parents)
    R_g, t_g = forward_kinematics(rotmats, joints_rest, model.parents, levels)

    if layer == "skin":
        v_rest, weights = v_shaped, model.weights
    elif layer == "muscle":
        assert model.muscle_v_template is not None, "no muscle layer loaded"
        v_rest = jnp.broadcast_to(
            jnp.asarray(model.muscle_v_template, f32)[None],
            (B,) + model.muscle_v_template.shape,
        )
        weights = model.muscle_weights
    elif layer == "bone":
        assert model.bone_v_template is not None, "no bone layer loaded"
        v_rest = jnp.broadcast_to(
            jnp.asarray(model.bone_v_template, f32)[None],
            (B,) + model.bone_v_template.shape,
        )
        weights = model.bone_weights
    else:
        raise ValueError(f"unknown layer {layer!r}")

    verts = linear_blend_skinning(
        R_g, t_g, joints_rest, jnp.asarray(weights, f32), v_rest
    )
    joints = t_g

    if global_scale is not None:
        s = jnp.asarray(global_scale, f32).reshape(-1, 1, 1)
        root = joints[:, :1]
        verts = root + (verts - root) * s
        joints = root + (joints - root) * s

    verts = (verts + trans[:, None, :]) * 1000.0
    joints = (joints + trans[:, None, :]) * 1000.0
    return verts, joints


def nimble_to_mano(model: NimbleModel, skin_verts: jnp.ndarray) -> jnp.ndarray:
    """Regress the MANO-topology surface from skin vertices
    (reference nimble_to_mano, hand_utils.py:290)."""
    assert model.mano_vreg_idx is not None, "model has no MANO regression"
    idx = jnp.asarray(model.mano_vreg_idx)
    w = jnp.asarray(model.mano_vreg_w, skin_verts.dtype)
    return jnp.einsum("bvkc,vk->bvc", skin_verts[:, idx], w)


def mano_protocol_joints(model: NimbleModel, mano_verts: jnp.ndarray) -> jnp.ndarray:
    """21 MANO-protocol joints (16 skeleton + 5 fingertips, reordered) from
    the regressed MANO surface — the joint convention the keypoint-anchor
    loss uses for every model family (reference fits MANO joints to NIMBLE
    output the same way, hand_utils.py:296-299)."""
    J = jnp.einsum(
        "kv,bvc->bkc", jnp.asarray(model.mano_J_regressor, mano_verts.dtype),
        mano_verts,
    )
    tips = mano_verts[:, jnp.asarray(model.mano_tips_idx)]
    joints = jnp.concatenate([J, tips], axis=1)
    return joints[:, jnp.asarray(model.mano_joint_reorder)]


def load_nimble_model(pm_dict_pkl: str, vreg_pkl: str | None = None) -> NimbleModel:
    """Load the official NIMBLE release files (registration-gated).

    Expects NIMBLE_DICT_9137.pkl's documented keys: vert (skin template),
    skin_f, shape_basis, pose_basis, pose_mean, sw (skinning weights),
    jreg (joint regressor), parent; optional muscle_/bone_ counterparts.
    NIMBLE_MANO_VREG.pkl: lmk_faces_idx/lmk_bary_coords style per-vertex
    (index, weight) arrays. Raises a clear KeyError naming any missing key.
    """
    import pickle

    with open(pm_dict_pkl, "rb") as f:
        d = pickle.load(f, encoding="latin1")

    def need(*names):
        for n in names:
            if n in d:
                return np.asarray(d[n])
        raise KeyError(
            f"NIMBLE dict is missing {names}; available: {sorted(d)[:20]}"
        )

    v = need("vert", "skin_v_sealed", "skin_v").astype(np.float32)
    kwargs: dict = {}
    if vreg_pkl is not None:
        with open(vreg_pkl, "rb") as f:
            vr = pickle.load(f, encoding="latin1")
        kwargs["mano_vreg_idx"] = np.asarray(
            vr["idx"] if "idx" in vr else vr["lmk_faces_idx"]
        ).astype(np.int32)
        kwargs["mano_vreg_w"] = np.asarray(
            vr["weight"] if "weight" in vr else vr["lmk_bary_coords"]
        ).astype(np.float32)
    return NimbleModel(
        v_template=v,
        shapedirs=need("shape_basis", "shapedirs").astype(np.float32),
        weights=need("sw", "weights").astype(np.float32),
        faces=need("skin_f", "faces").astype(np.int32),
        J_regressor=need("jreg", "J_regressor").astype(np.float32),
        parents=need("parent", "parents").astype(np.int64).reshape(-1),
        pose_basis=need("pose_basis").astype(np.float32),
        pose_mean=need("pose_mean").astype(np.float32).reshape(-1),
        **kwargs,
    )


def build_synthetic_nimble(seed: int = 0) -> NimbleModel:
    """Procedural NIMBLE-structured model from the synthetic hand: the
    synthetic hand mesh becomes the skin layer, a shrunken copy the bone
    layer, PCA pose space = 30 random orthogonal directions in the 45-dof
    axis-angle space, 20 smooth shape directions, and an identity-ish
    MANO-surface regression (each "MANO" vertex = blend of 2 skin verts)."""
    from harp_tpu.assets import build_synthetic_hand
    from harp_tpu.models.mano import JOINT_REORDER

    m = build_synthetic_hand(n_ring=8, seed=seed)
    rng = np.random.RandomState(seed + 101)
    V, K = m.v_template.shape[0], 16

    q, _ = np.linalg.qr(rng.randn(45, 45))
    pose_basis = q[:30].astype(np.float32)  # (30, 45)
    # Mean inside the basis span: the identity pose is then exactly
    # representable by PCA coefficients (used by the zero-pose test).
    pose_mean = (pose_basis.T @ (0.05 * rng.randn(30))).astype(np.float32)

    extra = 0.002 * rng.randn(V, 3, 10).astype(np.float32)
    shapedirs = np.concatenate([m.shapedirs, extra], axis=2).astype(np.float32)

    centroid = m.v_template.mean(0, keepdims=True)
    bone_v = (centroid + 0.6 * (m.v_template - centroid)).astype(np.float32)

    nk = 2
    vreg_idx = np.stack(
        [np.arange(V), (np.arange(V) + 1) % V], axis=1
    ).astype(np.int32)
    w = rng.uniform(0.7, 1.0, (V, 1)).astype(np.float32)
    vreg_w = np.concatenate([w, 1.0 - w], axis=1)

    return NimbleModel(
        v_template=m.v_template,
        shapedirs=shapedirs,
        weights=m.weights,
        faces=m.faces,
        J_regressor=m.J_regressor,
        parents=m.parents,
        pose_basis=pose_basis,
        pose_mean=pose_mean,
        muscle_v_template=(centroid + 0.8 * (m.v_template - centroid)).astype(np.float32),
        muscle_weights=m.weights,
        bone_v_template=bone_v,
        bone_weights=m.weights,
        mano_vreg_idx=vreg_idx,
        mano_vreg_w=vreg_w,
        mano_J_regressor=m.J_regressor,
        mano_tips_idx=m.tips_idx,
        mano_joint_reorder=JOINT_REORDER,
        ncomps=30,
        nshape=20,
    )
