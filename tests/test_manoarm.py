"""MANOARM (SMPL+H right-arm variant, body_models.py:885-1165) tests on the
synthetic 52-joint model."""

import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.models.manoarm import (
    ManoArmModel, manoarm_forward, build_synthetic_manoarm,
    SMPLH_PARENTS, REL_JOINT_IDX, NUM_JOINTS,
)

MODEL = build_synthetic_manoarm()


def _fwd(B=2, **over):
    kw = dict(
        betas=jnp.zeros((B, 10)),
        global_orient=jnp.zeros((B, 3)),
        transl=jnp.zeros((B, 3)),
        right_hand_pose=jnp.zeros((B, 45)),
    )
    kw.update(over)
    return manoarm_forward(MODEL, **kw)


def test_skeleton_layout():
    assert SMPLH_PARENTS.shape == (52,)
    # Right-hand chains are parented from wrist 21.
    assert all(SMPLH_PARENTS[j] == 21 for j in (37, 40, 43, 46, 49))
    # The reference's rel_joint_idx literal (incl. the joint-41 repeat,
    # body_models.py:1062) is preserved verbatim.
    assert REL_JOINT_IDX[15] == 41 and len(REL_JOINT_IDX) == 22


def test_rest_pose_meters_and_shapes():
    verts, joints = _fwd()
    assert verts.shape == (2, MODEL.arm_vert_idx.shape[0], 3)
    assert joints.shape == (2, 22, 3)
    # METERS (no x1000): the synthetic arm is ~0.5 m long.
    assert float(jnp.abs(verts).max()) < 2.0
    # Rest pose matches the sliced template (identity LBS).
    np.testing.assert_allclose(
        np.asarray(verts[0]), MODEL.v_template[MODEL.arm_vert_idx], atol=1e-5
    )


def test_no_wrist_centering():
    """Unlike SMPLXARM, translation moves outputs 1:1 with no wrist
    subtraction: shifting transl by d shifts every vertex by exactly d."""
    v0, j0 = _fwd()
    d = jnp.asarray([[0.1, -0.2, 0.3]] * 2)
    v1, j1 = _fwd(transl=d)
    dv = np.asarray(v1 - v0) - np.asarray(d)[:, None]
    dj = np.asarray(j1 - j0) - np.asarray(d)[:, None]
    assert np.abs(dv).max() < 1e-5 and np.abs(dj).max() < 1e-5


def test_right_hand_pose_moves_fingers_not_forearm():
    v0, _ = _fwd()
    pose = np.zeros((2, 45), np.float32)
    pose[:, 0:3] = [0.0, 0.0, 0.9]  # bend index MCP
    v1, _ = _fwd(right_hand_pose=jnp.asarray(pose))
    delta = np.abs(np.asarray(v1 - v0)).max(axis=-1)
    assert delta.max() > 0.005  # fingers moved
    # Forearm verts (weighted to elbow/wrist only) barely move — only the
    # (synthetic, dense) pose-corrective blendshapes touch them, orders of
    # magnitude below the skinned finger motion.
    fore_mask = np.asarray(MODEL.weights)[MODEL.arm_vert_idx, 19] > 0.5
    assert delta[:, fore_mask].max() < 0.05 * delta.max()


def test_global_orient_rotates_about_root():
    v0, j0 = _fwd()
    rot = jnp.asarray([[0.0, 0.0, np.pi / 2]] * 2)
    v1, j1 = _fwd(global_orient=rot)
    # Rigid rotation: pairwise distances preserved.
    d0 = np.linalg.norm(np.asarray(v0[0, :50]) - np.asarray(v0[0, 50:100]), axis=-1)
    d1 = np.linalg.norm(np.asarray(v1[0, :50]) - np.asarray(v1[0, 50:100]), axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-5)
    assert np.abs(np.asarray(v1 - v0)).max() > 0.01


def test_pca_hand_pose():
    m = build_synthetic_manoarm(use_pca=True)
    B = 2
    coeffs = jnp.asarray(0.3 * np.random.RandomState(0).randn(B, 6),
                         jnp.float32)
    v, j = manoarm_forward(
        m, jnp.zeros((B, 10)), jnp.zeros((B, 3)), jnp.zeros((B, 3)), coeffs
    )
    # PCA basis is identity rows -> equivalent to axis-angle on the first
    # 6 dof.
    full = jnp.zeros((B, 45)).at[:, :6].set(coeffs)
    v2, j2 = _fwd(B=B, right_hand_pose=full)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-5)


def test_jit_and_grad():
    f = jax.jit(lambda p: manoarm_forward(
        MODEL, jnp.zeros((1, 10)), p, jnp.zeros((1, 3)),
        jnp.zeros((1, 45)))[0].sum())
    g = jax.grad(f)(jnp.asarray([[0.1, 0.2, 0.3]]))
    assert np.all(np.isfinite(np.asarray(g)))
