import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.assets import build_synthetic_hand
from harp_tpu.models.mano import mano_forward, JOINT_REORDER
from harp_tpu.models.lbs import kinematic_levels, forward_kinematics
from harp_tpu.ops.rotations import axis_angle_to_matrix

MODEL = build_synthetic_hand()


def _fwd(pose, betas, trans):
    return mano_forward(MODEL, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(trans))


def test_zero_pose_is_template_mm():
    v, j = _fwd(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32),
                np.zeros((1, 3), np.float32))
    np.testing.assert_allclose(v[0], MODEL.v_template * 1000.0, atol=1e-2)
    assert j.shape == (1, 21, 3)


def test_translation_additive():
    t = np.array([[0.1, -0.2, 0.3]], np.float32)
    v0, j0 = _fwd(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32),
                  np.zeros((1, 3), np.float32))
    v1, j1 = _fwd(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32), t)
    np.testing.assert_allclose(np.asarray(v1 - v0), np.tile(t * 1000, (1, v0.shape[1], 1)), atol=1e-2)
    np.testing.assert_allclose(np.asarray(j1 - j0), np.tile(t * 1000, (1, 21, 1)), atol=1e-2)


def test_global_rotation_rigid():
    """A root-only rotation must rigidly rotate the whole mesh about the wrist."""
    rot = np.zeros((1, 48), np.float32)
    rot[0, :3] = [0.3, -0.5, 0.8]
    v0, _ = _fwd(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32),
                 np.zeros((1, 3), np.float32))
    v1, _ = _fwd(rot, np.zeros((1, 10), np.float32), np.zeros((1, 3), np.float32))
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(rot[:, :3])))[0]
    # Rotation pivot is the REGRESSED root joint (J_regressor @ template), mm.
    root = (MODEL.J_regressor @ MODEL.v_template)[0] * 1000.0
    # posedirs are nonzero random; zero them out of the comparison by using
    # the same (zero) hand pose for both -> pure rigid transform.
    expected = (np.asarray(v0)[0] - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(v1)[0], expected, atol=0.5)  # mm


def test_shape_mode0_scales():
    b = np.zeros((1, 10), np.float32)
    b[0, 0] = 0.5  # mode 0 = (v - centroid): scales about the centroid
    v0, _ = _fwd(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32),
                 np.zeros((1, 3), np.float32))
    v1, _ = _fwd(np.zeros((1, 48), np.float32), b, np.zeros((1, 3), np.float32))
    c = MODEL.v_template.mean(0) * 1000
    ratio = np.linalg.norm(np.asarray(v1)[0] - c, axis=1) / (
        np.linalg.norm(np.asarray(v0)[0] - c, axis=1) + 1e-9
    )
    # Joint positions also move, so skinning makes this approximate.
    assert 1.3 < np.median(ratio) < 1.7


def test_finger_curl_moves_only_that_finger():
    pose = np.zeros((1, 48), np.float32)
    # index finger joints are 1,2,3 -> pose dims 0:9 (after 3 root dims)
    pose[0, 3 + 2] = 1.0  # bend index MCP about z
    v0, j0 = _fwd(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32),
                  np.zeros((1, 3), np.float32))
    v1, j1 = _fwd(pose, np.zeros((1, 10), np.float32), np.zeros((1, 3), np.float32))
    moved = np.linalg.norm(np.asarray(v1 - v0)[0], axis=1)
    # Some verts move (the index finger), most don't (posedirs are tiny).
    assert moved.max() > 10.0  # mm
    assert np.median(moved) < 2.0
    # index tip (reordered joint 8) moves; pinky tip (reordered joint 20) doesn't.
    jd = np.linalg.norm(np.asarray(j1 - j0)[0], axis=1)
    assert jd[8] > 5.0
    assert jd[20] < 2.0


def test_forward_kinematics_chain():
    """Bending a parent joint by R rotates the child subtree positions."""
    model = MODEL
    B = 1
    rot = np.tile(np.eye(3, dtype=np.float32), (B, 16, 1, 1))
    joints_rest = jnp.asarray(model.J_regressor @ model.v_template)[None]
    Rg, tg = forward_kinematics(jnp.asarray(rot), joints_rest, model.parents)
    np.testing.assert_allclose(np.asarray(tg)[0], np.asarray(joints_rest)[0], atol=1e-6)


def test_jit_and_grad():
    f = jax.jit(lambda p, b, t: mano_forward(MODEL, p, b, t)[0].sum())
    g = jax.grad(f)(jnp.zeros((2, 48)), jnp.zeros((2, 10)), jnp.zeros((2, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_batching_consistent():
    rng = np.random.RandomState(0)
    pose = rng.randn(4, 48).astype(np.float32) * 0.3
    betas = rng.randn(4, 10).astype(np.float32) * 0.5
    trans = rng.randn(4, 3).astype(np.float32) * 0.1
    vb, jb = _fwd(pose, betas, trans)
    for i in range(4):
        vi, ji = _fwd(pose[i : i + 1], betas[i : i + 1], trans[i : i + 1])
        np.testing.assert_allclose(np.asarray(vb)[i], np.asarray(vi)[0], atol=1e-2)
        np.testing.assert_allclose(np.asarray(jb)[i], np.asarray(ji)[0], atol=1e-2)
