import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.assets import build_synthetic_arm, build_synthetic_arm_assets
from harp_tpu.models.smplx_arm import smplx_arm_forward, SMPLX_PARENTS
from harp_tpu.ops.rotations import axis_angle_to_matrix

MODEL = build_synthetic_arm()


def _fwd(betas=None, rot=None, transl=None, hand=None, wrist=None, B=1, **kw):
    z = lambda n: jnp.zeros((B, n), jnp.float32)
    return smplx_arm_forward(
        MODEL,
        z(10) if betas is None else jnp.asarray(betas),
        z(3) if rot is None else jnp.asarray(rot),
        z(3) if transl is None else jnp.asarray(transl),
        z(45) if hand is None else jnp.asarray(hand),
        z(3) if wrist is None else jnp.asarray(wrist),
        **kw,
    )


def test_shapes_and_units():
    v, j = _fwd()
    assert v.shape == (1, MODEL.arm_vert_idx.shape[0], 3)
    assert j.shape == (1, 22, 3)
    # mm scale: arm is ~0.4m long -> extents of hundreds of mm.
    assert 100 < float(jnp.abs(v).max()) < 2000


def test_wrist_centered():
    """With zero transl the wrist joint (output joint 0) sits at the origin."""
    _, j = _fwd()
    np.testing.assert_allclose(np.asarray(j)[0, 0], 0.0, atol=1e-3)


def test_mano_subset():
    v_arm, j = _fwd(return_type="mano_w_arm")
    v_mano, j2 = _fwd(return_type="mano")
    assert v_mano.shape[1] == MODEL.mano_vert_from_arm.shape[0]
    np.testing.assert_allclose(
        np.asarray(v_arm)[:, MODEL.mano_vert_from_arm], np.asarray(v_mano), atol=1e-5
    )
    assert j2.shape == (1, 21, 3)


def test_translation_additive_mm():
    v0, j0 = _fwd()
    t = np.array([[0.05, -0.02, 0.1]], np.float32)
    v1, j1 = _fwd(transl=t)
    np.testing.assert_allclose(
        np.asarray(v1 - v0), np.tile(t * 1000, (1, v0.shape[1], 1)), atol=1e-2
    )


def test_wrist_pose_bends_hand_not_forearm():
    wrist = np.zeros((1, 3), np.float32)
    wrist[0, 2] = 0.8
    v0, j0 = _fwd()
    v1, j1 = _fwd(wrist=wrist)
    moved = np.linalg.norm(np.asarray(v1 - v0)[0], axis=1)
    n_hand = MODEL.mano_vert_from_arm.shape[0]
    # Hand verts move a lot; far-forearm verts barely (weights ~elbow).
    assert np.median(moved[:n_hand]) > 5.0
    far_forearm = moved[n_hand:][: (8 + 2)]  # first ring at the elbow end
    assert np.median(far_forearm) < 2.0
    # Elbow joint (output joint 21) unmoved.
    jd = np.linalg.norm(np.asarray(j1 - j0)[0], axis=1)
    assert jd[21] < 1e-2


def test_global_orient_rotates_about_pelvis_after_centering():
    """Global orientation rotates the whole arm; wrist-centering keeps the
    wrist at the origin, so verts rotate rigidly about the wrist."""
    rot = np.array([[0.0, 0.6, 0.0]], np.float32)
    v0, _ = _fwd()
    v1, _ = _fwd(rot=rot)
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(rot)))[0]
    expected = np.asarray(v0)[0] @ R.T
    np.testing.assert_allclose(np.asarray(v1)[0], expected, atol=1.0)  # mm


def test_hand_pose_moves_fingers():
    hand = np.zeros((1, 45), np.float32)
    hand[0, 2] = 1.0  # index MCP bend
    v0, j0 = _fwd()
    v1, j1 = _fwd(hand=hand)
    moved = np.linalg.norm(np.asarray(v1 - v0)[0], axis=1)
    assert moved.max() > 10.0
    jd = np.linalg.norm(np.asarray(j1 - j0)[0], axis=1)
    assert jd[8] > 5.0  # index tip (viz order)
    assert jd[21] < 1e-2  # elbow fixed


def test_jit_grad():
    def f(wrist):
        v, j = _fwd(wrist=wrist)
        return (v**2).sum()

    g = jax.grad(f)(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_arm_assets_render_smoke():
    import dataclasses
    from harp_tpu.config import HarpConfig
    from harp_tpu.render import pipeline
    from harp_tpu.render.rasterizer import RasterConfig

    assets = build_synthetic_arm_assets(uv_size=64)
    config = HarpConfig(img_size=64, focal_length=285.0, texture_size=64,
                        use_arm=True)
    rcfg = RasterConfig(image_size=64, tile=8, cap=256, bin_chunk=16,
                        tile_chunk=8, face_chunk=64, faces_per_pixel=8)
    n = 2
    V = assets.num_render_verts
    params = {
        "pose": jnp.zeros((n, 45), jnp.float32),
        "rot": jnp.zeros((n, 3), jnp.float32),
        "trans": jnp.zeros((n, 3), jnp.float32),
        "shape": jnp.zeros((10,), jnp.float32),
        "wrist_pose": jnp.zeros((n, 3), jnp.float32),
        "cam": jnp.asarray(np.tile([5.0, 0.05, -0.01], (n, 1)), jnp.float32),
        "verts_disps": jnp.zeros((V, 1), jnp.float32),
    }
    fids = jnp.asarray([0, 1])
    verts, joints = pipeline.mesh_forward(params, fids, assets, config)
    assert verts.shape == (2, V, 3)
    assert joints.shape == (2, 22, 3)
    R, T = pipeline.camera_for_frames(params, fids, config)
    alpha = np.asarray(pipeline.render_silhouette(verts, assets, R, T, config, rcfg))
    cov = (alpha[0] > 0.5).mean()
    assert 0.02 < cov < 0.95, cov
