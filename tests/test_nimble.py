"""NIMBLE adapter: forward semantics + hermetic end-to-end fit
(reference integration at utils/hand_model_utils.py:28-56 and
metro_modifications/hand_utils.py:244-360)."""

import numpy as np
import jax.numpy as jnp

from harp_tpu.config import HarpConfig
from harp_tpu.models.nimble import (
    build_synthetic_nimble,
    nimble_forward,
    nimble_to_mano,
    mano_protocol_joints,
)

MODEL = build_synthetic_nimble()


def test_forward_shapes_and_layers():
    B = 3
    pose = jnp.asarray(0.3 * np.random.RandomState(0).randn(B, 33), jnp.float32)
    betas = jnp.zeros((B, 20))
    trans = jnp.zeros((B, 3))
    skin, joints = nimble_forward(MODEL, pose, betas, trans)
    assert skin.shape == (B, MODEL.num_verts, 3)
    assert joints.shape == (B, 16, 3)
    muscle, _ = nimble_forward(MODEL, pose, betas, trans, layer="muscle")
    bone, _ = nimble_forward(MODEL, pose, betas, trans, layer="bone")
    assert np.all(np.isfinite(np.asarray(skin)))
    # Anatomical nesting at rest-ish pose: bone layer is strictly inside the
    # skin (it is a 0.6x shrink about the centroid in the synthetic model).
    c = np.asarray(skin).mean(1, keepdims=True)
    r_skin = np.linalg.norm(np.asarray(skin) - c, axis=-1).mean()
    r_bone = np.linalg.norm(np.asarray(bone) - c, axis=-1).mean()
    assert r_bone < r_skin


def test_zero_pose_matches_template_mm():
    pose = jnp.zeros((1, 33))
    # Cancel the pose mean so joint rotations are exactly identity.
    coeffs = -jnp.asarray(MODEL.pose_basis[:30] @ MODEL.pose_mean)
    # pose_basis rows are orthonormal => basis @ basis.T = I, so coeffs via
    # projection reproduce -pose_mean exactly.
    pose = pose.at[0, 3:].set(coeffs)
    skin, _ = nimble_forward(MODEL, pose, jnp.zeros((1, 20)), jnp.zeros((1, 3)))
    np.testing.assert_allclose(
        np.asarray(skin[0]) / 1000.0, MODEL.v_template, atol=2e-5
    )


def test_global_scale_about_root():
    rng = np.random.RandomState(1)
    pose = jnp.asarray(0.2 * rng.randn(1, 33), jnp.float32)
    v1, j1 = nimble_forward(MODEL, pose, jnp.zeros((1, 20)), jnp.zeros((1, 3)))
    v2, j2 = nimble_forward(MODEL, pose, jnp.zeros((1, 20)), jnp.zeros((1, 3)),
                            global_scale=jnp.asarray(2.0))
    root = np.asarray(j1[:, :1])
    np.testing.assert_allclose(
        np.asarray(v2), root + 2.0 * (np.asarray(v1) - root), rtol=1e-5,
        atol=1e-3,
    )


def test_mano_regression_and_joints():
    pose = jnp.asarray(0.2 * np.random.RandomState(2).randn(2, 33), jnp.float32)
    skin, _ = nimble_forward(MODEL, pose, jnp.zeros((2, 20)), jnp.zeros((2, 3)))
    mano_v = nimble_to_mano(MODEL, skin)
    assert mano_v.shape == (2, MODEL.mano_vreg_idx.shape[0], 3)
    joints = mano_protocol_joints(MODEL, mano_v)
    assert joints.shape == (2, 21, 3)
    assert np.all(np.isfinite(np.asarray(joints)))


def test_nimble_fit_e2e():
    """Few-epoch synthetic fit through the full driver with the NIMBLE
    family: loss must drop, params stay finite, raster budget respected."""
    from harp_tpu.models.zoo import load_hand_model
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params, FitData, fit_sequence
    from harp_tpu.render.rasterizer import RasterConfig

    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=False,
        total_epoch=4, training_stage=(2, 1, 1), batch_size=2, w_vgg=0.0,
        model_type="nimble",
    )
    assets, extras = load_hand_model(config, synthetic=True)
    rcfg = RasterConfig(image_size=64, tile=8, cap=512, bin_chunk=16,
                        tile_chunk=8, face_chunk=64, faces_per_pixel=8)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=2, seed=4, perturb=0.2
    )
    assert np.asarray(init["pose"]).shape[1] == 30  # NIMBLE PCA width
    assert np.asarray(init["shape"]).shape[1] == 20
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, assets, config)
    params, history = fit_sequence(config, assets, data, params, aux,
                                   rcfg=rcfg, extras=extras)
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0], losses
    assert np.all(np.isfinite(np.asarray(params["pose"])))
    assert all(h["bin_overflow"] == 0 for h in history)
