"""Golden parity vs the REFERENCE implementation (executed, not cited).

Fixtures in tests/golden/*.npz were produced by scripts/gen_goldens.py,
which ran the reference's own torch code (manopth/rodrigues_layer.py,
manopth/rot6d.py, manopth/manolayer.py:108-296) in float64 on a
deterministic 778-vertex synthetic MANO-style model. These tests replay the
same inputs through the JAX implementations and pin the outputs.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from harp_tpu.models.mano import ManoModel, mano_forward, TIPS_RIGHT, JOINT_REORDER
from harp_tpu.ops.rotations import axis_angle_to_matrix, rot6d_to_matrix

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def rot_golden():
    return np.load(os.path.join(GOLDEN, "rotations_golden.npz"))


@pytest.fixture(scope="module")
def mano_golden():
    return np.load(os.path.join(GOLDEN, "mano_golden.npz"))


def test_rodrigues_matches_reference(rot_golden):
    got = np.asarray(axis_angle_to_matrix(jnp.asarray(rot_golden["axisang"])))
    np.testing.assert_allclose(got, rot_golden["rodrigues_out"], atol=2e-6)


def test_rot6d_matches_reference(rot_golden):
    got = np.asarray(rot6d_to_matrix(jnp.asarray(rot_golden["ortho6d"])))
    np.testing.assert_allclose(got, rot_golden["rot6d_out"], atol=2e-6)


def _model_from_golden(g, config: str) -> ManoModel:
    use_pca = config.startswith("pca")
    return ManoModel(
        v_template=g["model_v_template"],
        shapedirs=g["model_shapedirs"],
        posedirs=g["model_posedirs"],
        J_regressor=g["model_J_regressor"],
        weights=g["model_weights"],
        faces=g["model_faces"].astype(np.int32),
        parents=g["model_kintree_parents"],
        hands_components=g["model_hands_components"],
        hands_mean=g["model_hands_mean"],
        tips_idx=TIPS_RIGHT,
        joint_reorder=JOINT_REORDER,
        use_pca=use_pca,
        ncomps=6 if use_pca else 45,
        flat_hand_mean=(config == "aa_flat"),
    )


@pytest.fixture(scope="module")
def loss_golden():
    return np.load(os.path.join(GOLDEN, "losses_golden.npz"))


def test_kps_loss_matches_reference(loss_golden):
    """loss/kps_loss.py:4-18 — gt in mm, pred in meters (x1000 inside),
    root-aligned, (norm/100)^2 mean; arm mode compares the first 21 joints.
    Values and d/d(pred) pinned."""
    from harp_tpu.losses.basic import kps_anchor_loss
    import jax

    g = loss_golden
    for tag, use_arm in (("hand", False), ("arm", True)):
        gt = jnp.asarray(g[f"kps_{tag}_gt_mm"], jnp.float32)
        pred_m = jnp.asarray(g[f"kps_{tag}_pred_m"], jnp.float32)
        fn = lambda p: kps_anchor_loss(gt, p * 1000.0, use_arm=use_arm)
        val, grad = jax.value_and_grad(fn)(pred_m)
        np.testing.assert_allclose(float(val), g[f"kps_{tag}_val"], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(grad),
                                   g[f"kps_{tag}_grad_pred_m"],
                                   rtol=1e-4, atol=1e-6)


def test_texture_regs_match_reference(loss_golden):
    """loss/texture_reg.py:5-45 executed with captured neighbor offsets
    (its torch.normal draw), replayed through offsets=. Values + gradients."""
    from harp_tpu.losses import texture_reg as treg
    import jax

    g = loss_golden
    tex = jnp.asarray(g["treg_texture"], jnp.float32)
    nrm = jnp.asarray(g["treg_normal_map"], jnp.float32)
    mask = jnp.asarray(g["treg_uv_mask"], jnp.float32)
    offs = jnp.asarray(g["treg_offsets"])

    v, gr = jax.value_and_grad(
        lambda t: treg.albedo_reg(t, None, uv_mask=mask, offsets=offs)
    )(tex)
    np.testing.assert_allclose(float(v), g["treg_albedo_val"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), g["treg_albedo_grad"],
                               rtol=1e-4, atol=1e-7)

    v, gr = jax.value_and_grad(
        lambda t: treg.normal_reg(t, None, uv_mask=mask, offsets=offs)
    )(nrm)
    np.testing.assert_allclose(float(v), g["treg_normal_val"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), g["treg_normal_grad"],
                               rtol=1e-4, atol=1e-6)

    v, gr = jax.value_and_grad(treg.close_to_z_reg)(nrm)
    np.testing.assert_allclose(float(v), g["treg_closez_val"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), g["treg_closez_grad"],
                               rtol=1e-4, atol=1e-6)


def test_smooth_losses_match_reference(loss_golden):
    """loss/smooth.py:29-131 LossSmoothPoses/LossSmoothRoots executed with a
    deterministic linear stand-in layer (joints = reshape(x @ A^T), x =
    cat(rot,pose,shape,trans)). Pins the neighbor-fid clamping, root
    alignment, 3-frame interp, BOTH .detach() placements (via gradients to
    every param leaf), and the /N."""
    from harp_tpu.losses.smooth import (neighbor_fids, smooth_poses_loss,
                                        smooth_roots_loss)
    import jax

    g = loss_golden
    A = jnp.asarray(g["smooth_A"], jnp.float32)
    fid = jnp.asarray(g["smooth_fid"])
    F_ = int(g["smooth_nframes"])
    focal, res = float(g["smooth_focal"]), int(g["smooth_res"])
    params = {k: jnp.asarray(g["smooth_param_" + k], jnp.float32)
              for k in ("rot", "pose", "shape", "trans", "cam")}
    J = 21

    def joints_of(p, f):
        x = jnp.concatenate(
            [p["rot"][f], p["pose"][f],
             jnp.repeat(p["shape"], f.shape[0], 0), p["trans"][f]], axis=1
        )
        return (x @ A.T).reshape(-1, J, 3)

    fl, fr = neighbor_fids(fid, F_)

    def loss_poses(p):
        return smooth_poses_loss(joints_of(p, fid), joints_of(p, fl),
                                 joints_of(p, fr))

    v, gr = jax.value_and_grad(loss_poses)(params)
    np.testing.assert_allclose(float(v), g["smooth_poses_val"], rtol=1e-4)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gr[k]), g["smooth_poses_grad_" + k],
            rtol=2e-4, atol=1e-5, err_msg=f"smooth_poses grad[{k}]"
        )

    def loss_roots(p):
        return smooth_roots_loss(
            joints_of(p, fid), joints_of(p, fl), joints_of(p, fr),
            p["cam"][fid], p["cam"][fl], p["cam"][fr], focal, res,
        )

    v, gr = jax.value_and_grad(loss_roots)(params)
    np.testing.assert_allclose(float(v), g["smooth_roots_val"], rtol=1e-4)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gr[k]), g["smooth_roots_grad_" + k],
            rtol=2e-4, atol=1e-7, err_msg=f"smooth_roots grad[{k}]"
        )


def test_mano_forward_matches_reference(mano_golden):
    g = mano_golden
    n = int(g["n_cases"])
    assert n >= 5
    worst = 0.0
    for i in range(n):
        config = bytes(g[f"case{i}_config"]).decode()
        model = _model_from_golden(g, config)
        verts, joints = mano_forward(
            model,
            jnp.asarray(g[f"case{i}_pose"]),
            jnp.asarray(g[f"case{i}_betas"]),
            jnp.asarray(g[f"case{i}_trans"]),
        )
        # Outputs are in millimeters; 1e-2 mm = 10 micron agreement
        # (reference ran in f64, ours in f32 — the bound is the f32 noise
        # floor of the mm-scale pipeline).
        ev = np.abs(np.asarray(verts) - g[f"case{i}_verts"]).max()
        ej = np.abs(np.asarray(joints) - g[f"case{i}_joints"]).max()
        worst = max(worst, ev, ej)
        assert ev < 1e-2, f"case {i} ({config}): vertex err {ev}"
        assert ej < 1e-2, f"case {i} ({config}): joint err {ej}"
    print(f"max |err| over {n} cases: {worst:.2e} mm")
