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
