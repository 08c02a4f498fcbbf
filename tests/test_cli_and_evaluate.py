import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from harp_tpu.assets import build_synthetic_assets
from harp_tpu.config import HarpConfig
from harp_tpu.data.synthetic import make_synthetic_sequence
from harp_tpu.fit import init_params, FitData
from harp_tpu.fit.evaluate import evaluate_sequence
from harp_tpu.fit.resume import prepare_resume_params, interpolate_poses_30
from harp_tpu.render.rasterizer import RasterConfig
from harp_tpu.utils.io import save_result

ASSETS = build_synthetic_assets(uv_size=64)
RCFG = RasterConfig(image_size=64, tile=8, cap=256, bin_chunk=16, tile_chunk=8,
                    face_chunk=64, faces_per_pixel=8)


def test_evaluate_sequence_on_gt_params(tmp_path):
    """Evaluating at the ground-truth parameters must give near-perfect
    metrics (self-consistency of renderer + metrics)."""
    config = HarpConfig(img_size=64, focal_length=285.0, texture_size=64,
                        self_shadow=False, base_output_dir=str(tmp_path))
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=2, seed=0
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    aux = {"uv_mask": jnp.ones((64, 64))}
    stats = evaluate_sequence(config, ASSETS, data, gt, aux, rcfg=RCFG,
                              eval_batch=2, render_batch=2)
    assert stats["Silhouette IoU"] > 0.97
    assert stats["L1"] < 0.01
    assert stats["MS_SSIM"] > 0.97
    # Outputs written.
    assert os.path.exists(tmp_path / "rendered_after_opt" / "0000.jpg")
    assert os.path.exists(tmp_path / "uv_out" / "texture.png")
    assert os.path.exists(tmp_path / "eval_results.txt")
    # The posed frame-0 mesh is exported with UVs + MTL (reference
    # optimize_sequence.py:777-791) and round-trips through the OBJ loader.
    from harp_tpu.assets import load_obj_with_uv
    from harp_tpu.render import pipeline

    obj_path = tmp_path / "uv_out" / "final_mesh.obj"
    assert os.path.exists(obj_path)
    assert os.path.exists(tmp_path / "uv_out" / "final_mesh.mtl")
    v, f, vt, fuv = load_obj_with_uv(str(obj_path))
    v0, _ = pipeline.mesh_forward(gt, jnp.asarray([0]), ASSETS, config)
    np.testing.assert_allclose(v, np.asarray(v0[0]), atol=1e-5)
    np.testing.assert_array_equal(f, ASSETS.render_faces)
    np.testing.assert_allclose(vt, ASSETS.verts_uvs, atol=1e-5)
    np.testing.assert_array_equal(fuv, ASSETS.faces_uvs)
    assert "map_Kd texture.png" in open(tmp_path / "uv_out" / "final_mesh.mtl").read()


def test_interpolate_poses_30():
    pose = np.zeros((61, 45), np.float32)
    pose[30] = 30.0
    pose[60] = 60.0
    out = np.asarray(interpolate_poses_30(jnp.asarray(pose)))
    # Between frame 0 (0) and frame 30 (30): linear ramp. Only n//30 - 1
    # blocks are processed (reference loop bound), so frame 45 is untouched.
    np.testing.assert_allclose(out[15, 0], 15.0, atol=1e-4)
    np.testing.assert_allclose(out[45, 0], 0.0, atol=1e-4)


def test_resume_roundtrip(tmp_path):
    config = HarpConfig(img_size=64, texture_size=64, base_output_dir=str(tmp_path))
    n = 4
    params = {
        "pose": jnp.ones((n, 45)) * 0.1,
        "rot": jnp.asarray(np.random.RandomState(0).randn(n, 3), jnp.float32),
        "trans": jnp.asarray(np.random.RandomState(1).randn(n, 3), jnp.float32),
        "shape": jnp.zeros((10,)),
        "cam": jnp.ones((n, 3)),
        "texture": jnp.ones((64, 64, 3)),
    }
    save_result(params, str(tmp_path))
    input_params = {"pose": np.zeros((n, 45), np.float32)}
    out = prepare_resume_params(str(tmp_path), input_params, config)
    # trans/rot mean-pooled; missing keys backfilled.
    assert np.allclose(np.asarray(out["trans"]).std(0), 0)
    assert np.allclose(np.asarray(out["rot"]).std(0), 0)
    assert "wrist_pose" in out and "amb_ratio" in out and "normal_map" in out


@pytest.mark.slow
def test_cli_synthetic_smoke(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "fit_avatar.py", "--synthetic", "--img-size", "64",
         "--texture-size", "64", "--epochs", "3", "--stages", "1", "1", "1",
         "--batch-size", "2", "--n-frames", "2", "--no-shadow", "--no-vgg",
         "--out", str(tmp_path) + "/"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.load(open(tmp_path / "fit_summary.json"))
    assert "Silhouette IoU" in summary
    assert os.path.exists(tmp_path / "saved_params.pkl")
    assert os.path.exists(tmp_path / "config.yaml")


def test_known_appearance_transfer(tmp_path):
    """Test-mode flow: fit appearance on sequence A, freeze it, fit only
    pose/cam/lights on sequence B (reference known_appearance path)."""
    import dataclasses
    from harp_tpu.fit import fit_sequence
    from harp_tpu.fit.optimizer import group_param_names

    config_a = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=False,
        total_epoch=2, training_stage=(1, 1, 0), batch_size=2, w_vgg=0.0,
        base_output_dir=str(tmp_path),
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config_a, RCFG, n_frames=2, seed=5
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, ASSETS, config_a)
    params, _ = fit_sequence(config_a, ASSETS, data, params, aux, rcfg=RCFG)
    save_result(params, str(tmp_path))

    # New sequence with known appearance.
    config_b = dataclasses.replace(config_a, known_appearance=True)
    groups = group_param_names(config_b)
    assert "texture" not in groups["app"] and "shape" not in groups["coarse"]
    images2, masks2, masks_er2, gt2, init2 = make_synthetic_sequence(
        ASSETS, config_b, RCFG, n_frames=2, seed=6
    )
    from harp_tpu.fit.resume import prepare_resume_params

    params_b = prepare_resume_params(str(tmp_path), init2, config_b)
    data2 = FitData(images=images2, masks=masks2, masks_eroded=masks_er2)
    _, aux2 = init_params(init2, ASSETS, config_b)
    tex_before = np.asarray(params_b["texture"]).copy()
    params_b, hist = fit_sequence(config_b, ASSETS, data2, params_b, aux2, rcfg=RCFG)
    # Appearance frozen, pose optimized, test-suffix save works.
    np.testing.assert_array_equal(np.asarray(params_b["texture"]), tex_before)
    save_result(params_b, str(tmp_path), test=True)
    assert os.path.exists(tmp_path / "saved_params_test.pkl")


def test_config_yaml_roundtrip(tmp_path):
    """to_yaml must emit plain YAML lists for tuple fields: yaml.dump's
    !!python/tuple tag would make the dumped config.yaml unreadable by
    from_yaml's safe_load (found round 3: every dumped config was
    unloadable by its own loader)."""
    from harp_tpu.config import HarpConfig

    c = HarpConfig(training_stage=(50, 60, 70), batch_size=7,
                   background_color=(0.0, 0.5, 1.0))
    p = str(tmp_path / "config.yaml")
    c.to_yaml(p)
    c2 = HarpConfig.from_yaml(p)
    assert c2 == c
