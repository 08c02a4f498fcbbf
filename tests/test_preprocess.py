import numpy as np
import jax.numpy as jnp

from harp_tpu.assets import build_synthetic_hand
from harp_tpu.models.mano import mano_forward
from harp_tpu.preprocess import (
    fit_mano_to_vertices, remove_spike, smooth_pose_sequence,
    smooth_camera_sequence,
)

MODEL = build_synthetic_hand()


def test_fit_recovers_vertices():
    rng = np.random.RandomState(0)
    B = 2
    pose = np.zeros((B, 48), np.float32)
    pose[:, 3:] = 0.3 * rng.randn(B, 45)
    pose[:, :3] = 0.2 * rng.randn(B, 3)
    betas = (0.3 * rng.randn(B, 10)).astype(np.float32)
    trans = (0.05 * rng.randn(B, 3)).astype(np.float32)
    target, _ = mano_forward(MODEL, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(trans))
    out = fit_mano_to_vertices(MODEL, target, epoch_coarse=150, epoch_fine=400,
                               max_tries=2)
    # Vertex MSE in mm^2: reference gate is <= 10.0.
    assert out["fit_error"] <= 10.0, out["fit_error"]
    assert out["pose"].shape == (B, 45)
    # Fitted vertices match targets within a couple of mm.
    err = np.abs(np.asarray(out["verts"]) - np.asarray(target)).mean()
    assert err < 3.0, err


def test_remove_spike():
    n = 10
    pose = np.zeros((n, 45), np.float32)
    pose[5] = 3.0  # an isolated spike: both deltas around it are large
    out = np.asarray(remove_spike(jnp.asarray(pose)))
    np.testing.assert_allclose(out[5], 0.0, atol=1e-6)  # neighbor mean
    np.testing.assert_allclose(out[4], 0.0, atol=1e-6)
    # Smooth motion is untouched.
    smooth = np.cumsum(0.01 * np.ones((n, 45), np.float32), 0)
    out2 = np.asarray(remove_spike(jnp.asarray(smooth)))
    np.testing.assert_allclose(out2, smooth, atol=1e-6)


def _jittery_params(n=8, seed=1):
    rng = np.random.RandomState(seed)
    base = 0.2 * rng.randn(1, 45)
    pose = base + 0.05 * rng.randn(n, 45)
    params = {
        "rot": np.zeros((n, 3), np.float32),
        "pose": pose.astype(np.float32),
        "shape": np.zeros((n, 10), np.float32),
        "trans": np.zeros((n, 3), np.float32),
        "cam": np.tile([5.0, 0.0, 0.0], (n, 1)).astype(np.float32) + 0.02 * rng.randn(n, 3).astype(np.float32),
    }
    _, joints = mano_forward(
        MODEL, jnp.asarray(np.concatenate([params["rot"], params["pose"]], 1)),
        jnp.asarray(params["shape"]), jnp.asarray(params["trans"]),
    )
    params["joints"] = np.asarray(joints)
    return params


def _jitter(joints):
    j = joints - joints[:, 0:1]
    return float(((j[1:-1] - (j[:-2] + j[1:-1] + j[2:]) / 3) ** 2).sum())


def test_smooth_pose_sequence_reduces_jitter():
    params = _jittery_params()
    before = _jitter(np.asarray(params["joints"]))
    out = smooth_pose_sequence(MODEL, params, total_iters=200)
    after = _jitter(np.asarray(out["joints"]))
    assert after < before * 0.9, (before, after)


def test_smooth_camera_sequence_runs():
    params = _jittery_params()
    out = smooth_camera_sequence(MODEL, params, total_iters=100)
    assert out["cam"].shape == params["cam"].shape
    assert np.all(np.isfinite(np.asarray(out["cam"])))
    # Camera trajectory jitter (cam-relative) decreases.
    def cam_jitter(cam):
        c = np.asarray(cam)
        return float(((c[1:-1] - (c[:-2] + c[1:-1] + c[2:]) / 3) ** 2).sum())
    assert cam_jitter(out["cam"]) <= cam_jitter(params["cam"]) + 1e-6


def test_frame_pkl_roundtrip(tmp_path):
    from harp_tpu.data.dataset import save_frame_pkl, load_frame_pkl

    params = {
        "joints": np.zeros((2, 21, 3)), "verts": np.zeros((2, 100, 3)),
        "rot": np.zeros((2, 3)), "pose": np.zeros((2, 45)),
        "shape": np.zeros((2, 10)), "trans": np.zeros((2, 3)),
        "cam": np.asarray([[5.0, 0, 0], [5.0, 0, 0]]),
    }
    path = str(tmp_path / "0001_mano.pkl")
    save_frame_pkl(path, params, 0)
    loaded = load_frame_pkl(path)
    assert loaded["pose"].shape == (1, 45)
    assert loaded["cam"].shape == (3,)


def test_fit_arm_recovers_vertices():
    """GT recovery through the SMPLXARM fit-to-vertices variant
    (optimize_for_mano_arm_param, hand_utils.py:134-240)."""
    from harp_tpu.assets import build_synthetic_arm
    from harp_tpu.models.smplx_arm import smplx_arm_forward
    from harp_tpu.preprocess import fit_arm_to_vertices

    model = build_synthetic_arm()
    rng = np.random.RandomState(2)
    B = 2
    shape = (0.2 * rng.randn(B, 10)).astype(np.float32)
    rot = (0.15 * rng.randn(B, 3)).astype(np.float32)
    trans = (0.03 * rng.randn(B, 3)).astype(np.float32)
    pose = (0.25 * rng.randn(B, 45)).astype(np.float32)
    target, _ = smplx_arm_forward(
        model, jnp.asarray(shape), jnp.asarray(rot), jnp.asarray(trans),
        jnp.asarray(pose), jnp.zeros((B, 3)), return_type="mano",
    )
    out = fit_arm_to_vertices(model, target, epoch_coarse=150,
                              epoch_fine=400, max_tries=2)
    assert out["fit_error"] <= 10.0, out["fit_error"]
    err = np.abs(np.asarray(out["verts"]) - np.asarray(target)).mean()
    assert err < 3.0, err
    assert out["pose"].shape == (B, 45)
    assert out["joints"].shape[1] >= 21


def test_fit_nimble_recovers_vertices():
    """GT recovery through the NIMBLE fit-to-vertices variant
    (optimize_for_nimble_param, hand_utils.py:244-360)."""
    from harp_tpu.models.nimble import (
        build_synthetic_nimble, nimble_forward, nimble_to_mano,
    )
    from harp_tpu.preprocess import fit_nimble_to_vertices

    model = build_synthetic_nimble()
    rng = np.random.RandomState(4)
    B = 2
    posed = np.zeros((B, 3 + model.ncomps), np.float32)
    posed[:, :3] = 0.15 * rng.randn(B, 3)
    posed[:, 3:] = 0.3 * rng.randn(B, model.ncomps)
    shape = (0.2 * rng.randn(B, model.nshape)).astype(np.float32)
    trans = (0.03 * rng.randn(B, 3)).astype(np.float32)
    skin, _ = nimble_forward(model, jnp.asarray(posed), jnp.asarray(shape),
                             jnp.asarray(trans))
    target = nimble_to_mano(model, skin)
    out = fit_nimble_to_vertices(model, target, epoch_coarse=150,
                                 epoch_fine=400)
    assert out["fit_error"] <= 10.0, out["fit_error"]
    err = np.abs(np.asarray(out["verts"]) - np.asarray(target)).mean()
    assert err < 3.0, err
    assert out["pose"].shape == (B, model.ncomps)
    assert out["joints"].shape == (B, 21, 3)


def test_crop_unscreen_sequence(tmp_path):
    """Raw RGBA frames (alpha = Unscreen segmentation) -> the ingest layout
    (reference end2end_inference_handmesh.py:104-115,156-186): short side
    resized to res, center crop, white background through the soft mask,
    mask/%04d_mask.jpg + unscreen_cropped/%04d.jpg."""
    import numpy as np
    from PIL import Image
    from harp_tpu.preprocess.crop import (
        crop_unscreen_sequence, resize_center_crop, frame_index,
    )

    res = 64
    raw = tmp_path / "unscreen"
    raw.mkdir()
    H, W = 96, 128  # landscape: exercises the long-side crop
    rng = np.random.RandomState(0)
    for f in range(3):
        rgba = np.zeros((H, W, 4), np.uint8)
        rgba[..., :3] = rng.randint(0, 255, (H, W, 3))
        # centered disc of foreground alpha
        yy, xx = np.mgrid[:H, :W]
        rgba[..., 3] = np.where(
            (yy - H // 2) ** 2 + (xx - W // 2) ** 2 < (20 + f) ** 2, 255, 0
        )
        Image.fromarray(rgba).save(raw / ("%04d.png" % f))
    # a distractor the listing filter must skip
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(raw / "0000_pred.png")

    n = crop_unscreen_sequence(str(raw), str(tmp_path), res=res)
    assert n == 3
    for f in range(3):
        img = np.asarray(Image.open(
            tmp_path / "unscreen_cropped" / ("%04d.jpg" % f)))
        msk = np.asarray(Image.open(tmp_path / "mask" / ("%04d_mask.jpg" % f)))
        assert img.shape == (res, res, 3) and msk.shape == (res, res)
        # disc interior is foreground, far corners are white background
        assert msk[res // 2, res // 2] > 200 and msk[2, 2] < 50
        assert np.all(img[2, 2] > 240)
    assert frame_index(str(raw / "0002.png")) == 2

    # geometry: short side -> res, centered crop (torchvision arithmetic)
    im = Image.fromarray(np.zeros((96, 128), np.uint8))
    assert resize_center_crop(im, 64).size == (64, 64)

    # skip-if-done mirrors the reference (cropped dir present -> no rework)
    assert crop_unscreen_sequence(str(raw), str(tmp_path), res=res) == 3
