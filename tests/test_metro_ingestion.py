"""End-to-end METRO-output ingestion on the reference's on-disk layout.

Synthesizes a sequence, writes it EXACTLY as the reference preprocessing
would ({seq}/metro_mano_smooth/%04d_mano.pkl + {seq}/unscreen_cropped/
%04d.jpg + {seq}/mask/%04d_mask.jpg — utils/data_util.py:76-147), then
drives the real-data path end to end: load_sequences -> init_params ->
fit_sequence -> evaluate. This is the demo of dropping reference-format
preprocessing output onto the TPU pipeline unchanged (NEXT.md item 12)."""
import os

import numpy as np
import jax.numpy as jnp

from harp_tpu.assets import build_synthetic_assets
from harp_tpu.config import HarpConfig
from harp_tpu.data.dataset import load_sequences, save_frame_pkl
from harp_tpu.data.synthetic import make_synthetic_sequence
from harp_tpu.fit import init_params, FitData, fit_sequence
from harp_tpu.render.rasterizer import RasterConfig

ASSETS = build_synthetic_assets(uv_size=64)
RCFG = RasterConfig(image_size=64, tile=8, cap=512, bin_chunk=16, tile_chunk=8,
                    face_chunk=64, faces_per_pixel=8)


def _write_reference_layout(root, seq, images, masks, init):
    from PIL import Image

    img_dir = os.path.join(root, seq, "unscreen_cropped")
    mask_dir = os.path.join(root, seq, "mask")
    pkl_dir = os.path.join(root, seq, "metro_mano_smooth")
    for d in (img_dir, mask_dir, pkl_dir):
        os.makedirs(d)
    n = np.asarray(images).shape[0]
    params = {
        "joints": np.asarray(init["joints"]),
        "verts": np.zeros((n, 1, 3), np.float32),  # unused by the fit
        "rot": np.asarray(init["rot"]),
        "pose": np.asarray(init["pose"]),
        "shape": np.asarray(init["shape"]),
        "trans": np.asarray(init["trans"]),
        "cam": np.asarray(init["cam"]),
    }
    for i in range(n):
        Image.fromarray(
            (np.asarray(images[i]) * 255).astype(np.uint8)
        ).save(os.path.join(img_dir, "%04d.jpg" % i), quality=95)
        Image.fromarray(
            (np.asarray(masks[i]) * 255).astype(np.uint8), mode="L"
        ).save(os.path.join(mask_dir, "%04d_mask.jpg" % i), quality=95)
        save_frame_pkl(os.path.join(pkl_dir, "%04d_mano.pkl" % i), params, i)


def test_reference_layout_roundtrip_and_fit(tmp_path):
    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=False,
        total_epoch=4, training_stage=(2, 1, 1), batch_size=2, w_vgg=0.0,
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=3, seed=6, perturb=0.2
    )
    root = str(tmp_path / "data")
    _write_reference_layout(root, "1", images, masks, init)

    mano_params, imgs, msks, msks_er = load_sequences(
        root, root, ["1"], use_smooth_seq=True
    )
    # Parameter roundtrip through the per-frame pkl schema is exact.
    for k in ("pose", "rot", "trans", "cam", "shape"):
        np.testing.assert_allclose(
            mano_params[k], np.asarray(init[k]), atol=1e-6, err_msg=k
        )
    assert mano_params["joints"].shape == (3, 21, 3)
    # Images survive JPEG encoding to ~1% mean error.
    assert np.abs(imgs - np.asarray(images)).mean() < 0.015
    assert np.abs(msks - np.asarray(masks)).mean() < 0.03

    # Fit from the ingested data, exactly as fit_avatar.py does.
    data = FitData(
        images=jnp.asarray(imgs), masks=jnp.asarray(msks),
        masks_eroded=jnp.asarray(msks_er),
    )
    params, aux = init_params(mano_params, ASSETS, config)
    params, history = fit_sequence(config, ASSETS, data, params, aux, rcfg=RCFG)
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0], losses


def test_average_cam_sequence(tmp_path):
    config = HarpConfig(img_size=64, focal_length=285.0, texture_size=64)
    images, masks, _, _, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=3, seed=7
    )
    init = dict(init)
    init["cam"] = np.asarray(init["cam"]) + np.linspace(
        0, 0.3, 3
    )[:, None].astype(np.float32)
    root = str(tmp_path / "data")
    _write_reference_layout(root, "2", images, masks, init)
    mano_params, *_ = load_sequences(root, root, ["2"], use_smooth_seq=True,
                                     average_cam_sequence=True)
    # Per-sequence camera averaging (reference data_util.py:171-182).
    expect = np.asarray(init["cam"]).mean(0)
    np.testing.assert_allclose(mano_params["cam"], np.tile(expect, (3, 1)),
                               atol=1e-6)


def test_native_frameloader_feeds_the_fit(tmp_path):
    """The C++ frameloader path is the default real-data decode: it must
    produce the same arrays as the PIL fallback, and a short fit driven from
    its output must converge (NEXT round-2 #11 — decoder existed but had
    never fed a fit)."""
    import pytest
    from harp_tpu.native import load_frameloader

    if load_frameloader() is None:
        pytest.skip("native frameloader unavailable")

    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=False,
        total_epoch=3, training_stage=(1, 1, 1), batch_size=2, w_vgg=0.0,
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=3, seed=7, perturb=0.2
    )
    root = str(tmp_path / "data")
    _write_reference_layout(root, "1", images, masks, init)

    _, img_n, msk_n, er_n = load_sequences(root, root, ["1"], use_native=True)
    _, img_p, msk_p, er_p = load_sequences(root, root, ["1"], use_native=False)
    # libjpeg's IDCT may differ from PIL's by a couple of codes per pixel.
    assert np.abs(img_n - img_p).max() < 0.05
    assert np.abs(msk_n - msk_p).max() < 0.05
    assert np.abs(er_n - er_p).mean() < 0.02

    mano_params, imgs, msks, msks_er = load_sequences(root, root, ["1"],
                                                      use_native=True)
    data = FitData(images=jnp.asarray(imgs), masks=jnp.asarray(msks),
                   masks_eroded=jnp.asarray(msks_er))
    params, aux = init_params(mano_params, ASSETS, config)
    params, history = fit_sequence(config, ASSETS, data, params, aux, rcfg=RCFG)
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0], losses
