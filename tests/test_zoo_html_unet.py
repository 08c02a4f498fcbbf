import numpy as np
import jax
import jax.numpy as jnp
import pytest

from harp_tpu.config import HarpConfig
from harp_tpu.models.html import synthetic_texture_basis
from harp_tpu.models.unet import init_unet, unet_forward
from harp_tpu.models.zoo import load_hand_model
from harp_tpu.utils.opt_utils import get_vert_colors, min_max_scale


def test_zoo_synthetic_hand_and_arm():
    assets, extras = load_hand_model(HarpConfig(texture_size=64), synthetic=True)
    assert assets.num_render_verts > assets.model.num_verts  # subdivided
    assets_arm, _ = load_hand_model(
        HarpConfig(use_arm=True, texture_size=64), synthetic=True
    )
    assert assets_arm.model.arm_vert_idx.shape[0] > 0


def test_zoo_html_synthetic():
    assets, extras = load_hand_model(
        HarpConfig(model_type="html", texture_size=64), synthetic=True
    )
    basis = extras["texture_basis"]
    tex = basis.texture(jnp.zeros((basis.num_coeffs,)))
    assert tex.shape == (64, 64, 3)
    # Coefficients actually change the texture, differentiably.
    tex2 = basis.texture(jnp.ones((basis.num_coeffs,)) * 0.5)
    assert float(jnp.abs(tex2 - tex).max()) > 1e-3
    g = jax.grad(lambda c: basis.texture(c).sum())(jnp.zeros((basis.num_coeffs,)))
    assert np.all(np.isfinite(np.asarray(g)))
    # HTML path renders on the UNsubdivided mesh.
    assert assets.subdivision is None


def test_zoo_nimble_raises():
    with pytest.raises(NotImplementedError):
        load_hand_model(HarpConfig(model_type="nimble"), synthetic=True)


def test_unet_shapes_and_latent():
    params = init_unet(in_ch=3, out_ch=3, base=8, latent_dim=4)
    x = jnp.ones((2, 32, 32, 3))
    z = jnp.ones((2, 4))
    y = unet_forward(params, x, z)
    assert y.shape == (2, 32, 32, 3)
    g = jax.grad(lambda x: unet_forward(params, x, z).sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_vert_colors_range():
    v = np.random.RandomState(0).randn(100, 3)
    c = get_vert_colors(v)
    assert c.min() >= 0 and c.max() <= 1
    assert c.shape == (100, 3)
    s = min_max_scale(v)
    np.testing.assert_allclose(s.min(0), 0, atol=1e-6)
    np.testing.assert_allclose(s.max(0), 1, atol=1e-6)
