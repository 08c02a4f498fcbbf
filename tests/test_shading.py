import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.render import shading


def test_bilinear_sampling_corners_and_center():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    # align_corners=True: u=0,v=1 -> texel (0,0) (top-left since v flipped)
    val = shading.sample_texture_bilinear(tex, jnp.asarray([[0.0, 1.0]]))
    np.testing.assert_allclose(val[0, 0], 0.0, atol=1e-6)
    # u=1, v=0 -> bottom-right texel (3,3) = 15
    val = shading.sample_texture_bilinear(tex, jnp.asarray([[1.0, 0.0]]))
    np.testing.assert_allclose(val[0, 0], 15.0, atol=1e-6)
    # center: average of the 4 central texels (5,6,9,10) = 7.5
    val = shading.sample_texture_bilinear(tex, jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(val[0, 0], 7.5, atol=1e-5)


def test_bilinear_is_differentiable():
    tex = jnp.ones((8, 8, 3))
    g = jax.grad(lambda uv: shading.sample_texture_bilinear(tex, uv).sum())(
        jnp.asarray([[0.3, 0.7]])
    )
    assert np.all(np.isfinite(np.asarray(g)))


def test_pixar_frame_orthonormal():
    rng = np.random.RandomState(0)
    n = rng.randn(100, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    u, v = shading.pixar_tangent_frame(jnp.asarray(n))
    u, v = np.asarray(u), np.asarray(v)
    np.testing.assert_allclose((u * n).sum(1), 0, atol=1e-5)
    np.testing.assert_allclose((v * n).sum(1), 0, atol=1e-5)
    np.testing.assert_allclose((u * v).sum(1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1, atol=1e-5)


def test_normal_map_identity():
    """Sampling (0,0,1) from the normal map must leave normals unchanged."""
    rng = np.random.RandomState(1)
    n = rng.randn(50, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    flat = jnp.asarray(np.tile([0.0, 0.0, 1.0], (50, 1)).astype(np.float32))
    out = shading.apply_normal_map(jnp.asarray(n), flat)
    np.testing.assert_allclose(np.asarray(out), n, atol=1e-5)


def test_phong_lighting_head_on():
    # Surface at origin facing +z, light on +z axis: full diffuse.
    pts = jnp.zeros((1, 2, 2, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 2, 2, 3))
    light = jnp.asarray([[0.0, 0.0, 5.0]])
    campos = jnp.asarray([[0.0, 0.0, 3.0]])
    amb, diff, spec = shading.phong_lighting(
        pts, nrm, light, campos, (0.5,) * 3, (0.4,) * 3, (0.1,) * 3, shininess=0.0
    )
    np.testing.assert_allclose(np.asarray(amb), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(diff), 0.4, atol=1e-5)
    # shininess=0 -> specular = color wherever cos > 0 (alpha^0 == 1).
    np.testing.assert_allclose(np.asarray(spec), 0.1, atol=1e-5)


def test_phong_diffuse_grazing():
    pts = jnp.zeros((1, 1, 1, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 1, 1, 3))
    light = jnp.asarray([[5.0, 0.0, 0.0]])  # 90 degrees -> no diffuse
    campos = jnp.asarray([[0.0, 0.0, 3.0]])
    _, diff, spec = shading.phong_lighting(
        pts, nrm, light, campos, (0.5,) * 3, (0.4,) * 3, (0.1,) * 3, 0.0
    )
    np.testing.assert_allclose(np.asarray(diff), 0.0, atol=1e-5)
    # cos <= 0 -> alpha = 0 but 0^0 = 1 (reference quirk): spec stays.
    np.testing.assert_allclose(np.asarray(spec), 0.1, atol=1e-5)
