import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.ops import rotations as R


def test_axis_angle_identity():
    m = R.axis_angle_to_matrix(jnp.zeros((4, 3)))
    np.testing.assert_allclose(m, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)


def test_axis_angle_known_rotations():
    # 90 deg about z
    m = R.axis_angle_to_matrix(jnp.array([[0.0, 0.0, np.pi / 2]]))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(m[0], expected, atol=1e-5)
    # 180 deg about x
    m = R.axis_angle_to_matrix(jnp.array([[np.pi, 0.0, 0.0]]))
    expected = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    np.testing.assert_allclose(m[0], expected, atol=1e-5)


def test_axis_angle_orthonormal_and_det1():
    rng = np.random.RandomState(0)
    v = rng.randn(32, 3).astype(np.float32)
    m = np.asarray(R.axis_angle_to_matrix(jnp.asarray(v)))
    np.testing.assert_allclose(
        m @ m.transpose(0, 2, 1), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(m), np.ones(32), atol=1e-5)


def test_rodrigues_matches_closed_form():
    # Compare against the classic Rodrigues formula.
    rng = np.random.RandomState(1)
    v = rng.randn(16, 3).astype(np.float64)
    theta = np.linalg.norm(v, axis=1, keepdims=True)
    k = v / theta
    K = np.zeros((16, 3, 3))
    K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
    K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
    ct = np.cos(theta)[..., None]
    st = np.sin(theta)[..., None]
    expected = np.eye(3) + st * K + (1 - ct) * (K @ K)
    got = np.asarray(R.axis_angle_to_matrix(jnp.asarray(v, jnp.float32)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_rot6d_recovers_rotation():
    rng = np.random.RandomState(2)
    v = rng.randn(8, 3).astype(np.float32)
    m = np.asarray(R.axis_angle_to_matrix(jnp.asarray(v)))
    six = m[:, :, :2].transpose(0, 2, 1).reshape(8, 6)  # first two COLUMNS
    # (reference rot6d.py:4-24 treats the 6d vector as two column vectors)
    got = np.asarray(R.rot6d_to_matrix(jnp.asarray(six)))
    np.testing.assert_allclose(got, m, atol=1e-4)


def test_project_to_rotation():
    rng = np.random.RandomState(3)
    v = rng.randn(8, 3).astype(np.float32)
    m = np.asarray(R.axis_angle_to_matrix(jnp.asarray(v)))
    noisy = m + 0.05 * rng.randn(8, 3, 3).astype(np.float32)
    p = np.asarray(R.project_to_rotation(jnp.asarray(noisy)))
    np.testing.assert_allclose(
        p @ p.transpose(0, 2, 1), np.tile(np.eye(3), (8, 1, 1)), atol=1e-4
    )
    np.testing.assert_allclose(np.linalg.det(p), np.ones(8), atol=1e-4)
    assert np.abs(p - m).max() < 0.1


def test_axis_angle_gradient_finite_at_zero():
    g = jax.grad(lambda v: R.axis_angle_to_matrix(v[None])[0].sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_gradcheck_axis_angle():
    # Finite-difference check in f64.
    with jax.enable_x64():
        v = jnp.asarray(np.random.RandomState(4).randn(3), jnp.float64)

        def f(x):
            return jnp.sum(jnp.sin(R.axis_angle_to_matrix(x[None])[0]) * 1.7)

        g = jax.grad(f)(v)
        eps = 1e-6
        for i in range(3):
            e = jnp.zeros(3, jnp.float64).at[i].set(eps)
            fd = (f(v + e) - f(v - e)) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=1e-5, atol=1e-7)
