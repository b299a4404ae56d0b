import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.ops import se3


def test_skew_is_cross_product(rng):
    v = jnp.asarray(rng.normal(size=3).astype(np.float32))
    u = jnp.asarray(rng.normal(size=3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(se3.skew(v) @ u), np.cross(v, u), atol=1e-6)


def test_exp_so3_orthonormal(rng):
    w = jnp.asarray(rng.normal(size=3).astype(np.float32))
    R = se3.exp_so3(w)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(float(jnp.linalg.det(R)), 1.0, atol=1e-6)


def test_exp_log_roundtrip(rng):
    w = jnp.asarray((0.3 * rng.normal(size=3)).astype(np.float32))
    R = se3.exp_so3(w)
    np.testing.assert_allclose(np.asarray(se3.log_so3(R)), np.asarray(w), atol=1e-5)


def test_exp_small_angle():
    R = se3.exp_so3(jnp.array([1e-9, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)


def test_pseudo_exp_copies_translation():
    xi = jnp.array([0.1, -0.2, 0.3, 0.05, 0.02, -0.01])
    T = se3.exp_se3(xi, pseudo=True)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), [0.1, -0.2, 0.3], atol=1e-7)


def test_full_exp_matches_matrix_exponential(rng):
    from scipy.linalg import expm

    xi = (0.2 * rng.normal(size=6)).astype(np.float64)
    M = np.zeros((4, 4))
    M[:3, :3] = np.array(
        [[0, -xi[5], xi[4]], [xi[5], 0, -xi[3]], [-xi[4], xi[3], 0]]
    )
    M[:3, 3] = xi[:3]
    expected = expm(M)
    got = np.asarray(se3.exp_se3(jnp.asarray(xi.astype(np.float32)), pseudo=False))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_inverse():
    xi = jnp.array([0.1, -0.2, 0.3, 0.5, 0.2, -0.1])
    T = se3.exp_se3(xi, pseudo=False)
    np.testing.assert_allclose(np.asarray(se3.inverse(T) @ T), np.eye(4), atol=1e-6)
