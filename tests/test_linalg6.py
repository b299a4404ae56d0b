import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.ops import linalg6


def _spd(rng, scale=1.0):
    A = rng.normal(size=(6, 6)) * scale
    return (A @ A.T + 1e-3 * np.eye(6)).astype(np.float32)


def test_solve6(rng):
    H = _spd(rng)
    b = rng.normal(size=6).astype(np.float32)
    x, ok = linalg6.solve6_sym(jnp.asarray(H), jnp.asarray(b))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(H, b), rtol=2e-3, atol=1e-4)


def test_solve6_large_scale(rng):
    # Hessians in the aligner have O(1e6) entries
    H = _spd(rng, scale=1e3)
    b = (rng.normal(size=6) * 1e4).astype(np.float32)
    x, ok = linalg6.solve6_sym(jnp.asarray(H), jnp.asarray(b))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(H, b), rtol=5e-3, atol=1e-5)


def test_singular_flagged(rng):
    H = np.zeros((6, 6), np.float32)
    H[0, 0] = 1.0  # rank 1
    x, ok = linalg6.solve6_sym(jnp.asarray(H), jnp.ones(6, jnp.float32))
    assert not bool(ok)
    assert not bool(linalg6.spd_well_posed(jnp.asarray(H), 1.0))


def test_well_posed(rng):
    H = _spd(rng)
    assert bool(linalg6.spd_well_posed(jnp.asarray(H), 1.0))
    assert not bool(linalg6.spd_well_posed(jnp.asarray(H * np.nan), 1.0))


def test_logdet(rng):
    H = _spd(rng)
    ld, ok = linalg6.logdet6_sym(jnp.asarray(H))
    assert bool(ok)
    np.testing.assert_allclose(float(ld), np.linalg.slogdet(H.astype(np.float64))[1], rtol=1e-3)


def test_inv(rng):
    H = _spd(rng)
    Hi, ok = linalg6.inv6_sym(jnp.asarray(H))
    np.testing.assert_allclose(np.asarray(Hi) @ H, np.eye(6), atol=2e-3)
