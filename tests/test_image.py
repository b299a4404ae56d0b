import jax.numpy as jnp
import numpy as np

import ref_impl
from rgbd360_tpu.ops import image


def test_round_half_away():
    x = jnp.array([-1.5, -0.5, -0.4, 0.4, 0.5, 1.5, 2.5])
    got = np.asarray(image.round_half_away(x))
    expected = [ref_impl.round_c(v) for v in np.asarray(x)]
    np.testing.assert_array_equal(got, expected)


def test_gray_matches_opencv_fixed_point(rng):
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    got = np.asarray(image.bgr_to_gray_u8(jnp.asarray(img)))
    expected = (
        img[..., 0].astype(np.int64) * 4899
        + img[..., 1].astype(np.int64) * 9617
        + img[..., 2].astype(np.int64) * 1868
        + (1 << 13)
    ) >> 14
    np.testing.assert_array_equal(got, expected.astype(np.uint8))


def test_gradient_xy_matches_reference(rng):
    src = rng.normal(size=(12, 18)).astype(np.float32)
    gx, gy = image.gradient_xy(jnp.asarray(src))
    rgx, rgy = ref_impl.gradient_xy(src.astype(np.float64))
    np.testing.assert_allclose(np.asarray(gx), rgx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), rgy, atol=1e-5)


def test_depth_pyramid_matches_reference(rng):
    depth = rng.uniform(0.0, 8.0, size=(16, 24)).astype(np.float32)
    depth[rng.random(depth.shape) < 0.3] = 0.0
    got = np.asarray(image.depth_down_valid(jnp.asarray(depth), 0.3, 6.0))
    expected = ref_impl.depth_pyramid_down(depth.astype(np.float64))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_pyr_down_preserves_constant():
    img = jnp.full((32, 64), 3.25, jnp.float32)
    out = image.pyr_down(img)
    assert out.shape == (16, 32)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_pyr_down_matches_opencv_kernel(rng):
    # separable [1 4 6 4 1]/16 with reflect-101 borders, keep even rows/cols
    src = rng.normal(size=(10, 12)).astype(np.float64)
    k = np.array([1, 4, 6, 4, 1]) / 16.0
    pad = np.pad(src, 2, mode="reflect")
    blur = np.zeros_like(src)
    for r in range(src.shape[0]):
        for c in range(src.shape[1]):
            blur[r, c] = k @ pad[r : r + 5, c + 2 : c + 3].ravel() if False else sum(
                k[i] * sum(k[j] * pad[r + i, c + j] for j in range(5)) for i in range(5)
            )
    expected = blur[::2, ::2]
    got = np.asarray(image.pyr_down(jnp.asarray(src.astype(np.float32))))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_seam_mask_zeroes_joint_columns():
    g = jnp.ones((320, 1920), jnp.float32)
    masked = np.asarray(image.mask_sensor_seams(g))
    for s in range(1, 8):
        assert (masked[:, s * 240 - 1 : s * 240 + 1] == 0).all()
    assert masked.sum() == 320 * (1920 - 14)
