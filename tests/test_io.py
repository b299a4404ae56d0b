import os

import numpy as np

from rgbd360_tpu.io.boost_archive import RawFrame360, read_frame360_bin, write_frame360_bin
from rgbd360_tpu.io.clams import load_clams_model


def test_sample_roundtrip_byte_exact(reference_root, tmp_path):
    src = os.path.join(reference_root, "samples/sphere_images_1.bin")
    frame = read_frame360_bin(src)
    assert frame.rgb.shape == (8, 240, 320, 3)
    assert frame.depth.shape == (8, 240, 320)
    assert frame.rgb.dtype == np.uint8 and frame.depth.dtype == np.uint16
    out = tmp_path / "rt.bin"
    write_frame360_bin(str(out), frame)
    assert out.read_bytes() == open(src, "rb").read()


def test_synthetic_roundtrip(tmp_path, rng):
    rgb = rng.integers(0, 255, (8, 240, 320, 3), dtype=np.uint8)
    depth = rng.integers(0, 8000, (8, 240, 320), dtype=np.uint16)
    path = tmp_path / "syn.bin"
    write_frame360_bin(str(path), RawFrame360(rgb=rgb, depth=depth))
    back = read_frame360_bin(str(path))
    np.testing.assert_array_equal(back.rgb, rgb)
    np.testing.assert_array_equal(back.depth, depth)


def test_clams_model_shape(reference_root):
    m = load_clams_model(os.path.join(reference_root, "Calibration/Intrinsics/distortion_model1"))
    assert (m.width, m.height) == (640, 480)
    assert (m.bin_width, m.bin_height) == (8, 6)
    assert m.bin_depth == 2.0
    assert m.multipliers.shape == (80, 80, 5)
    q = m.downsample_params(2)
    assert (q.width, q.height, q.bin_width, q.bin_height) == (320, 240, 4, 3)
    # multipliers should be a mild correction around 1
    assert 0.5 < m.multipliers.min() and m.multipliers.max() < 1.5


def test_calib_extrinsics(calib):
    # sensor 0 is near-identity with a 5.2cm z offset (Rt_01.txt)
    np.testing.assert_allclose(calib.Rt[0][:3, :3], np.eye(3), atol=1e-6)
    assert abs(calib.Rt[0][2, 3] - 0.052) < 1e-6
    # all extrinsics are rigid transforms
    for s in range(8):
        R = calib.Rt[s][:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(calib.Rt[s] @ calib.Rt_inv[s], np.eye(4), atol=1e-5)
