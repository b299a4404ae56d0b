"""Frame assembly parity: stitch + undistort vs the NumPy reference
transcription, on the bundled sample."""

import os

import numpy as np
import pytest

import ref_impl
from rgbd360_tpu.ops.undistort import undistort_depth

import jax.numpy as jnp


def test_stitch_matches_reference_scalar(calib, sample_frames):
    f1, _ = sample_frames
    sphere_rgb = np.asarray(f1.sphere_rgb)
    sphere_d = np.asarray(f1.sphere_depth_mm)
    rgb = np.asarray(f1.rgb)
    depth = np.asarray(f1.depth_raw_mm)
    K = calib.camera_matrix.astype(np.float64)

    # check two sensors' slices pixel-for-pixel against the scalar warp
    for sensor_id in (0, 3):
        ref_rgb, ref_d = ref_impl.stitch_sensor(
            rgb[sensor_id], depth[sensor_id],
            calib.Rt_inv[sensor_id].astype(np.float64), K, 320, 1920, sensor_id,
        )
        c0, c1 = (7 - sensor_id) * 240, (8 - sensor_id) * 240
        got_rgb = sphere_rgb[:, c0:c1]
        exp_rgb = ref_rgb[:, c0:c1]
        mismatch = (got_rgb != exp_rgb).any(axis=-1).mean()
        assert mismatch < 2e-3, f"sensor {sensor_id}: rgb mismatch {mismatch}"
        got_d = sphere_d[:, c0:c1].astype(np.int64)
        exp_d = ref_d[:, c0:c1].astype(np.int64)
        # f32 vs f64 obliquity can flip the u16 truncation by 1
        bad = np.abs(got_d - exp_d) > 1
        assert bad.mean() < 2e-3, f"sensor {sensor_id}: depth mismatch {bad.mean()}"


def test_sphere_depth_coverage(sample_frames):
    f1, _ = sample_frames
    cov = float((np.asarray(f1.sphere_depth_mm) > 0).mean())
    assert 0.7 < cov < 0.9


def test_undistort_matches_reference_scalar(calib, sample_frames, rng):
    f1, _ = sample_frames
    depth_m = np.asarray(f1.depth_raw_mm).astype(np.float32) * 0.001
    got = np.asarray(f1.depth_undistorted_m)  # produced by the batched kernel

    # spot-check 200 random pixels per 2 sensors with the scalar CLAMS rule
    for sensor_id in (0, 5):
        model = calib.intrinsic_model[sensor_id]
        for _ in range(200):
            v = int(rng.integers(0, 240))
            u = int(rng.integers(0, 320))
            z = float(depth_m[sensor_id, v, u])
            expected = ref_impl.interpolated_undistort(z, model, v, u)
            assert got[sensor_id, v, u] == pytest.approx(expected, rel=1e-5, abs=1e-6)


def test_sphere_cloud_from_image(sample_frames):
    f1, _ = sample_frames
    xyz, rgb = f1.build_sphere_cloud_from_image()
    xyz = np.asarray(xyz)
    assert xyz.shape == (320, 1920, 3)
    d = np.asarray(f1.sphere_depth_mm)
    assert np.isnan(xyz[d == 0]).all()
    valid = d > 0
    norms = np.linalg.norm(xyz[valid], axis=-1)
    np.testing.assert_allclose(norms, d[valid] * 0.001, rtol=1e-4, atol=1e-4)


def test_stitch_matches_golden_panorama_bytes(calib, reference_root):
    """The stitched panorama must stay byte-identical to the committed
    golden capture (tests/golden/pair_1_10.npz stores the stitch output of
    tools/make_golden.py) — locks stitch parity across optimizations (the
    16-byte packed-row gather rewrite was verified against this)."""
    golden = os.path.join(os.path.dirname(__file__), "golden", "pair_1_10.npz")
    if not os.path.exists(golden):
        import pytest

        pytest.skip("golden npz not generated")
    import jax.numpy as jnp

    from rgbd360_tpu.core.frame360 import Frame360

    z = np.load(golden)
    f2 = Frame360(calib, 1).build(
        os.path.join(reference_root, "samples", "sphere_images_10.bin")
    )
    gray_u8 = np.asarray(
        jnp.round(f2.sphere_gray * 255.0).astype(jnp.uint8)
    )
    np.testing.assert_array_equal(gray_u8, z["gray_src_u8"])
    np.testing.assert_array_equal(np.asarray(f2.sphere_depth_mm), z["depth_src_mm"])


def test_build_sphere_cloud_fast(calib, reference_root):
    """buildSphereCloud_fast (Frame360.h:522-552): full-res undistorted
    backprojection through the extrinsics, no filtering — points at valid
    depths must land at depth-consistent radii from their sensor centers."""
    from rgbd360_tpu.core.frame360 import Frame360

    f = Frame360(calib, 0)
    f.load_frame(os.path.join(reference_root, "samples", "sphere_images_1.bin"))
    f.undistort()
    xyz, rgb = f.build_sphere_cloud_fast()
    assert xyz.shape == (8 * 240 * 320, 3) and rgb.shape == xyz.shape
    depth = np.asarray(f.depth_undistorted_m).reshape(8, -1)
    pts = xyz.reshape(8, -1, 3)
    for s in (0, 3, 7):
        valid = depth[s] > 0.3
        cam_t = calib.Rt[s][:3, 3]
        z_cam = (pts[s][valid] - cam_t) @ calib.Rt[s][:3, 2]
        np.testing.assert_allclose(z_cam, depth[s][valid], rtol=1e-4, atol=1e-4)


def test_fused_frame_program_matches_stepwise(calib, reference_root):
    """Frame360.build_device_fused (one device program: undistort + stitch +
    gray + plane stats — the SLAM pipeline path) must produce exactly the
    step-by-step pipeline's outputs: byte-equal panoramas, equal undistorted
    depth, and an identical extracted plane set."""
    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.core.plane_extraction import (
        _fit_from_stats_buffer,
        build_sensor_plane_stats,
    )

    path = os.path.join(reference_root, "samples", "sphere_images_1.bin")

    step = Frame360(calib, 0).build(path)  # load + undistort + stitch
    step_stats = np.asarray(
        build_sensor_plane_stats(step.depth_undistorted_m, step.rgb, ship_labels=False)
    )
    step.planes, _ = _fit_from_stats_buffer(step, step_stats, False)

    fused = Frame360(calib, 0)
    fused.load_frame(path)
    fut = fused.build_device_fused(ship_labels=False)
    fused_stats = np.asarray(fut)
    fused.planes, _ = _fit_from_stats_buffer(fused, fused_stats, False)

    np.testing.assert_array_equal(np.asarray(fused.sphere_rgb), np.asarray(step.sphere_rgb))
    np.testing.assert_array_equal(
        np.asarray(fused.sphere_depth_mm), np.asarray(step.sphere_depth_mm)
    )
    np.testing.assert_array_equal(
        np.asarray(fused.sphere_gray), np.asarray(step.sphere_gray)
    )
    np.testing.assert_array_equal(
        np.asarray(fused.depth_undistorted_m), np.asarray(step.depth_undistorted_m)
    )
    np.testing.assert_array_equal(fused_stats, step_stats)
    assert len(fused.planes.planes) == len(step.planes.planes)
