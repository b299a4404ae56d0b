"""Stereo variant, grabber/recorder, labelization, laser calibration,
rig-frame sphere cloud."""

import os

import numpy as np
import pytest

from rgbd360_tpu.core.calibrate_laser import CalibPairLaserKinect
from rgbd360_tpu.core.frame360_stereo import (
    Frame360Stereo,
    read_stereo_depth,
    write_stereo_depth,
)
from rgbd360_tpu.core.labelization import labelize_frame, propagate_labels
from rgbd360_tpu.io.grabber import Recorder, ReplaySource, SyntheticSource


def test_stereo_depth_roundtrip(tmp_path, rng):
    depth = rng.uniform(0.5, 5.0, (320, 640)).astype(np.float32)
    p = str(tmp_path / "d.bin")
    write_stereo_depth(p, depth)
    back = read_stereo_depth(p)
    np.testing.assert_array_equal(back, depth)


def test_stereo_frame_build(tmp_path, rng):
    from PIL import Image

    rgb = rng.integers(0, 255, (64, 256, 3), dtype=np.uint8)
    Image.fromarray(rgb).save(tmp_path / "pano.png")
    depth = rng.uniform(0.5, 5.0, (64, 256)).astype(np.float32)
    write_stereo_depth(str(tmp_path / "pano_d.bin"), depth)
    f = Frame360Stereo().build_stereo(str(tmp_path / "pano.png"), str(tmp_path / "pano_d.bin"))
    assert f.sphere_rgb.shape == (64, 256, 3)
    assert f.sphere_gray.shape == (64, 256)
    xyz, _ = f.build_sphere_cloud_from_image()
    assert np.isfinite(np.asarray(xyz)).any()
    # the stereo variant's own backprojection (Frame360_stereo.h:454-517):
    # finite exactly at valid depths, radius = depth, scalar-rule parity
    xyz_s, _ = f.build_sphere_cloud(start_phi=166)
    xyz_s = np.asarray(xyz_s).reshape(64, 256, 3)
    depth_q = np.asarray(f.sphere_depth_mm, np.float32) * 1e-3  # u16-mm quantized
    valid = (depth_q > 0) & (depth_q < 15.0)
    assert np.isfinite(xyz_s).all(axis=-1)[valid].all()
    assert not np.isfinite(xyz_s).any(axis=-1)[~valid].any()
    np.testing.assert_allclose(
        np.linalg.norm(xyz_s[valid], axis=-1), depth_q[valid], rtol=1e-5
    )
    step = 2 * np.pi / 256
    r, c = 10, 17
    phi = (r + 166) * step - np.pi / 2
    theta = c * step - np.pi
    expect = depth_q[r, c] * np.array(
        [np.sin(theta) * np.cos(phi), np.sin(phi), np.cos(theta) * np.cos(phi)]
    )
    np.testing.assert_allclose(xyz_s[r, c], expect, rtol=1e-5)


def test_grabber_record_replay(tmp_path):
    n = Recorder(str(tmp_path)).record(SyntheticSource(3))
    assert n == 3
    assert os.path.exists(tmp_path / "sphere_images_1.bin")
    frames = list(ReplaySource(str(tmp_path)))
    assert len(frames) == 3
    assert frames[0].rgb.shape == (8, 240, 320, 3)
    assert frames[0].timestamp == 1


def test_labelization(sample_frames):
    f1, f2 = sample_frames
    f1.get_planes()
    f2.get_planes()
    labels = {p.id: f"plane{p.id}" for p in f1.planes.planes}
    assert labelize_frame(f1, labels) == len(f1.planes.planes)
    n = propagate_labels(f1, f2)
    assert n >= 1
    assert any(p.label for p in f2.planes.planes)


def test_laser_calibration_recovers_pose(rng):
    rt_true = np.eye(4)
    a = 0.25
    rt_true[:3, :3] = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    )
    rt_true[:3, 3] = [0.08, 0.02, -0.04]
    cal = CalibPairLaserKinect()
    R, t = rt_true[:3, :3], rt_true[:3, 3]
    for _ in range(10):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        d = rng.uniform(1.0, 3.0)
        # a line on the plane, expressed in the laser frame
        u = np.cross(n, rng.normal(size=3))
        u /= np.linalg.norm(u)
        p_cam = n * d + np.cross(n, u) * rng.uniform(-1, 1)
        line_dir = R.T @ u
        line_center = R.T @ (p_cam - t)
        cal.add(n, d, line_dir, line_center)
    est = cal.calibrate()
    assert est is not None
    np.testing.assert_allclose(est, rt_true, atol=1e-6)


def test_build_sphere_cloud_rig_frame(sample_frames):
    f1, _ = sample_frames
    xyz, rgb = f1.build_sphere_cloud()
    assert xyz.shape == (8 * 120 * 160, 3)
    finite = np.isfinite(xyz).all(axis=1)
    assert finite.mean() > 0.5
    # rig-frame cloud must span the full ring (points behind and in front)
    assert xyz[finite][:, 2].min() < -0.5 and xyz[finite][:, 2].max() > 0.5
    assert xyz[finite][:, 1].min() < -0.5 and xyz[finite][:, 1].max() > 0.5


def test_gather_control_planes_offset_convention(calib):
    """Regression for the joint-calibration sign bug: the d stored by
    gather_control_planes must satisfy the solver's residual identity
    d_i - d_j = n_i.t_i - n_j.t_j at the true extrinsics (translation_error2
    ~ 0), so the 21x21 translation solve recovers +t, not -t."""
    from rgbd360_tpu.apps.calibrate_rig import gather_control_planes
    from rgbd360_tpu.core.calibrator import Calibrator, PlaneCorrespondences
    from rgbd360_tpu.core.pbmap import Plane

    rng = np.random.default_rng(3)
    rt = np.stack([calib.Rt[s].astype(np.float64) for s in range(8)])

    # synthetic world planes observed by adjacent sensors, expressed in the
    # rig frame exactly as extract_frame_planes leaves local_planes
    class F:
        local_planes = [[] for _ in range(8)]

    for _ in range(6):
        n_w = rng.normal(size=3)
        n_w /= np.linalg.norm(n_w)
        rho = rng.uniform(1.0, 4.0)
        for s in range(8):
            center = n_w * rho + np.cross(n_w, rng.normal(size=3)) * 0.3
            F.local_planes[s].append(
                Plane(id=0, normal=n_w.copy(), center=center, d=float(-n_w @ center))
            )

    corresp = PlaneCorrespondences()
    added = gather_control_planes(F, corresp, rt)
    assert added >= 6 * 8  # every adjacent pair matched per plane
    cal = Calibrator(corresp)
    cal.rt = rt.copy()
    assert cal.translation_error2(rt) < 1e-8  # f32 extrinsics roundoff only


def test_construction_specs_match_shipped_rig(reference_root):
    """The ideal-rig seed must approximate the shipped calibrated extrinsics
    (Calibration/Rt_03.txt is sensor index 3 = spec index 2): ring radius
    0.055 m, 45-deg steps (regression for the wrong alternating-offset
    geometry that put seeds ~10 cm off)."""
    from rgbd360_tpu.core.calibrator import construction_specs

    rts = construction_specs()
    np.testing.assert_allclose(np.linalg.norm(rts[:, :3, 3], axis=1), 0.055, atol=1e-9)
    shipped = np.loadtxt(os.path.join(reference_root, "Calibration", "Rt_03.txt"))
    assert np.linalg.norm(rts[2, :3, 3] - shipped[:3, 3]) < 0.01
    cos_err = (np.trace(rts[2, :3, :3].T @ shipped[:3, :3]) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos_err, -1, 1))) < 2.0
    # consecutive sensors are 45-deg turns of each other
    for s in range(1, 8):
        rel = rts[s - 1, :3, :3].T @ rts[s, :3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1)))
        assert abs(ang - 45.0) < 1e-9


def test_stereo_get_planes_end_to_end(tmp_path, rng):
    """build -> cloud -> getPlanesStereo on an analytic two-plane scene
    (reference Frame360_stereo.h:847-986): depth synthesized from known
    plane equations must come back as planes with the right (sensor-
    oriented) normals and offsets."""
    from PIL import Image

    h, w, start_phi = 64, 256, 166
    step = 2 * np.pi / w
    phi = (np.arange(h) + start_phi) * step - np.pi / 2
    theta = np.arange(w) * step - np.pi
    u = np.stack(
        [
            np.sin(theta)[None, :] * np.cos(phi)[:, None],
            np.broadcast_to(np.sin(phi)[:, None], (h, w)),
            np.cos(theta)[None, :] * np.cos(phi)[:, None],
        ],
        axis=-1,
    )
    # two walls: n.x = D on each theta half-space
    planes_gt = [
        (np.array([0.0, 0.0, 1.0]), 2.0),
        (np.array([0.0, 0.0, -1.0]), 2.5),
    ]
    depth = np.zeros((h, w), np.float32)
    for half, (n, D) in enumerate(planes_gt):
        sel = (theta >= 0) == bool(half)
        proj = u[:, sel] @ n
        d = np.where(proj > 0.15, D / np.maximum(proj, 0.15), 0.0)
        depth[:, sel] = np.where(d < 14.0, d, 0.0).astype(np.float32)

    rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    Image.fromarray(rgb).save(tmp_path / "pano.png")
    write_stereo_depth(str(tmp_path / "pano_d.bin"), depth)
    f = Frame360Stereo().build_stereo(
        str(tmp_path / "pano.png"), str(tmp_path / "pano_d.bin")
    )
    pbmap = f.get_planes_stereo(start_phi=start_phi)
    assert f.planes is pbmap
    assert len(pbmap.planes) >= 2
    for n, D in planes_gt:
        # sensor-oriented convention: normal = -n, d = +D
        hits = [
            p
            for p in pbmap.planes
            if p.normal @ (-n) > 0.99 and abs(p.d - D) < 0.05 and p.n_pts >= 40
        ]
        assert hits, f"plane n={n} D={D} not recovered"


def test_grabber_control_surface():
    """Camera control API parity with the reference OpenNI2 grabber
    (RGBDGrabber_OpenNI2.h:84-189): resolution modes, shutter (ms), gain
    (percent), invalid mode keeps previous value."""
    src = SyntheticSource(num_frames=1)
    assert (src.height, src.width) == (240, 320)  # QVGA default
    src.set_resolution(src.VGA)
    assert (src.height, src.width) == (480, 640)
    src.set_resolution(7)  # invalid: previous value left
    assert (src.height, src.width) == (480, 640)
    src.set_resolution(src.QVGA)
    assert (src.height, src.width) == (240, 320)
    assert src.get_shutter() == 10  # reference ctor default exposure
    src.set_shutter(33)
    assert src.get_shutter() == 33
    assert src.get_gain() == 100
    src.set_gain(50)
    assert src.get_gain() == 50
