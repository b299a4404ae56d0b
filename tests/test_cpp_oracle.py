"""Gate the Python parity oracles against independently-executed C++.

tests/ref_impl.py and tests/golden_ref.py are NumPy restatements of the
reference written by the same author as the JAX pipeline — a transcription
error made twice would be invisible (VERDICT round 2, Missing #1).  The
standalone C++ oracle (tools/cpp_oracle/photoicp_oracle.cpp) re-derives the
same scalar semantics directly from the reference source
(include/RegisterPhotoICP.h:2545-3228, :4519-4784) in a fresh read, compiles
with g++ and actually executes, so these tests gate:

  * ref_impl's sweep semantics vs C++ (double build, tight) on synthetic crops
  * the committed golden (tests/golden/pair_1_10.npz) vs C++ on the real pair
  * the reference float GN loop end-to-end: the C++ free-run must land on the
    golden free-run pose with identical per-level iteration counts

Measured when these gates were authored: double-build sweep agreement ~1e-12
rel; real-pair per-level error ≤ 4e-4 rel (f64→f32 packing flips ~36 of 81k
pixel roundings at L1/L0); full float GN run: iters [0,7,10,10,10] both,
pose diff 1e-4 m / 0.013 deg.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

import golden_ref
import ref_impl

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools import cpp_oracle  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pair_1_10.npz")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ not available"
)


@pytest.fixture(scope="module")
def oracle_bin():
    try:
        return cpp_oracle.build()
    except subprocess.CalledProcessError as e:  # pragma: no cover
        pytest.skip(f"oracle build failed: {e.stderr}")


@pytest.fixture(scope="module")
def crop_level():
    rng = np.random.default_rng(7)
    h, w = 24, 128
    yy, xx = np.mgrid[0:h, 0:w]
    gray = 0.5 + 0.3 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
    gray = (gray + 0.05 * rng.normal(size=(h, w))).astype(np.float32)
    gray2 = 0.5 + 0.3 * np.sin((xx + 1.3) / 7.0) * np.cos(yy / 5.0)
    gray2 = (gray2 + 0.05 * rng.normal(size=(h, w))).astype(np.float32)
    depth = (2.5 + 0.8 * np.sin(xx / 11.0) + 0.4 * np.cos(yy / 6.0)).astype(np.float32)
    depth2 = (2.5 + 0.8 * np.sin((xx + 1.3) / 11.0) + 0.4 * np.cos(yy / 6.0)).astype(
        np.float32
    )
    depth[rng.random((h, w)) < 0.05] = 0.0
    gx, gy = ref_impl.gradient_xy(gray2.astype(np.float64))
    dgx, dgy = ref_impl.gradient_xy(depth2.astype(np.float64))
    return dict(
        gray_src=gray,
        depth_src=depth,
        gray_trg=gray2,
        depth_trg=depth2,
        gray_trg_gx=gx.astype(np.float32),
        gray_trg_gy=gy.astype(np.float32),
        depth_trg_gx=dgx.astype(np.float32),
        depth_trg_gy=dgy.astype(np.float32),
    )


@pytest.fixture(scope="module")
def golden_levels():
    z = np.load(GOLDEN)
    levels = golden_ref.build_level_pyramids(
        z["gray_src_u8"].astype(np.float64) / 255.0,
        z["depth_src_mm"].astype(np.float64) * 0.001,
        z["gray_trg_u8"].astype(np.float64) / 255.0,
        z["depth_trg_mm"].astype(np.float64) * 0.001,
        int(z["n_levels"]),
    )
    return z, levels


@pytest.mark.parametrize("method", [0, 1, 2])
def test_ref_impl_matches_cpp_double(oracle_bin, crop_level, tmp_path, method):
    """ref_impl sweep semantics == compiled C++ (double) to ~1e-9."""
    pose32 = golden_ref.pseudo_exp(
        np.array([0.03, -0.02, 0.05, 0.01, -0.02, 0.015])
    ).astype(np.float32)
    pose = pose32.astype(np.float64)  # both sides see the same quantized pose
    lvl64 = {k: np.asarray(v, np.float64) for k, v in crop_level.items()}
    xyz, val = ref_impl.build_sphere_lut(lvl64["depth_src"])
    e_ref = ref_impl.error_sphere(lvl64, xyz, val, pose, method)
    H_ref, g_ref, sso_ref = ref_impl.hess_grad_sphere(lvl64, xyz, val, pose, method)

    cpp_oracle.pack(
        str(tmp_path / "in.bin"),
        [crop_level],
        pose32,
        mode=0,
        method=method,
        use_double=True,
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert abs(r["error"] - e_ref) <= 1e-9 * max(e_ref, 1e-12)
    np.testing.assert_allclose(r["H"], H_ref, rtol=0, atol=1e-9 * np.abs(H_ref).max())
    np.testing.assert_allclose(
        r["g"], g_ref, rtol=0, atol=1e-9 * max(np.abs(g_ref).max(), 1e-12)
    )
    assert abs(r["sso"] - sso_ref) < 1e-9


@pytest.mark.parametrize("method", [0, 2])
def test_ref_impl_matches_cpp_float(oracle_bin, crop_level, tmp_path, method):
    """The reference's float arithmetic stays within 1e-5 of the f64 path on
    the crop (no pixel-rounding flips at this scale/seed)."""
    pose32 = golden_ref.pseudo_exp(
        np.array([0.03, -0.02, 0.05, 0.01, -0.02, 0.015])
    ).astype(np.float32)
    pose = pose32.astype(np.float64)
    lvl64 = {k: np.asarray(v, np.float64) for k, v in crop_level.items()}
    xyz, val = ref_impl.build_sphere_lut(lvl64["depth_src"])
    e_ref = ref_impl.error_sphere(lvl64, xyz, val, pose, method)
    H_ref, _, _ = ref_impl.hess_grad_sphere(lvl64, xyz, val, pose, method)

    cpp_oracle.pack(
        str(tmp_path / "in.bin"),
        [crop_level],
        pose32,
        mode=0,
        method=method,
        use_double=False,
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert abs(r["error"] - e_ref) <= 1e-5 * e_ref
    np.testing.assert_allclose(r["H"], H_ref, rtol=0, atol=1e-4 * np.abs(H_ref).max())


def test_committed_golden_matches_cpp(oracle_bin, golden_levels, tmp_path):
    """The committed golden per-level sweeps are reproduced by compiled C++
    on the real bundled pair (the oracle-independence gate, VERDICT #2)."""
    z, levels = golden_levels
    n = int(z["n_levels"])
    for k, lv_idx in enumerate(range(n - 1, -1, -1)):
        pose = z["free_level_pose_in"][k].astype(np.float32)
        cpp_oracle.pack(
            str(tmp_path / "in.bin"), [levels[lv_idx]], pose, mode=0, method=2,
            use_double=True,
        )
        r = cpp_oracle.run(str(tmp_path / "in.bin"))
        e_g = float(z["free_level_err_in"][k])
        # f64→f32 packing flips a handful of pixel roundings at fine levels
        assert abs(r["error"] - e_g) <= 5e-4 * e_g, (lv_idx, r["error"], e_g)
        assert abs(r["sso"] - float(z["free_level_sso_in"][k])) < 1e-4
        H_g, g_g = z["free_level_H_in"][k], z["free_level_g_in"][k]
        assert np.abs(r["H"] - H_g).max() <= 2e-3 * np.abs(H_g).max()
        assert np.abs(r["g"] - g_g).max() <= 2e-3 * np.abs(g_g).max()
        n_terms = int(z["free_level_n_photo_in"][k]) + int(z["free_level_n_depth_in"][k])
        assert abs(r["nvalid"] - n_terms) <= max(1e-3 * n_terms, 2)


def test_cpp_full_chain_from_raw_images_lands_on_golden_pose(oracle_bin, tmp_path):
    """The strongest oracle gate: the C++ binary re-derives EVERYTHING from
    the raw full-res images — gray pyrDown pyramids, valid-mean range
    pyramids, Jaimez gradients, seam masks, the LUT and the float GN loop
    (buildPyramid :292-308, buildPyramidRange :312-354, calcGradientXY
    :365-398, alignFrames360 :4519-4784) — and must land on the committed
    golden free-run pose with identical per-level iteration counts. No
    builder-computed intermediate (pyramid, gradient, Hessian) enters the
    stream."""
    z = np.load(GOLDEN)
    h, w = z["gray_src_u8"].shape
    zeros = np.zeros((h, w), np.float32)
    level0 = dict(
        gray_src=z["gray_src_u8"].astype(np.float32) / np.float32(255.0),
        depth_src=z["depth_src_mm"].astype(np.float32) * np.float32(0.001),
        gray_trg=z["gray_trg_u8"].astype(np.float32) / np.float32(255.0),
        depth_trg=z["depth_trg_mm"].astype(np.float32) * np.float32(0.001),
        gray_trg_gx=zeros, gray_trg_gy=zeros,
        depth_trg_gx=zeros, depth_trg_gy=zeros,
    )
    cpp_oracle.pack(
        str(tmp_path / "in.bin"), [level0], np.eye(4, dtype=np.float32),
        mode=4, method=2, use_double=False, apply_seam_mask=True,
        n_levels=int(z["n_levels"]),
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert [lv["iters"] for lv in r["levels"]] == list(z["free_iters"])
    P, G = r["pose"], z["free_pose"]
    assert np.linalg.norm(P[:3, 3] - G[:3, 3]) < 2e-3
    dR = P[:3, :3] @ G[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.1


def test_cpp_stitch_oracle_matches_golden_panorama(oracle_bin, tmp_path):
    """Mode-6 stitch oracle (Frame360.h:1098-1148 re-derived in C++ with the
    reference's float arithmetic — float trig, (int) pixel truncation,
    double obliquity truncated into u16, fixed-point CV_RGB2GRAY) must
    reproduce the committed golden panorama from the RAW sensor images.
    Tolerance: XLA-f32 vs libm-f32 trig can flip the (int) truncation for a
    handful of boundary pixels (same bound as the scalar stitch gate,
    tests/test_frame360.py)."""
    src = "/root/reference/samples/sphere_images_1.bin"
    if not os.path.exists(src):
        pytest.skip("bundled samples not present")
    from rgbd360_tpu.io.boost_archive import read_frame360_bin
    from rgbd360_tpu.io.calib import Calib360

    raw = read_frame360_bin(src)
    calib = Calib360.load("/root/reference")
    z = np.load(GOLDEN)
    # golden convention: *_src = frame 10 (the align SOURCE), *_trg = frame 1
    sph_h, sph_w = z["gray_trg_u8"].shape
    gray, depth = cpp_oracle.run_stitch(
        np.asarray(raw.rgb), np.asarray(raw.depth),
        np.asarray(calib.Rt_inv, np.float32),
        np.asarray(calib.camera_matrix, np.float64),
        (sph_h, sph_w), workdir=str(tmp_path),
    )
    gray_mis = (gray != z["gray_trg_u8"]).mean()
    assert gray_mis < 2e-3, f"gray mismatch fraction {gray_mis}"
    dd = np.abs(depth.astype(np.int64) - z["depth_trg_mm"].astype(np.int64))
    assert (dd > 1).mean() < 2e-3, f"depth mismatch fraction {(dd > 1).mean()}"
    # and the overwhelming majority must be BIT-equal, not merely close
    # (measured: 1 gray pixel of 614k differs; depth 99.99% bit-equal)
    assert (dd == 0).mean() > 0.99


def test_cpp_clams_undistort_matches_pipeline(oracle_bin, tmp_path):
    """Mode-7 CLAMS oracle (interpolatedUndistort re-derived from
    discrete_depth_distortion_model.cpp:38-69) vs the repo's gather-free
    batched kernel on a real sensor of the bundled frame."""
    src = "/root/reference/samples/sphere_images_1.bin"
    if not os.path.exists(src):
        pytest.skip("bundled samples not present")
    import jax.numpy as jnp

    from rgbd360_tpu.io.boost_archive import read_frame360_bin
    from rgbd360_tpu.io.calib import Calib360
    from rgbd360_tpu.ops.undistort import undistort_depth

    raw = read_frame360_bin(src)
    calib = Calib360.load("/root/reference")
    depth_m = raw.depth.astype(np.float32) * np.float32(0.001)
    mults, counts, geom = calib.stacked_intrinsic_arrays()
    got = np.asarray(
        undistort_depth(
            jnp.asarray(depth_m), jnp.asarray(mults), jnp.asarray(counts),
            bin_width=geom.bin_width, bin_height=geom.bin_height,
            bin_depth=geom.bin_depth,
        )
    )
    for sensor in (0, 5):
        ref = cpp_oracle.run_clams(
            calib.intrinsic_model[sensor], depth_m[sensor], workdir=str(tmp_path)
        )
        np.testing.assert_allclose(got[sensor], ref, rtol=2e-6, atol=1e-6)


@pytest.fixture(scope="module")
def pinhole_crop():
    """Pinhole crop with NaN-marked invalid target depth (the reference's
    FrameRGBD convention), so the oracle's faithful isfinite-only gate and
    ref_impl's finite-and-positive gate select identical pixel sets."""
    rng = np.random.default_rng(11)
    h, w = 32, 40
    yy, xx = np.mgrid[0:h, 0:w]
    gray = (0.5 + 0.3 * np.sin(xx / 5.0) * np.cos(yy / 4.0)
            + 0.05 * rng.normal(size=(h, w))).astype(np.float32)
    gray2 = (0.5 + 0.3 * np.sin((xx + 0.9) / 5.0) * np.cos(yy / 4.0)
             + 0.05 * rng.normal(size=(h, w))).astype(np.float32)
    depth = (2.0 + 0.5 * np.sin(xx / 9.0) + 0.3 * np.cos(yy / 5.0)).astype(np.float32)
    depth2 = (2.0 + 0.5 * np.sin((xx + 0.9) / 9.0) + 0.3 * np.cos(yy / 5.0)).astype(
        np.float32
    )
    depth[rng.random((h, w)) < 0.05] = 0.0  # source invalid -> LUT-gated
    depth2[rng.random((h, w)) < 0.05] = np.nan  # target invalid -> isfinite
    gx, gy = ref_impl.gradient_xy(gray2.astype(np.float64))
    dgx, dgy = ref_impl.gradient_xy(depth2.astype(np.float64))
    k = np.array([[35.0, 0, w / 2 - 0.5], [0, 35.0, h / 2 - 0.5], [0, 0, 1.0]])
    return dict(
        gray_src=gray, depth_src=depth, gray_trg=gray2, depth_trg=depth2,
        gray_trg_gx=gx.astype(np.float32), gray_trg_gy=gy.astype(np.float32),
        depth_trg_gx=dgx.astype(np.float32), depth_trg_gy=dgy.astype(np.float32),
    ), k


@pytest.mark.parametrize("method", [0, 1, 2])
@pytest.mark.parametrize("shift", [0, 1])
def test_ref_impl_pinhole_matches_cpp_double(oracle_bin, pinhole_crop, tmp_path, method, shift):
    """ref_impl's pinhole transcription (error_pinhole UNGATED,
    hess_grad_pinhole saliency-gated with the PHOTO_DEPTH coupling) ==
    compiled C++ (double) to ~1e-9 — including the coupled-continue pixel
    sets, which are where a transcription error would hide."""
    crop, k = pinhole_crop
    pose32 = np.eye(4, dtype=np.float32)
    if shift:
        pose32 = golden_ref.pseudo_exp(
            np.array([0.02, -0.015, 0.03, 0.008, -0.01, 0.012])
        ).astype(np.float32)
    pose = pose32.astype(np.float64)
    lvl64 = {k2: np.asarray(v, np.float64) for k2, v in crop.items()}
    xyz, val = ref_impl.build_pinhole_lut(lvl64["depth_src"], k, 0)
    pe, n_ph, de, n_dp = ref_impl.error_pinhole(lvl64, xyz, val, pose, k, 0, method)
    H_ref, g_ref = ref_impl.hess_grad_pinhole(lvl64, xyz, val, pose, k, 0, method)

    cpp_oracle.pack(
        str(tmp_path / "in.bin"), [crop], pose32, mode=2, method=method,
        use_double=True, k_full=k, pinhole_level=0,
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert r["nphoto"] == n_ph and r["ndepth"] == n_dp
    assert abs(r["perr2"] - pe) <= 1e-9 * max(pe, 1e-12)
    assert abs(r["derr2"] - de) <= 1e-9 * max(de, 1e-12)
    hs = max(np.abs(H_ref).max(), 1e-12)
    np.testing.assert_allclose(r["H"], H_ref, rtol=0, atol=1e-9 * hs)
    gs = max(np.abs(g_ref).max(), 1e-12)
    np.testing.assert_allclose(r["g"], g_ref, rtol=0, atol=1e-9 * gs)


def test_ref_impl_pinhole_level_scaling_matches_cpp(oracle_bin, pinhole_crop, tmp_path):
    """The 2^-level intrinsic scaling (:570-575) agrees between the oracles
    when the crop is treated as pyramid level 1 of a doubled-size K."""
    crop, k = pinhole_crop
    k2 = k.copy()
    k2[0, 0] *= 2; k2[1, 1] *= 2; k2[0, 2] *= 2; k2[1, 2] *= 2
    pose = np.eye(4)
    lvl64 = {k3: np.asarray(v, np.float64) for k3, v in crop.items()}
    xyz, val = ref_impl.build_pinhole_lut(lvl64["depth_src"], k2, 1)
    pe, n_ph, de, n_dp = ref_impl.error_pinhole(lvl64, xyz, val, pose, k2, 1, 2)

    cpp_oracle.pack(
        str(tmp_path / "in.bin"), [crop], pose.astype(np.float32), mode=2,
        method=2, use_double=True, k_full=k2, pinhole_level=1,
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert r["nphoto"] == n_ph and r["ndepth"] == n_dp
    assert abs(r["perr2"] - pe) <= 1e-9 * max(pe, 1e-12)
    assert abs(r["derr2"] - de) <= 1e-9 * max(de, 1e-12)


def test_cpp_float_gn_lands_on_golden_pose(oracle_bin, golden_levels, tmp_path):
    """The C++ oracle running the reference float GN loop end-to-end on the
    bundled pair reproduces the golden free-run pose and iteration counts."""
    z, levels = golden_levels
    n = int(z["n_levels"])
    coarse_first = [levels[i] for i in range(n - 1, -1, -1)]
    cpp_oracle.pack(
        str(tmp_path / "in.bin"), coarse_first, np.eye(4, dtype=np.float32),
        mode=1, method=2, use_double=False,
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert [lv["iters"] for lv in r["levels"]] == list(z["free_iters"])
    P, G = r["pose"], z["free_pose"]
    assert np.linalg.norm(P[:3, 3] - G[:3, 3]) < 2e-3
    dR = P[:3, :3] @ G[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.1


@pytest.mark.parametrize("occ", [1, 2])
@pytest.mark.parametrize("method", [0, 1, 2])
def test_ref_impl_occ_matches_cpp_double(oracle_bin, crop_level, tmp_path, occ, method):
    """The sequential Occ1/Occ2 error transcription (ref_impl.error_sphere_occ)
    == independently-executed C++ (modes 8/9, double build): exact count
    equality, sums to 1e-9 rel.  The pose is chosen so the scene genuinely
    exercises the occlusion semantics (instrumented probe on this fixture:
    2595 landed points, 198 z-buffer skips, 2249 Occ2 outlier rejections —
    the filter-before-buffer ordering and the strict-`<` z-buffer comparison
    both carry weight here, not just the plain projection)."""
    pose32 = golden_ref.pseudo_exp(
        np.array([0.05, -0.3, 0.8, 0.02, -0.03, 0.04])
    ).astype(np.float32)
    pose = pose32.astype(np.float64)
    lvl64 = {k: np.asarray(v, np.float64) for k, v in crop_level.items()}
    xyz, val = ref_impl.build_sphere_lut(lvl64["depth_src"])
    pe, n_ph, de, n_dp = ref_impl.error_sphere_occ(
        lvl64, xyz, val, pose, method, occlusion=occ
    )

    cpp_oracle.pack(
        str(tmp_path / "in.bin"), [crop_level], pose32,
        mode=7 + occ, method=method, use_double=True,
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert r["nphoto"] == n_ph and r["ndepth"] == n_dp
    assert abs(r["perr2"] - pe) <= 1e-9 * max(pe, 1e-12)
    assert abs(r["derr2"] - de) <= 1e-9 * max(de, 1e-12)
    # scene-exercise guards: something survived, and Occ2's pre-buffer
    # outlier filter visibly bit (2249 of 2595 landings rejected)
    if method != 0:
        assert n_dp > 0
    if occ == 2:
        assert 0 < n_dp < 600


@pytest.mark.parametrize("method", [0, 1, 2])
def test_ref_impl_robot_matches_cpp_double(oracle_bin, pinhole_crop, tmp_path, method):
    """ref_impl's robot-frame transcription (sweep_robot: camRt^-1 pose camRt
    warp, Proj23 @ R_cam^-1 @ [I | -skew(p_robot')] twist chain, no saliency
    gates, the intended-consistent depth pair replacing the reference's
    uninitialized jacobianRt_z) == compiled C++ mode 10 (double) to ~1e-9."""
    crop, k = pinhole_crop
    # a real off-axis rig extrinsic so the camRt conjugation carries weight
    cam_rt = golden_ref.pseudo_exp(
        np.array([0.10, -0.05, 0.02, 0.0, 0.9, 0.15])
    ).astype(np.float32)
    pose32 = golden_ref.pseudo_exp(
        np.array([0.02, -0.015, 0.03, 0.008, -0.01, 0.012])
    ).astype(np.float32)
    pose = pose32.astype(np.float64)
    lvl64 = {k2: np.asarray(v, np.float64) for k2, v in crop.items()}
    xyz, val = ref_impl.build_pinhole_lut(lvl64["depth_src"], k, 0)
    pe, n_ph, de, n_dp, H_ref, g_ref = ref_impl.sweep_robot(
        lvl64, xyz, val, pose, cam_rt.astype(np.float64), k, 0, method
    )

    cpp_oracle.pack(
        str(tmp_path / "in.bin"), [crop], pose32, mode=10, method=method,
        use_double=True, k_full=k, pinhole_level=0, cam_rt=cam_rt,
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert r["nphoto"] == n_ph and r["ndepth"] == n_dp
    assert abs(r["perr2"] - pe) <= 1e-9 * max(pe, 1e-12)
    assert abs(r["derr2"] - de) <= 1e-9 * max(de, 1e-12)
    hs = max(np.abs(H_ref).max(), 1e-12)
    np.testing.assert_allclose(r["H"], H_ref, rtol=0, atol=1e-9 * hs)
    gs = max(np.abs(g_ref).max(), 1e-12)
    np.testing.assert_allclose(r["g"], g_ref, rtol=0, atol=1e-9 * gs)
    if method != 0:
        assert n_dp > 100  # the rotated rig still lands a substantial set


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_ref_impl_matches_cpp_double_fuzz(oracle_bin, tmp_path, seed):
    """Randomized scenes and poses (not just the fixed crop): ref_impl's
    sphere sweep == the C++ double build to 1e-9 across varied depth
    structure, invalid-pixel densities and motions — a transcription error
    that happens to cancel on one scene can't hide behind the fixture."""
    rng = np.random.default_rng(seed)
    h, w = 16 + 8 * int(rng.integers(0, 3)), 128
    yy, xx = np.mgrid[0:h, 0:w]
    f1, f2 = rng.uniform(3, 14, 2)
    gray = (0.5 + 0.4 * np.sin(xx / f1) * np.cos(yy / f2)
            + 0.05 * rng.normal(size=(h, w))).astype(np.float32)
    gray2 = (0.5 + 0.4 * np.sin((xx + rng.uniform(0.5, 2)) / f1) * np.cos(yy / f2)
             + 0.05 * rng.normal(size=(h, w))).astype(np.float32)
    depth = (rng.uniform(1, 3) + rng.uniform(0.3, 1.2) * np.sin(xx / rng.uniform(6, 15))
             + 0.3 * np.cos(yy / rng.uniform(4, 9))).astype(np.float32)
    depth2 = depth + rng.normal(scale=0.05, size=(h, w)).astype(np.float32)
    depth[rng.random((h, w)) < rng.uniform(0.0, 0.15)] = 0.0
    gx, gy = ref_impl.gradient_xy(gray2.astype(np.float64))
    dgx, dgy = ref_impl.gradient_xy(depth2.astype(np.float64))
    crop = dict(
        gray_src=gray, depth_src=depth, gray_trg=gray2, depth_trg=depth2,
        gray_trg_gx=gx.astype(np.float32), gray_trg_gy=gy.astype(np.float32),
        depth_trg_gx=dgx.astype(np.float32), depth_trg_gy=dgy.astype(np.float32),
    )
    xi = rng.uniform(-0.08, 0.08, 6)
    pose32 = golden_ref.pseudo_exp(xi).astype(np.float32)
    pose = pose32.astype(np.float64)
    lvl64 = {k: np.asarray(v, np.float64) for k, v in crop.items()}
    xyz, val = ref_impl.build_sphere_lut(lvl64["depth_src"])
    e_ref = ref_impl.error_sphere(lvl64, xyz, val, pose, 2)
    H_ref, g_ref, sso_ref = ref_impl.hess_grad_sphere(lvl64, xyz, val, pose, 2)

    cpp_oracle.pack(
        str(tmp_path / "in.bin"), [crop], pose32, mode=0, method=2,
        use_double=True,
    )
    r = cpp_oracle.run(str(tmp_path / "in.bin"))
    assert abs(r["error"] - e_ref) <= 1e-9 * max(e_ref, 1e-12)
    np.testing.assert_allclose(
        r["H"], H_ref, rtol=0, atol=1e-9 * max(np.abs(H_ref).max(), 1e-12)
    )
    np.testing.assert_allclose(
        r["g"], g_ref, rtol=0, atol=1e-9 * max(np.abs(g_ref).max(), 1e-12)
    )
    assert abs(r["sso"] - sso_ref) < 1e-9
