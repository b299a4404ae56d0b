"""Pinhole + robot-frame dense alignment."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.ops import photoicp_pinhole as pp, se3


def _k():
    return jnp.asarray(
        np.array([[262.5, 0, 159.5], [0, 262.5, 119.5], [0, 0, 1]], np.float32)
    )


def _scene(h=120, w=160, rng=None):
    yy, xx = np.mgrid[0:h, 0:w]
    gray = (
        0.5
        + 0.2 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
        + 0.1 * np.sin(xx / 2.3)
        + 0.08 * np.cos(yy / 1.9)
    ).astype(np.float32)
    depth = (1.8 + 0.4 * np.sin(xx / 11.0) + 0.25 * np.cos(yy / 9.0)).astype(np.float32)
    return gray, depth


def _warp_source(gray, depth, pose_true, k, h, w):
    """Source image = target sampled where source pixels land under pose."""
    xyz, valid = pp.pinhole_lut(jnp.asarray(depth), k, 0)
    # account for the QVGA K given h,w: scale K to the image size
    q = xyz @ pose_true[:3, :3].T + pose_true[:3, 3]
    fx, fy, ox, oy = float(k[0, 0]), float(k[1, 1]), float(k[0, 2]), float(k[1, 2])
    u = np.asarray(q[:, 0] * fx / q[:, 2] + ox)
    v = np.asarray(q[:, 1] * fy / q[:, 2] + oy)
    ci = np.round(u).astype(int)
    ri = np.round(v).astype(int)
    inb = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w) & np.asarray(valid)
    src_gray = np.zeros(h * w, np.float32)
    src_gray[inb] = gray[ri[inb], ci[inb]]
    src_depth = np.where(inb, depth.reshape(-1), 0.0).astype(np.float32)
    return src_gray.reshape(h, w), src_depth.reshape(h, w)


def test_pinhole_align_recovers_pose(rng):
    h, w = 240, 320
    gray, depth = _scene(h, w, rng)
    k = _k()
    xi = jnp.array([0.01, -0.008, 0.012, 0.004, -0.005, 0.003], jnp.float32)
    pose_true = se3.exp_se3(xi, pseudo=False)
    src_gray, src_depth = _warp_source(gray, depth, np.asarray(pose_true, np.float64), k, h, w)
    res = pp.align_frames_jit(
        jnp.asarray(src_gray), jnp.asarray(src_depth),
        jnp.asarray(gray), jnp.asarray(depth), k, jnp.eye(4), n_levels=3,
    )
    assert not bool(res.ill_posed)
    err = np.abs(np.asarray(res.pose) - np.asarray(pose_true)).max()
    assert err < 2e-3


def test_robot_frame_self_alignment_is_identity(rng):
    """8 cameras on a rig, source == target: the robot pose stays identity."""
    h, w = 48, 64
    grays, depths, rts = [], [], []
    for s in range(4):  # 4 cameras suffice for the machinery
        g, d = _scene(h, w, np.random.default_rng(s))
        grays.append(g + 0.01 * s)
        depths.append(d)
        a = np.deg2rad(90.0 * s)
        rt = np.eye(4, dtype=np.float32)
        rt[:3, :3] = np.array(
            [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
        )
        rts.append(rt)
    gs = jnp.asarray(np.stack(grays))
    ds = jnp.asarray(np.stack(depths))
    res = pp.register_dense_photoicp_jit(
        gs, ds, gs, ds, jnp.asarray(np.stack(rts)), _k() * jnp.float32(w / 320.0),
        jnp.eye(4), n_levels=2,
    )
    np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-6)


def test_robot_frame_recovers_rig_motion(rng):
    """A rig translation seen by 2 oppositely-mounted cameras."""
    h, w = 120, 160
    k = _k() * jnp.float32(w / 320.0)
    k = k.at[2, 2].set(1.0)
    rts = []
    for s in range(2):
        a = np.deg2rad(180.0 * s)
        rt = np.eye(4, dtype=np.float64)
        rt[:3, :3] = np.array(
            [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
        )
        rts.append(rt)
    pose_true = np.eye(4)
    pose_true[:3, 3] = [0.015, -0.01, 0.02]

    grays, depths, sgrays, sdepths = [], [], [], []
    for s in range(2):
        g, d = _scene(h, w, np.random.default_rng(10 + s))
        rel = np.linalg.inv(rts[s]) @ pose_true @ rts[s]
        sg, sd = _warp_source(g, d, rel, k, h, w)
        grays.append(g)
        depths.append(d)
        sgrays.append(sg)
        sdepths.append(sd)
    res = pp.register_dense_photoicp_jit(
        jnp.asarray(np.stack(sgrays)), jnp.asarray(np.stack(sdepths)),
        jnp.asarray(np.stack(grays)), jnp.asarray(np.stack(depths)),
        jnp.asarray(np.stack(rts).astype(np.float32)), k, jnp.eye(4), n_levels=2,
    )
    assert not bool(res.ill_posed)
    err = np.abs(np.asarray(res.pose) - pose_true).max()
    assert err < 2e-3


def test_pinhole_occlusion_variants(rng):
    """Occ1/Occ2 (reference RegisterPhotoICP.h:1107-2025) run and agree with
    the plain variant on occlusion-free data (self-alignment -> identity)."""
    import jax.numpy as jnp

    from rgbd360_tpu.io.calib import qvga_camera_matrix
    from rgbd360_tpu.ops.photoicp_pinhole import align_frames_jit

    h, w = 64, 80
    yy, xx = np.mgrid[0:h, 0:w]
    gray = (0.5 + 0.2 * np.sin(xx / 5.0) * np.cos(yy / 3.0) + 0.1 * np.sin(xx / 1.7)).astype(np.float32)
    depth = (2.0 + 0.4 * np.sin(xx / 9.0)).astype(np.float32)
    k = jnp.asarray(qvga_camera_matrix() * (w / 320.0))
    for occ in (1, 2):
        res = align_frames_jit(
            jnp.asarray(gray), jnp.asarray(depth), jnp.asarray(gray), jnp.asarray(depth),
            k, jnp.eye(4), n_levels=2, occlusion=occ,
        )
        np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-6)


def test_pinhole_occ1_drops_occluded_point(rng):
    """Two source points projecting to one target pixel: under occlusion=1
    only the closer contributes (the farther is z-buffered out), so the
    sweep's term counts drop relative to the plain variant."""
    import jax.numpy as jnp

    from rgbd360_tpu.io.calib import qvga_camera_matrix
    from rgbd360_tpu.ops.photoicp import pack_target_channels, LevelData, build_pyramid_set, make_level_data
    from rgbd360_tpu.ops.photoicp_pinhole import fused_sweep_pinhole, pinhole_lut

    h, w = 32, 40
    k = jnp.asarray(qvga_camera_matrix() * (w / 320.0))
    gray = rng.random((h, w)).astype(np.float32)
    depth_trg = np.full((h, w), 2.0, np.float32)
    # source: same scene but with a near blob that occludes after a small
    # translation along z
    depth_src = depth_trg.copy()
    depth_src[10:20, 10:20] = 1.0
    src = build_pyramid_set(jnp.asarray(gray), jnp.asarray(depth_src), 1, is_target=False, sphere_seam_mask=False)
    trg = build_pyramid_set(jnp.asarray(gray), jnp.asarray(depth_trg), 1, is_target=True, sphere_seam_mask=False)
    level = make_level_data(jax_tree_unsqueeze(src), jax_tree_unsqueeze(trg), 0)
    level = jax_tree_squeeze(level)
    xyz, valid = pinhole_lut(level.depth_src, k, 0)
    packed = pack_target_channels(level)
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 0.3  # shift so near blob points land on far-surface pixels
    plain = fused_sweep_pinhole(
        level.gray_src.reshape(-1), packed, (h, w), xyz, valid, jnp.asarray(pose), k, 0, 2
    )
    occ1 = fused_sweep_pinhole(
        level.gray_src.reshape(-1), packed, (h, w), xyz, valid, jnp.asarray(pose), k, 0, 2,
        occlusion=1,
    )
    assert int(occ1[1]) < int(plain[1])  # fewer surviving terms


def jax_tree_unsqueeze(t):
    import jax

    return jax.tree.map(lambda x: x[None], t)


def jax_tree_squeeze(t):
    import jax

    return jax.tree.map(lambda x: x[0], t)


# ---------------------------------------------------------------------------
# scalar-oracle parity for the pinhole sweep (ref_impl transcription of
# errorPhotoICP :560-775 / calcHessGrad :776-1100)
# ---------------------------------------------------------------------------


def _pinhole_level(rng, h=24, w=32):
    import ref_impl

    yy, xx = np.mgrid[0:h, 0:w]
    gray = 0.5 + 0.3 * np.sin(xx / 5.0) * np.cos(yy / 4.0) + 0.05 * rng.normal(size=(h, w))
    gray = gray.astype(np.float32)
    depth = (2.0 + 0.6 * np.sin(xx / 9.0) + 0.3 * np.cos(yy / 5.0)).astype(np.float32)
    depth[rng.random((h, w)) < 0.05] = 0.0
    gx, gy = ref_impl.gradient_xy(gray.astype(np.float64))
    dgx, dgy = ref_impl.gradient_xy(depth.astype(np.float64))
    level_np = dict(
        gray_src=gray.astype(np.float64),
        depth_src=depth.astype(np.float64),
        gray_trg=gray.astype(np.float64),
        depth_trg=depth.astype(np.float64),
        gray_trg_gx=gx, gray_trg_gy=gy, depth_trg_gx=dgx, depth_trg_gy=dgy,
    )
    from rgbd360_tpu.ops.photoicp import LevelData

    level_jx = LevelData(
        gray_src=jnp.asarray(gray), depth_src=jnp.asarray(depth),
        gray_trg=jnp.asarray(gray), depth_trg=jnp.asarray(depth),
        gray_trg_gx=jnp.asarray(gx.astype(np.float32)),
        gray_trg_gy=jnp.asarray(gy.astype(np.float32)),
        depth_trg_gx=jnp.asarray(dgx.astype(np.float32)),
        depth_trg_gy=jnp.asarray(dgy.astype(np.float32)),
    )
    k = np.array([[30.0, 0, w / 2 - 0.5], [0, 30.0, h / 2 - 0.5], [0, 0, 1]], np.float32)
    return level_np, level_jx, k


@pytest.mark.parametrize("method", [0, 1, 2])
@pytest.mark.parametrize("shift", [0, 1])
def test_pinhole_sweep_matches_scalar_oracle(rng, method, shift):
    """fused_sweep_pinhole's error stats must reproduce the UNGATED
    errorPhotoICP pixel set and its H/g the saliency-gated (and PHOTO_DEPTH
    photo<->depth coupled) calcHessGrad set — the two sets differ in the
    reference by design (tests/ref_impl.py transcription)."""
    import ref_impl

    from rgbd360_tpu.ops import photoicp_pinhole as pp

    level_np, level_jx, k = _pinhole_level(rng)
    pose = np.eye(4, dtype=np.float32)
    if shift:
        pose = np.asarray(
            se3.exp_se3(jnp.array([0.02, -0.015, 0.03, 0.008, -0.01, 0.012]), pseudo=False),
            np.float32,
        )
    xyz_np, valid_np = ref_impl.build_pinhole_lut(
        level_np["depth_src"], k.astype(np.float64), 0
    )
    pe_ref, np_ref, de_ref, nd_ref = ref_impl.error_pinhole(
        level_np, xyz_np, valid_np, pose.astype(np.float64), k.astype(np.float64), 0, method
    )
    H_ref, g_ref = ref_impl.hess_grad_pinhole(
        level_np, xyz_np, valid_np, pose.astype(np.float64), k.astype(np.float64), 0, method
    )

    kj = jnp.asarray(k)
    xyz, valid = pp.pinhole_lut(level_jx.depth_src, kj, 0)
    packed = pp.pack_target_channels(level_jx)
    err2, n_terms, H, g, pe, n_photo, de, n_depth = pp.fused_sweep_pinhole(
        level_jx.gray_src.reshape(-1), packed, level_jx.gray_src.shape,
        xyz, valid, jnp.asarray(pose), kj, 0, method,
    )
    assert int(n_photo) == np_ref and int(n_depth) == nd_ref
    assert float(pe) == pytest.approx(pe_ref, rel=2e-4, abs=1e-6)
    assert float(de) == pytest.approx(de_ref, rel=2e-4, abs=1e-6)
    scale = max(np.abs(H_ref).max(), 1.0)
    np.testing.assert_allclose(np.asarray(H) / scale, H_ref / scale, atol=2e-4)
    gscale = max(np.abs(g_ref).max(), 1.0)
    np.testing.assert_allclose(np.asarray(g) / gscale, g_ref / gscale, atol=2e-4)


@pytest.mark.parametrize("method", [0, 1, 2])
def test_robot_sweep_matches_scalar_oracle(rng, method):
    """fused_sweep_pinhole with a rig extrinsic vs ref_impl.sweep_robot: the
    R_cam^-1 [I | -skew(p_robot')] twist chain (calcHessianGradient_robot
    :5163-5167) with the documented deviations pinned (consistent depth
    residual pair; intended jacobianRt_z; no saliency gates anywhere)."""
    import ref_impl

    level_np, level_jx, k = _pinhole_level(rng)
    a = np.deg2rad(40.0)
    cam_rt = np.eye(4, dtype=np.float32)
    cam_rt[:3, :3] = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    )
    cam_rt[:3, 3] = [0.05, -0.02, 0.1]
    pose = np.asarray(
        se3.exp_se3(jnp.array([0.02, -0.015, 0.03, 0.01, -0.008, 0.012]), pseudo=False),
        np.float32,
    )
    pe_ref, nph_ref, de_ref, nd_ref, H_ref, g_ref = ref_impl.sweep_robot(
        level_np,
        *ref_impl.build_pinhole_lut(level_np["depth_src"], k.astype(np.float64), 0),
        pose.astype(np.float64), cam_rt.astype(np.float64),
        k.astype(np.float64), 0, method,
    )

    from rgbd360_tpu.ops.photoicp import pack_target_channels

    kj = jnp.asarray(k)
    xyz, valid = pp.pinhole_lut(level_jx.depth_src, kj, 0)
    packed = pack_target_channels(level_jx)
    err2, n_terms, H, g, pe, nph, de, nd = pp.fused_sweep_pinhole(
        level_jx.gray_src.reshape(-1), packed, level_jx.gray_src.shape,
        xyz, valid, jnp.asarray(pose), kj, 0, method, cam_rt=jnp.asarray(cam_rt),
    )
    assert (int(nph), int(nd)) == (nph_ref, nd_ref)
    assert float(pe) == pytest.approx(pe_ref, rel=2e-4, abs=1e-6)
    assert float(de) == pytest.approx(de_ref, rel=2e-4, abs=1e-6)
    hs = max(np.abs(H_ref).max(), 1.0)
    np.testing.assert_allclose(np.asarray(H) / hs, H_ref / hs, atol=2e-4)
    gs = max(np.abs(g_ref).max(), 1.0)
    np.testing.assert_allclose(np.asarray(g) / gs, g_ref / gs, atol=2e-4)
