"""Parity + convergence tests for the dense spherical aligner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ref_impl
from rgbd360_tpu.ops import photoicp, se3
from rgbd360_tpu.ops.sphere import sphere_project, sphere_xyz_lut


def _small_level(rng, h=20, w=120):
    """A synthetic smooth panorama level (coarse pyramid scale)."""
    yy, xx = np.mgrid[0:h, 0:w]
    gray = 0.5 + 0.3 * np.sin(xx / 7.0) * np.cos(yy / 5.0) + 0.05 * rng.normal(size=(h, w))
    gray = gray.astype(np.float32)
    depth = (2.5 + 0.8 * np.sin(xx / 11.0) + 0.4 * np.cos(yy / 6.0)).astype(np.float32)
    depth[rng.random((h, w)) < 0.05] = 0.0
    gx, gy = ref_impl.gradient_xy(gray.astype(np.float64))
    dgx, dgy = ref_impl.gradient_xy(depth.astype(np.float64))
    level_np = dict(
        gray_src=gray.astype(np.float64),
        depth_src=depth.astype(np.float64),
        gray_trg=gray.astype(np.float64),
        depth_trg=depth.astype(np.float64),
        gray_trg_gx=gx,
        gray_trg_gy=gy,
        depth_trg_gx=dgx,
        depth_trg_gy=dgy,
    )
    level_jx = photoicp.LevelData(
        gray_src=jnp.asarray(gray),
        depth_src=jnp.asarray(depth),
        gray_trg=jnp.asarray(gray),
        depth_trg=jnp.asarray(depth),
        gray_trg_gx=jnp.asarray(gx.astype(np.float32)),
        gray_trg_gy=jnp.asarray(gy.astype(np.float32)),
        depth_trg_gx=jnp.asarray(dgx.astype(np.float32)),
        depth_trg_gy=jnp.asarray(dgy.astype(np.float32)),
    )
    return level_np, level_jx


POSES = [
    np.eye(4, dtype=np.float32),
    np.asarray(
        se3.exp_se3(jnp.array([0.03, -0.02, 0.05, 0.01, -0.02, 0.015]), pseudo=True)
    ),
]


@pytest.mark.parametrize("method", [0, 1, 2])
@pytest.mark.parametrize("pose_idx", [0, 1])
def test_error_sphere_matches_reference(rng, method, pose_idx):
    level_np, level_jx = _small_level(rng)
    pose = POSES[pose_idx]
    xyz_np, valid_np = ref_impl.build_sphere_lut(level_np["depth_src"])
    expected = ref_impl.error_sphere(level_np, xyz_np, valid_np, pose.astype(np.float64), method)

    xyz, valid = sphere_xyz_lut(level_jx.depth_src, 0.3, 6.0)
    got = float(photoicp.error_sphere(level_jx, xyz, valid, jnp.asarray(pose), method))
    # abs floor: at identity the error is ~0 and only f32 rounding remains
    assert got == pytest.approx(expected, rel=2e-4, abs=1e-5)


@pytest.mark.parametrize("method", [0, 1, 2])
@pytest.mark.parametrize("pose_idx", [0, 1])
def test_hess_grad_matches_reference(rng, method, pose_idx):
    level_np, level_jx = _small_level(rng)
    pose = POSES[pose_idx]
    xyz_np, valid_np = ref_impl.build_sphere_lut(level_np["depth_src"])
    H_ref, g_ref, sso_ref = ref_impl.hess_grad_sphere(
        level_np, xyz_np, valid_np, pose.astype(np.float64), method
    )
    xyz, valid = sphere_xyz_lut(level_jx.depth_src, 0.3, 6.0)
    H, g, sso, *_ = photoicp.hess_grad_sphere(level_jx, xyz, valid, jnp.asarray(pose), method)
    scale = max(np.abs(H_ref).max(), 1.0)
    np.testing.assert_allclose(np.asarray(H) / scale, H_ref / scale, atol=2e-4)
    gscale = max(np.abs(g_ref).max(), 1.0)
    np.testing.assert_allclose(np.asarray(g) / gscale, g_ref / gscale, atol=2e-4)
    assert float(sso) == pytest.approx(sso_ref, abs=1e-6)


def test_lut_matches_reference(rng):
    level_np, level_jx = _small_level(rng)
    xyz_np, valid_np = ref_impl.build_sphere_lut(level_np["depth_src"])
    xyz, valid = sphere_xyz_lut(level_jx.depth_src, 0.3, 6.0)
    np.testing.assert_array_equal(np.asarray(valid), valid_np)
    np.testing.assert_allclose(np.asarray(xyz)[valid_np], xyz_np[valid_np], atol=1e-5)


def test_wrap_column_dropped():
    """Points projecting to theta==2*pi (col == W) are dropped, not wrapped."""
    h, w = 8, 16
    # just above the -z axis: theta = atan2(+eps, -1)+pi ~ 2*pi
    p = jnp.array([[0.0, 1e-8, -2.0]])
    dist, ri, ci, inb = sphere_project(p, h, w)
    assert int(ci[0]) == w  # rounds to the wrap column...
    assert not bool(inb[0])  # ...and is rejected like the reference


def test_synthetic_pose_recovery(rng):
    """Self-consistency: warping a frame by a known pose must be recovered
    below the 1e-3 north-star gate (BASELINE.md)."""
    h, w = 64, 256
    yy, xx = np.mgrid[0:h, 0:w]
    # multi-frequency texture: nearest-neighbour warps need rich gradients to
    # resolve sub-pixel motion
    gray = (
        0.5
        + 0.2 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
        + 0.12 * np.sin(xx / 3.1)
        + 0.08 * np.cos(xx / 1.7 + yy / 2.3)
        + 0.06 * np.sin(yy / 1.9)
    ).astype(np.float32)
    depth = (
        2.0 + 0.6 * np.sin(xx / 13.0) + 0.3 * np.cos(yy / 8.0) + 0.1 * np.sin(xx / 5.0)
    ).astype(np.float32)
    gray_j, depth_j = jnp.asarray(gray), jnp.asarray(depth)

    xi = jnp.array([0.03, -0.024, 0.045, 0.012, -0.018, 0.009], jnp.float32)
    pose_true = se3.exp_se3(xi, pseudo=True)
    xyz, valid = sphere_xyz_lut(depth_j, 0.3, 6.0)
    p = xyz @ pose_true[:3, :3].T + pose_true[:3, 3]
    dist, ri, ci, inb = sphere_project(p, h, w)
    flat = jnp.clip(ri, 0, h - 1) * w + jnp.clip(ci, 0, w - 1)
    ok = (valid & inb).reshape(h, w)
    src_gray = jnp.where(ok, jnp.take(gray_j.reshape(-1), flat).reshape(h, w), 0.0)
    src_depth = jnp.where(ok, depth_j, 0.0)

    res = photoicp.align_spheres_jit(
        src_gray, src_depth, gray_j, depth_j, jnp.eye(4), method=photoicp.PHOTO_DEPTH, n_levels=3
    )
    assert not bool(res.ill_posed)
    err = np.abs(np.asarray(res.pose) - np.asarray(pose_true)).max()
    assert err < 1e-3


def test_self_alignment_is_identity(rng):
    h, w = 32, 128
    gray = jnp.asarray(rng.random((h, w)).astype(np.float32))
    depth = jnp.asarray((2.0 + rng.random((h, w))).astype(np.float32))
    res = photoicp.align_spheres_jit(
        gray, depth, gray, depth, jnp.eye(4), method=photoicp.PHOTO_DEPTH, n_levels=2
    )
    np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-7)


def test_batched_alignment_vmap(rng):
    """The whole aligner vmaps over pairs (the DP scale-out unit)."""
    h, w = 16, 64
    gray = rng.random((2, h, w)).astype(np.float32)
    depth = (2.0 + rng.random((2, h, w))).astype(np.float32)
    f = jax.vmap(
        lambda gs, ds, gt, dt: photoicp.align_spheres_jit(
            gs, ds, gt, dt, jnp.eye(4), method=photoicp.PHOTO_DEPTH, n_levels=2
        )
    )
    res = f(jnp.asarray(gray), jnp.asarray(depth), jnp.asarray(gray), jnp.asarray(depth))
    assert res.pose.shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(res.pose[0]), np.eye(4), atol=1e-6)


def test_occlusion_variants(rng):
    """Occ1/Occ2 run and stay consistent with the plain variant on
    occlusion-free synthetic data."""
    h, w = 32, 128
    yy, xx = np.mgrid[0:h, 0:w]
    gray = (0.5 + 0.2 * np.sin(xx / 5.0) * np.cos(yy / 3.0) + 0.1 * np.sin(xx / 1.7)).astype(
        np.float32
    )
    depth = (2.0 + 0.4 * np.sin(xx / 9.0)).astype(np.float32)
    gray_j, depth_j = jnp.asarray(gray), jnp.asarray(depth)
    for occ in (1, 2):
        res = photoicp.align_spheres_jit(
            gray_j, depth_j, gray_j, depth_j, jnp.eye(4),
            method=photoicp.PHOTO_DEPTH, n_levels=2, occlusion=occ,
        )
        np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-6)


def test_occlusion_zbuffer_drops_farther_point():
    """Two source points landing on one target pixel: only the closest
    contributes under occlusion=1."""
    from rgbd360_tpu.ops.photoicp import occlusion_mask_sphere

    h, w = 8, 32
    # craft two valid source points that project to the same target pixel:
    # same direction, different radius
    angle_res = 2 * np.pi / w
    phi = (0.5 * h - 0.5 - 3) * angle_res
    theta = 10 * angle_res
    d1, d2 = 1.0, 3.0
    xyz = np.zeros((h * w, 3), np.float32)
    valid = np.zeros(h * w, bool)
    for k, d in ((3 * w + 10, d1), (4 * w + 20, d2)):
        pass
    u = np.array([np.sin(phi), -np.cos(phi) * np.sin(theta), -np.cos(phi) * np.cos(theta)])
    xyz[0] = d1 * u
    xyz[1] = d2 * u
    valid[0] = valid[1] = True
    closest, dynamic = occlusion_mask_sphere(
        jnp.asarray(xyz), jnp.asarray(valid), jnp.eye(4), (h, w)
    )
    closest = np.asarray(closest)
    assert closest[0] and not closest[1]


def test_pack_target_planes4_roundtrip():
    """The packed f16-pair layout (the optional kernel layout): i32 dtype,
    slot order, and depth hi/lo reconstruction to <1e-3 m (PERF.md 0b)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    h, w = 16, 64
    gray = rng.random((h, w)).astype(np.float32)
    depth = rng.uniform(0.3, 6.0, (h, w)).astype(np.float32)
    gx = (rng.random((h, w)) - 0.5).astype(np.float32)
    lvl = photoicp.LevelData(
        gray_src=jnp.asarray(gray), depth_src=jnp.asarray(depth),
        gray_trg=jnp.asarray(gray), depth_trg=jnp.asarray(depth),
        gray_trg_gx=jnp.asarray(gx), gray_trg_gy=jnp.asarray(gx * 2),
        depth_trg_gx=jnp.asarray(gx * 3), depth_trg_gy=jnp.asarray(gx * 4),
    )
    pk = photoicp.pack_target_planes4(lvl)
    assert pk.shape == (h, 4, w) and pk.dtype == jnp.int32
    g_, d_lo = photoicp._unpack2_f16(pk[:, 0])
    d_hi, flag = photoicp._unpack2_f16(pk[:, 1])
    np.testing.assert_allclose(np.asarray(g_), gray, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(flag), 0.0)  # reserved slot
    rec = np.asarray(d_hi + d_lo)
    assert np.abs(rec - depth).max() < 1e-3
    ggx, ggy = photoicp._unpack2_f16(pk[:, 2])
    np.testing.assert_allclose(np.asarray(ggx), gx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ggy), gx * 2, atol=2e-3)
