"""Warp-kernel coverage safety at loop-closure-scale motion (VERDICT r1 #4).

The Mosaic block-warp kernel masks out-of-window and wrap-seam targets
(ops/warp_gather.py) — a coverage deviation that grows with motion. These
tests gate that the masking does not move the converged pose out of the
reference basin at the largest motion available (the bundled pair's 27 cm,
unseeded — LC dense refinement runs seeded by the PbMap estimate, so its
residual motion and thus its coverage is strictly better than this case):

  * on any backend: the XLA path with the kernel's window mask *emulated*
    (photoicp.EMULATE_KERNEL_WINDOW_MASK + warp_gather.window_mask_reference)
    must converge to the same basin as the exact path;
  * on TPU only: the real kernel's mask must equal the emulation, tying the
    CPU gate to the hardware path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.ops import photoicp, se3

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pair_1_10.npz")


@pytest.fixture(scope="module")
def pair():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden npz not generated")
    d = np.load(GOLDEN)
    return (
        jnp.asarray(d["gray_src_u8"].astype(np.float32) / 255.0),
        jnp.asarray(d["depth_src_mm"].astype(np.float32) * 0.001),
        jnp.asarray(d["gray_trg_u8"].astype(np.float32) / 255.0),
        jnp.asarray(d["depth_trg_mm"].astype(np.float32) * 0.001),
    )


def _align(pair, n_levels=5, full_coverage=False):
    gs, ds, gt, dt = pair

    @jax.jit  # fresh wrapper per call: retraces under the current mask flag
    def run():
        return photoicp.align_spheres_jit.__wrapped__(
            gs, ds, gt, dt, jnp.eye(4), method=photoicp.PHOTO_DEPTH,
            n_levels=n_levels, full_coverage=full_coverage,
        )

    return run()


def test_window_mask_pose_agreement_at_large_motion(pair):
    """Kernel-masked vs exact alignment of the bundled pair from identity
    (the documented worst case: 27 cm unseeded, ~76% coverage)."""
    res_exact = _align(pair)
    old = photoicp.EMULATE_KERNEL_WINDOW_MASK
    photoicp.EMULATE_KERNEL_WINDOW_MASK = True
    try:
        res_masked = _align(pair)
    finally:
        photoicp.EMULATE_KERNEL_WINDOW_MASK = old

    assert not bool(res_exact.ill_posed) and not bool(res_masked.ill_posed)
    p_e = np.asarray(res_exact.pose)
    p_m = np.asarray(res_masked.pose)
    t_e, t_m = np.linalg.norm(p_e[:3, 3]), np.linalg.norm(p_m[:3, 3])
    assert abs(t_e - t_m) < 0.1, f"|t| exact {t_e:.3f} vs masked {t_m:.3f}"
    ang = float(se3.rot_angle_deg(jnp.asarray(p_e[:3, :3]), jnp.asarray(p_m[:3, :3])))
    assert ang < 2.0, f"rotation drift {ang:.2f} deg"


def test_window_mask_emulation_covers_small_motion():
    """Near-identity warps must be ~fully in-window (typical tracking and
    PbMap-seeded LC refinement motions are 5-10x smaller than the bundled
    pair's, PERF.md)."""
    from rgbd360_tpu.ops.warp_gather import window_mask_reference

    h, w = 64, 256
    rows = np.broadcast_to(np.arange(h)[:, None], (h, w)).astype(np.int32)
    cols = np.broadcast_to(np.arange(w)[None, :], (h, w)).astype(np.int32)
    # +-1 pixel jitter, clipped — a sub-pixel-scale warp
    rng = np.random.default_rng(0)
    r = np.clip(rows + rng.integers(-1, 2, (h, w)), 0, h - 1).astype(np.int32)
    c = np.clip(cols + rng.integers(-1, 2, (h, w)), 0, w - 1).astype(np.int32)
    mask = np.asarray(window_mask_reference(jnp.asarray(r), jnp.asarray(c)))
    assert mask.mean() > 0.99


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel is TPU-only")
def test_kernel_mask_matches_emulation_on_tpu():
    """The real kernel's in_window mask must equal window_mask_reference —
    this ties the CPU-side pose-agreement gate to the hardware path."""
    from rgbd360_tpu.ops.warp_gather import warp_gather, window_mask_reference

    rng = np.random.default_rng(1)
    h, w = 32, 256
    planes = jnp.asarray(rng.random((h, 8, w)).astype(np.float32))
    rows = np.broadcast_to(np.arange(h)[:, None], (h, w))
    cols = np.broadcast_to(np.arange(w)[None, :], (h, w))
    r = np.clip(rows + rng.integers(-8, 9, (h, w)), 0, h - 1).astype(np.int32)
    c = np.clip(cols + rng.integers(-40, 41, (h, w)), 0, w - 1).astype(np.int32)
    _out, in_win = warp_gather(planes, jnp.asarray(r), jnp.asarray(c))
    ref = window_mask_reference(jnp.asarray(r), jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(in_win), np.asarray(ref))


def test_window_mask_covers_wrap_seam():
    """A rigid yaw shifts every column by a constant offset mod W; tiles at
    the seam straddle it. The wrap halo must keep them covered (previously
    they were masked out — PERF.md 'Remaining levers' #2)."""
    from rgbd360_tpu.ops.warp_gather import window_mask_reference

    h, w = 64, 512
    rows = np.broadcast_to(np.arange(h)[:, None], (h, w)).astype(np.int32)
    cols = np.broadcast_to(np.arange(w)[None, :], (h, w)).astype(np.int32)
    for shift in (-37, 23, 130):
        c = ((cols + shift) % w).astype(np.int32)
        mask = np.asarray(window_mask_reference(jnp.asarray(rows), jnp.asarray(c)))
        assert mask.mean() > 0.995, f"shift {shift}: coverage {mask.mean():.3f}"


def test_window_mask_covers_wrap_with_invisible_identity_pixels():
    """Seam tiles mix wrapped visible targets with identity coordinates of
    invisible pixels (fused_sweep_sphere feeds source coords there); the
    straddle remap must keep the visible side covered."""
    from rgbd360_tpu.ops.warp_gather import window_mask_reference

    h, w = 32, 512
    rows = np.broadcast_to(np.arange(h)[:, None], (h, w)).astype(np.int32)
    cols = np.broadcast_to(np.arange(w)[None, :], (h, w)).astype(np.int32)
    c = ((cols - 20) % w).astype(np.int32)
    visible = np.random.default_rng(2).random((h, w)) > 0.3
    c = np.where(visible, c, cols)  # invisible -> identity
    mask = np.asarray(window_mask_reference(jnp.asarray(rows), jnp.asarray(c.astype(np.int32))))
    assert mask[visible].mean() > 0.99


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel is TPU-only")
def test_kernel_wrap_values_match_xla_gather_on_tpu():
    """At a seam-crossing warp the kernel's gathered values must equal an
    exact XLA gather wherever the kernel reports in-window, and the mask
    must equal the emulation."""
    from rgbd360_tpu.ops.warp_gather import warp_gather, window_mask_reference

    rng = np.random.default_rng(3)
    h, w = 32, 512
    planes = jnp.asarray(rng.random((h, 8, w)).astype(np.float32))
    rows = np.broadcast_to(np.arange(h)[:, None], (h, w))
    cols = np.broadcast_to(np.arange(w)[None, :], (h, w))
    # row spread 3 (dr=+-1) fits the K=4 row window (round-4 default), so
    # the >0.99 coverage guarantee below stays meaningful
    r = np.clip(rows + rng.integers(-1, 2, (h, w)), 0, h - 1).astype(np.int32)
    c = ((cols - 25 + rng.integers(-3, 4, (h, w))) % w).astype(np.int32)
    out, in_win = warp_gather(planes, jnp.asarray(r), jnp.asarray(c))
    ref_mask = window_mask_reference(jnp.asarray(r), jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(in_win), np.asarray(ref_mask))
    assert np.asarray(in_win).mean() > 0.99
    exact = np.asarray(planes).transpose(1, 0, 2)[:, r, c]  # (C, h, w)
    got = np.asarray(out)
    m = np.asarray(in_win)
    # channel 6 is reserved for the in-window flag on the pipelined path
    # (zero in production packing, ops/photoicp.py pack_target_planes8)
    data_ch = [0, 1, 2, 3, 4, 5, 7]
    np.testing.assert_allclose(got[data_ch][:, m], exact[data_ch][:, m], rtol=0, atol=0)


def test_two_pass_window_coverage_emulation():
    """Pass 2's windows, placed from the pixels pass 1 missed, must recover
    nearly all of them (the exact-final stats path relies on this)."""
    from rgbd360_tpu.ops.warp_gather import window_mask_reference

    h, w = 64, 512
    rng = np.random.default_rng(11)
    rows = np.broadcast_to(np.arange(h)[:, None], (h, w)).astype(np.int32)
    cols = np.broadcast_to(np.arange(w)[None, :], (h, w)).astype(np.int32)
    # the realistic miss structure: two coherent depth bands per region —
    # a dominant near plane (small shift) and a minority far plane whose
    # parallax row-offset exceeds the K-row window around the tile mean
    far = rng.random((h, w)) < 0.3
    r = np.clip(rows + np.where(far, 12, 0) + rng.integers(-1, 2, (h, w)), 0, h - 1)
    c = np.clip(cols + np.where(far, -9, 4), 0, w - 1)
    r = r.astype(np.int32)
    c = c.astype(np.int32)
    combined = np.asarray(window_mask_reference(jnp.asarray(r), jnp.asarray(c)))
    m1_cov = combined.mean()
    assert m1_cov < 0.9  # the mean-centred pass genuinely misses pixels
    # the exact path: min- then max-anchored re-gather passes over the
    # missed set, peeling the lowest and highest remaining parallax bands
    for policy in ("min", "max"):
        miss = jnp.asarray(~combined)
        mk = np.asarray(
            window_mask_reference(jnp.asarray(r), jnp.asarray(c), miss, row_policy=policy)
        )
        combined = combined | (mk & np.asarray(miss))
    # mid-band pixels between the two anchors can remain; on real data
    # pass 1 covers 76-100%, so the residual deficit is <1% of pixels
    assert combined.mean() > 0.97, f"three-pass coverage {combined.mean():.3f}"
    assert combined.mean() > m1_cov + 0.05


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel is TPU-only")
def test_two_pass_sweep_stats_near_exact_on_tpu():
    """fused_sweep two_pass stats on the bundled pair at the converged pose
    must track the exact XLA-path stats (the LC/KF gates consume them)."""
    from rgbd360_tpu.ops import photoicp

    if not os.path.exists(GOLDEN):
        pytest.skip("golden npz not generated")
    d = np.load(GOLDEN)
    gs = jnp.asarray(d["gray_src_u8"].astype(np.float32) / 255.0)
    ds = jnp.asarray(d["depth_src_mm"].astype(np.float32) * 0.001)
    gt = jnp.asarray(d["gray_trg_u8"].astype(np.float32) / 255.0)
    dt = jnp.asarray(d["depth_trg_mm"].astype(np.float32) * 0.001)
    pose = jnp.asarray(d["free_pose"].astype(np.float32))

    src = photoicp.build_pyramid_set(gs, ds, 1, is_target=False, sphere_seam_mask=True)
    trg = photoicp.build_pyramid_set(gt, dt, 1, is_target=True, sphere_seam_mask=True)
    lvl = photoicp.make_level_data(src, trg, 0)
    from rgbd360_tpu.ops.sphere import sphere_xyz_lut

    xyz, valid = sphere_xyz_lut(lvl.depth_src, 0.3, 6.0)
    gsf = lvl.gray_src.reshape(-1)
    shape = lvl.gray_src.shape
    pk = photoicp.pack_target_planes8(lvl)

    @jax.jit
    def run():
        exact = photoicp.fused_sweep_sphere(
            gsf, photoicp.pack_target_channels(lvl), shape, xyz, valid, pose,
            photoicp.PHOTO_DEPTH,
        )
        two = photoicp.fused_sweep_sphere(
            gsf, pk, shape, xyz, valid, pose, photoicp.PHOTO_DEPTH, two_pass=True
        )
        one = photoicp.fused_sweep_sphere(
            gsf, pk, shape, xyz, valid, pose, photoicp.PHOTO_DEPTH
        )
        return exact, two, one

    exact, two, one = jax.tree.map(np.asarray, run())
    err_e, err_2, err_1 = float(exact[0]), float(two[0]), float(one[0])
    # two-pass must sit much closer to exact than single-pass
    assert abs(err_2 - err_e) <= max(0.3 * abs(err_1 - err_e), 0.02 * err_e), (
        f"exact {err_e:.4f} two-pass {err_2:.4f} one-pass {err_1:.4f}"
    )
    # av depth residual (the LC gate quantity): two-pass must land closer
    # to exact than one-pass and within 10% absolute. (A residual gap vs the
    # XLA path remains even at full coverage: the XLA layout carries
    # f16-packed gradients, the kernel layout f32, which shifts the
    # saliency masks slightly.)
    def av_depth(st):
        return float(np.sqrt(st[6] / max(float(st[7]), 1.0)))
    d2 = abs(av_depth(two) - av_depth(exact))
    d1 = abs(av_depth(one) - av_depth(exact))
    assert d2 <= max(0.6 * d1, 0.10 * max(av_depth(exact), 1e-6)), (
        f"av_depth exact {av_depth(exact):.4f} two {av_depth(two):.4f} one {av_depth(one):.4f}"
    )
    # visible-pixel counts: two-pass recovers most of the single-pass deficit
    n_e, n_2, n_1 = float(exact[5]), float(two[5]), float(one[5])
    assert (n_e - n_2) <= 0.35 * (n_e - n_1) + 0.005 * n_e, (n_e, n_2, n_1)


def _exact_vs_full_coverage(pair):
    """exact-path vs full-coverage-masked alignment, per backend:

    * CPU: exact = plain XLA align; masked = XLA align with the window-mask
      EMULATION applied at the kernel-routed levels.
    * real TPU (RGBD360_TEST_TPU=1): exact = the XLA path FORCED
      (_use_warp_kernel disabled — on the chip the default align runs the
      REAL windowed kernel, so it cannot serve as the exact side); masked =
      the real Mosaic kernel with full coverage. This is the stronger form
      of the same gate: the hardware kernel itself against the exact
      program it approximates.
    """
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        orig = photoicp._use_warp_kernel
        photoicp._use_warp_kernel = lambda shape: False
        try:
            res_exact = _align(pair)
        finally:
            photoicp._use_warp_kernel = orig
        res_masked = _align(pair, full_coverage=True)
        return res_exact, res_masked
    res_exact = _align(pair)
    old = photoicp.EMULATE_KERNEL_WINDOW_MASK
    photoicp.EMULATE_KERNEL_WINDOW_MASK = True
    try:
        res_masked = _align(pair, full_coverage=True)
    finally:
        photoicp.EMULATE_KERNEL_WINDOW_MASK = old
    return res_exact, res_masked


def test_full_coverage_pose_agreement_at_large_motion(pair):
    """With full_coverage (one triple-anchored kernel pass per GN sweep —
    the LC/relocalization configuration, sole path since the sequential
    re-gather composition lost its final on-chip A/B in round 5) the
    kernel-masked alignment must track the exact path to <=0.5 deg / 2 cm
    even at the bundled pair's LC-scale 27 cm motion (VERDICT r2 #3:
    tightened from the 2.0-deg single-window gate above)."""
    res_exact, res_masked = _exact_vs_full_coverage(pair)

    assert not bool(res_masked.ill_posed)
    p_e = np.asarray(res_exact.pose)
    p_m = np.asarray(res_masked.pose)
    assert np.linalg.norm(p_e[:3, 3] - p_m[:3, 3]) < 0.02
    ang = float(se3.rot_angle_deg(jnp.asarray(p_e[:3, :3]), jnp.asarray(p_m[:3, :3])))
    assert ang <= 0.5, f"rotation drift {ang:.3f} deg"
