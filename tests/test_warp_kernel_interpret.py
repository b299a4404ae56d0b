"""Run the REAL Mosaic warp kernel on CPU via pallas interpret mode.

Everything else in the CPU suite exercises the kernel's semantics through
window_mask_reference (a pure-XLA mirror of its window selection) — the
kernel body itself previously executed only on TPU hardware. Interpret mode
executes the actual kernel code (DMA pipelining, halo remap, per-row K
windows, the i32 data path, the hit-flag channels), so these gates catch a
kernel/mirror divergence without a chip:

  * default pass: in-window mask == window_mask_reference EXACTLY (the
    invariant ops/photoicp._exact_final_missed_stats depends on), and every
    covered pixel's data == direct indexing
  * masked min-/max-anchored re-gather entries: same two properties under an
    `active` restriction (the exact composition exact-final stats run)
  * packed 4-channel i32 layout: covered rows are BIT-exact vs the packed
    source, including f32-denormal bit patterns (the flush hazard the i32
    path exists to avoid) with the hit flag OR'd into channel 1's high half

Interpret mode is slow — shapes stay small (64x256, seam-straddling and
K-overflow cases engineered in).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rgbd360_tpu.ops import warp_gather as wg


@pytest.fixture()
def interpret_kernel():
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    pl.pallas_call = patched
    wg.warp_gather_batched.clear_cache()
    wg.warp_gather_batched_multi.clear_cache()
    yield
    pl.pallas_call = orig
    wg.warp_gather_batched.clear_cache()
    wg.warp_gather_batched_multi.clear_cache()


def _warp_indices(seed, h, w, dr, dc, seam=False):
    """Locally-coherent indices like a real warp: identity + bounded offsets.
    dr can exceed the kernel's K=6 row window so some pixels are genuinely
    out-of-window; seam=True shifts a column band across the theta seam."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.clip(yy + rng.integers(-dr, dr + 1, size=(h, w)), 0, h - 1)
    c = xx + rng.integers(-dc, dc + 1, size=(h, w))
    if seam:
        c[:, : w // 8] -= w // 4  # low columns warp across the wrap seam
    return r.astype(np.int32), (c % w).astype(np.int32)


def _direct(planes, r, c):
    return planes[r, :, c].transpose(2, 0, 1)  # (C, H, W)


def test_default_pass_matches_reference_mask_and_data(interpret_kernel):
    rng = np.random.default_rng(3)
    h, w = 64, 256
    planes = rng.normal(size=(h, 8, w)).astype(np.float32)
    planes[:, 6, :] = 0.0  # flag channel must arrive zero
    r, c = _warp_indices(5, h, w, dr=8, dc=20, seam=True)

    out, mask = wg.warp_gather_batched(
        jnp.asarray(planes)[None], jnp.asarray(r)[None], jnp.asarray(c)[None]
    )
    out = np.asarray(out)[0]
    mask = np.asarray(mask)[0]

    ref_mask = np.asarray(
        wg.window_mask_reference(jnp.asarray(r), jnp.asarray(c))
    )
    np.testing.assert_array_equal(mask, ref_mask)
    assert 0.2 < mask.mean() < 0.95  # dr=8 > K=6: genuinely mixed coverage

    direct = _direct(planes, r, c)
    ch = [0, 1, 2, 3, 4, 5, 7]
    np.testing.assert_array_equal(out[ch][:, mask], direct[ch][:, mask])
    # the flag channel carries exactly the mask as f32 1.0
    np.testing.assert_array_equal(out[6][mask], np.float32(1.0))
    np.testing.assert_array_equal(out[6][~mask], np.float32(0.0))


@pytest.mark.parametrize("policy,entry_name", [
    ("min", "warp_gather_masked"), ("max", "warp_gather_masked_max"),
])
def test_masked_regather_matches_reference(interpret_kernel, policy, entry_name):
    """The exact-final composition: run the default pass, restrict to its
    misses, and check the anchored re-gather's mask and data against the
    XLA mirror — the real three-pass banded stats chain, on CPU."""
    rng = np.random.default_rng(11)
    h, w = 64, 256
    planes = rng.normal(size=(h, 8, w)).astype(np.float32)
    planes[:, 6, :] = 0.0
    # two parallax bands (offsets -10 and +10) that one K=6 window can't span
    yy, xx = np.mgrid[0:h, 0:w]
    band = (xx % 2) == 0
    r = np.clip(yy + np.where(band, -10, 10), 0, h - 1).astype(np.int32)
    c = ((xx + rng.integers(-5, 6, size=(h, w))) % w).astype(np.int32)

    _, mask0 = wg.warp_gather_batched(
        jnp.asarray(planes)[None], jnp.asarray(r)[None], jnp.asarray(c)[None]
    )
    miss = ~np.asarray(mask0)[0]
    assert miss.mean() > 0.2  # the band scene defeats the single window

    entry = getattr(wg, entry_name)
    out, hit = entry(
        jnp.asarray(planes), jnp.asarray(r), jnp.asarray(c), jnp.asarray(miss)
    )
    out = np.asarray(out)
    hit = np.asarray(hit)

    ref_hit = np.asarray(
        wg.window_mask_reference(
            jnp.asarray(r), jnp.asarray(c), jnp.asarray(miss), row_policy=policy
        )
    )
    np.testing.assert_array_equal(hit, ref_hit)
    assert hit[miss].mean() > 0.4  # the anchored window peels one band

    direct = _direct(planes, r, c)
    ch = [0, 1, 2, 3, 4, 5, 7]
    np.testing.assert_array_equal(out[ch][:, hit], direct[ch][:, hit])


def test_kernel_moves_f32_denormals_bit_exactly(interpret_kernel):
    """The kernel DMAs and selects plane data as i32 bit patterns precisely
    because TPU float data movement flushes denormals (PERF.md lever 0);
    interpret mode pins the bit-exactness contract on the real kernel body,
    denormal f32 payloads included — genuine denormal gradient values exist
    on the coarse pyramid levels, and a flushed gradient silently drops the
    pixel's saliency (the round-3 corruption class). The retired packed
    4-channel layout used to carry this gate; the 8-channel layout needs it
    just as much."""
    rng = np.random.default_rng(7)
    h, w = 32, 256
    planes = rng.normal(size=(h, 8, w)).astype(np.float32)
    # plant genuine f32 denormals (zero exponent, nonzero mantissa) in the
    # gradient channels, plus the exact bit pattern 0x7 as a float
    planes[::3, 2, ::5] = np.float32(1e-42)
    planes[1::3, 3, ::4] = np.frombuffer(np.int32(7).tobytes(), np.float32)[0]
    planes[:, 6, :] = 0.0  # reserved flag slot
    # dr=1: row spread 3 fits the K=4 row window, keeping near-full coverage
    r, c = _warp_indices(9, h, w, dr=1, dc=10)

    out, mask = wg.warp_gather_batched(
        jnp.asarray(planes)[None], jnp.asarray(r)[None], jnp.asarray(c)[None]
    )
    out = np.asarray(out)[0]
    mask = np.asarray(mask)[0]
    assert mask.mean() > 0.9  # small offsets: nearly full coverage
    # at least one denormal must actually land in the covered set, or the
    # gate is vacuous
    data_ch = [0, 1, 2, 3, 4, 5, 7]
    direct = planes[r, :, c].transpose(2, 0, 1)
    covered_bits = direct[data_ch][:, mask].view(np.int32)
    assert ((covered_bits != 0) & (np.abs(covered_bits) < 0x00800000)).any()
    # bit-level equality (view as i32: NaN-safe, denormal-flush-sensitive)
    np.testing.assert_array_equal(
        out[data_ch][:, mask].view(np.int32), covered_bits
    )


def test_dual_anchored_pass_is_union_of_min_and_max(interpret_kernel):
    """warp_gather_batched_dual (one traversal, two windows per tile) must
    cover exactly the UNION of the standalone min- and max-anchored passes
    over the same active set, with identical data on every covered pixel —
    the equivalence that lets exact-final stats fuse its two banded
    re-gather passes into one kernel call."""
    rng = np.random.default_rng(17)
    h, w = 64, 256
    planes = rng.normal(size=(h, 8, w)).astype(np.float32)
    planes[:, 6, :] = 0.0
    yy, xx = np.mgrid[0:h, 0:w]
    band = (xx % 2) == 0  # two parallax bands one K=6 window can't span
    r = np.clip(yy + np.where(band, -10, 10), 0, h - 1).astype(np.int32)
    c = ((xx + rng.integers(-5, 6, size=(h, w))) % w).astype(np.int32)
    # active set = the default pass's misses, like the real composition
    _, mask0 = wg.warp_gather_batched(
        jnp.asarray(planes)[None], jnp.asarray(r)[None], jnp.asarray(c)[None]
    )
    miss = ~np.asarray(mask0)[0]
    assert miss.mean() > 0.2

    out_d, hit_d = wg.warp_gather_masked_dual(
        jnp.asarray(planes), jnp.asarray(r), jnp.asarray(c), jnp.asarray(miss)
    )
    out_min, hit_min = wg.warp_gather_masked(
        jnp.asarray(planes), jnp.asarray(r), jnp.asarray(c), jnp.asarray(miss)
    )
    out_max, hit_max = wg.warp_gather_masked_max(
        jnp.asarray(planes), jnp.asarray(r), jnp.asarray(c), jnp.asarray(miss)
    )
    out_d, hit_d = np.asarray(out_d), np.asarray(hit_d)
    hit_min, hit_max = np.asarray(hit_min), np.asarray(hit_max)

    np.testing.assert_array_equal(hit_d, hit_min | hit_max)
    assert hit_d[miss].mean() > 0.8  # the two anchors together span the bands

    direct = _direct(planes, r, c)
    ch = [0, 1, 2, 3, 4, 5, 7]
    np.testing.assert_array_equal(out_d[ch][:, hit_d], direct[ch][:, hit_d])
    # and agrees with the sequential passes where each covers
    np.testing.assert_array_equal(
        out_d[ch][:, hit_min], np.asarray(out_min)[ch][:, hit_min]
    )
    np.testing.assert_array_equal(
        out_d[ch][:, hit_max], np.asarray(out_max)[ch][:, hit_max]
    )


def test_exact_final_dual_matches_sequential_stats(interpret_kernel, monkeypatch):
    """ops/photoicp._exact_final_missed_stats (dual-anchored, the sole path
    since the sequential arm lost its final on-chip A/B in round 5) must
    reproduce the retired sequential two-pass composition's sums/counts on
    a realistic small spherical level. The sequential form — min-anchored
    pass, then a max-anchored pass over the post-min residue — is rebuilt
    here from the primitive masked gathers and substituted for the dual
    kernel, so both variants run the IDENTICAL downstream stats code
    (whenever the residue's extreme coincides with the full miss set's —
    every band-structured miss pattern — the two compositions cover
    identical pixels and the stats are EQUAL)."""
    from rgbd360_tpu.ops import photoicp as pi
    from rgbd360_tpu.ops import warp_gather as wg_mod
    from rgbd360_tpu.ops.sphere import sphere_xyz_lut

    rng = np.random.default_rng(23)
    h, w = 32, 128
    gray_s = rng.uniform(0.2, 0.8, size=(h, w)).astype(np.float32)
    gray_t = rng.uniform(0.2, 0.8, size=(h, w)).astype(np.float32)
    depth_s = rng.uniform(1.5, 3.5, size=(h, w)).astype(np.float32)
    depth_t = rng.uniform(1.5, 3.5, size=(h, w)).astype(np.float32)
    # strong gradients so saliency passes nearly everywhere
    g = lambda: rng.uniform(-0.5, 0.5, size=(h, w)).astype(np.float32)
    level = pi.LevelData(
        gray_src=jnp.asarray(gray_s), depth_src=jnp.asarray(depth_s),
        gray_trg=jnp.asarray(gray_t), depth_trg=jnp.asarray(depth_t),
        gray_trg_gx=jnp.asarray(g()), gray_trg_gy=jnp.asarray(g()),
        depth_trg_gx=jnp.asarray(g()), depth_trg_gy=jnp.asarray(g()),
    )
    packed = pi.pack_target_planes8(level)
    xyz, valid = sphere_xyz_lut(level.depth_src, pi.MIN_DEPTH, pi.MAX_DEPTH)
    # a large motion so the mean-centred windows genuinely miss bands
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0.25, -0.4, 0.55)

    real_dual = wg_mod.warp_gather_masked_dual

    # the retired sequential arm — the ONE shared reference definition
    # (tools/retired_ab.py), also used by tools/profile_stats_cost.py so the
    # test gate and the profiler can never drift apart
    from tools.retired_ab import sequential_dual as _seq_dual

    def sequential_dual(packed_in, r2d, c2d, miss):
        return _seq_dual(wg_mod, packed_in, r2d, c2d, miss)

    outs = {}
    for name, gather in (("seq", sequential_dual), ("dual", real_dual)):
        monkeypatch.setattr(wg_mod, "warp_gather_masked_dual", gather)
        outs[name] = [
            np.asarray(x)
            for x in pi._exact_final_missed_stats(
                level.gray_src.reshape(-1), packed, (h, w), xyz, valid,
                jnp.asarray(pose), pi.PHOTO_DEPTH,
            )
        ]
    seq, dual = outs["seq"], outs["dual"]
    assert seq[4] > 0  # the scene exercises the re-gather (n_extra > 0)
    for a, b, name in zip(
        seq, dual, ["photo_err2", "n_photo", "depth_err2", "n_depth", "n_extra"]
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=name)


def test_full_triple_anchored_pass_is_union_of_three(interpret_kernel):
    """warp_gather_masked_full (mean+min+max windows, one traversal) covers
    exactly the union of the three per-policy reference masks over the same
    active set — the single-pass full-coverage candidate."""
    rng = np.random.default_rng(29)
    h, w = 64, 256
    planes = rng.normal(size=(h, 8, w)).astype(np.float32)
    planes[:, 6, :] = 0.0
    yy, xx = np.mgrid[0:h, 0:w]
    band = (xx % 2) == 0
    r = np.clip(yy + np.where(band, -10, 10), 0, h - 1).astype(np.int32)
    c = ((xx + rng.integers(-5, 6, size=(h, w))) % w).astype(np.int32)
    act = np.ones((h, w), bool)

    out, hit = wg.warp_gather_masked_full(
        jnp.asarray(planes), jnp.asarray(r), jnp.asarray(c), jnp.asarray(act)
    )
    out, hit = np.asarray(out), np.asarray(hit)

    expect = np.zeros((h, w), bool)
    for policy in ("mean", "min", "max"):
        expect |= np.asarray(
            wg.window_mask_reference(
                jnp.asarray(r), jnp.asarray(c), jnp.asarray(act), row_policy=policy
            )
        )
    np.testing.assert_array_equal(hit, expect)
    assert hit.mean() > 0.9  # three anchors span both bands

    direct = _direct(planes, r, c)
    ch = [0, 1, 2, 3, 4, 5, 7]
    np.testing.assert_array_equal(out[ch][:, hit], direct[ch][:, hit])


@pytest.mark.parametrize("variant", ["plain", "two_pass"])
def test_fused_sweep_kernel_branch_matches_xla_branch(
    interpret_kernel, monkeypatch, variant
):
    """Drive fused_sweep_sphere's KERNEL branch end-to-end on CPU (interpret
    mode + forced routing) against the XLA branch at the same pose: packers,
    i32 movement, window compositions and the sweep math all execute as the
    chip would run them. At tracking-scale motion the windows cover ~all
    visible pixels, so term counts must match exactly and the f32 sums
    tightly (the kernel layout carries f32 gradients vs the XLA layout's
    packed f16 — only sub-saliency-threshold noise differs)."""
    from rgbd360_tpu.ops import photoicp as pi
    from rgbd360_tpu.ops.sphere import sphere_xyz_lut

    rng = np.random.default_rng(31)
    h, w = 32, 128
    mk = lambda lo, hi: rng.uniform(lo, hi, size=(h, w)).astype(np.float32)
    g = lambda: rng.uniform(0.05, 0.5, size=(h, w)).astype(np.float32) * rng.choice(
        [-1.0, 1.0], size=(h, w)
    ).astype(np.float32)
    level = pi.LevelData(
        gray_src=jnp.asarray(mk(0.2, 0.8)), depth_src=jnp.asarray(mk(1.5, 3.5)),
        gray_trg=jnp.asarray(mk(0.2, 0.8)), depth_trg=jnp.asarray(mk(1.5, 3.5)),
        gray_trg_gx=jnp.asarray(g()), gray_trg_gy=jnp.asarray(g()),
        depth_trg_gx=jnp.asarray(g()), depth_trg_gy=jnp.asarray(g()),
    )
    xyz, valid = sphere_xyz_lut(level.depth_src, pi.MIN_DEPTH, pi.MAX_DEPTH)
    gray_flat = level.gray_src.reshape(-1)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0.01, -0.02, 0.03)  # tracking-scale: near-full coverage

    two_pass = variant != "plain"
    xla_out = [
        np.asarray(x)
        for x in pi.fused_sweep_sphere(
            gray_flat, pi.pack_target_channels(level), (h, w), xyz, valid,
            jnp.asarray(pose), pi.PHOTO_DEPTH, 0,
        )
    ]
    monkeypatch.setattr(pi, "_use_warp_kernel", lambda shape: True)
    kern_out = [
        np.asarray(x)
        for x in pi.fused_sweep_sphere(
            gray_flat, pi.pack_target_planes8(level), (h, w), xyz, valid,
            jnp.asarray(pose), pi.PHOTO_DEPTH, 0,
            two_pass=two_pass,
        )
    ]
    # state = (error, H, g, sso, pe2, n_photo, de2, n_depth)
    names = ["error", "H", "g", "sso", "pe2", "n_photo", "de2", "n_depth"]
    for a, b, name in zip(xla_out, kern_out, names):
        if name in ("n_photo", "n_depth"):
            assert int(a) == int(b), (name, a, b)
        else:
            # gradient values ride as f16 pairs in the XLA layout but f32 in
            # the kernel layout (~0.05% per term); near-cancelling H/g
            # entries amplify that, so tolerate relative to the MATRIX scale
            scale = max(float(np.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                b, a, rtol=0, atol=2e-3 * scale, err_msg=name
            )
    assert int(kern_out[5]) > 1000  # the scene genuinely contributes terms


def test_nonaligned_wrap_width_fills_former_pad_band(interpret_kernel):
    """Non-128-aligned wrap widths above 2*PC (the 960-wide L1 pyramid
    level is the production case) used to leave a zero-pad band after the
    256-column halo; a max-anchored window on a seam-straddling tile could
    gather that band WITH the hit flag set — silent zero data — and a
    later review guard turned that into a hard ValueError, killing L1 on
    the kernel path entirely. The halo now widens to fill the aligned
    width with genuine wrapped columns: this scene drives remapped
    coordinates squarely into the former pad band [w+256, roundup) and
    pins mask == XLA mirror and data == direct indexing."""
    rng = np.random.default_rng(23)
    h, w = 16, 576  # 576 % 128 = 64 and 576 > 2*PC: the refused combination
    planes = rng.normal(size=(h, 8, w)).astype(np.float32)
    planes[:, 6, :] = 0.0
    yy, xx = np.mgrid[0:h, 0:w]
    # every tile straddles the seam: even output columns target c in
    # [256, 320) — remapped to [832, 896), the former zero-pad band
    # (halo used to end at 576+256=832, padded width 896) — odd columns
    # target the high edge so spread > w//2 triggers the remap
    c = np.where(
        (xx % 2) == 0,
        256 + (xx // 2) % 64,
        512 + xx % 64,
    ).astype(np.int32)
    r = np.clip(yy + rng.integers(-2, 3, size=(h, w)), 0, h - 1).astype(np.int32)

    direct = _direct(planes, r, c)
    ch = [0, 1, 2, 3, 4, 5, 7]

    # default (mean-anchored) pass: the alignment sweep's L1 call
    out, mask = wg.warp_gather_batched(
        jnp.asarray(planes)[None], jnp.asarray(r)[None], jnp.asarray(c)[None]
    )
    out, mask = np.asarray(out)[0], np.asarray(mask)[0]
    ref_mask = np.asarray(
        wg.window_mask_reference(jnp.asarray(r), jnp.asarray(c))
    )
    np.testing.assert_array_equal(mask, ref_mask)
    np.testing.assert_array_equal(out[ch][:, mask], direct[ch][:, mask])

    # max-anchored re-gather: the pass whose window actually reaches the
    # former pad band
    out_m, hit = wg.warp_gather_masked_max(
        jnp.asarray(planes), jnp.asarray(r), jnp.asarray(c),
        jnp.ones((h, w), bool),
    )
    out_m, hit = np.asarray(out_m), np.asarray(hit)
    ref_hit = np.asarray(
        wg.window_mask_reference(
            jnp.asarray(r), jnp.asarray(c),
            jnp.ones((h, w), bool), row_policy="max",
        )
    )
    np.testing.assert_array_equal(hit, ref_hit)
    # the max-anchored window must cover the remapped band — that's the
    # regression surface; if nothing lands there the test is vacuous
    # constant floor: measured band coverage is NOT linear in K (K=6 -> 0.52,
    # K=4 -> 0.47), so a K-scaled threshold would false-fail larger swept K
    # values; anything well above zero proves the max-anchored window
    # reaches the remapped band (non-vacuous)
    assert hit[c >= 256][c[c >= 256] < 320].mean() > 0.3
    np.testing.assert_array_equal(out_m[ch][:, hit], direct[ch][:, hit])
    # covered data is never the pad band's zeros
    assert np.abs(out_m[0][hit]).min() > 0.0
