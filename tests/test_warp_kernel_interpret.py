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
    yield
    pl.pallas_call = orig
    wg.warp_gather_batched.clear_cache()


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


def test_packed_i32_layout_is_bit_exact_incl_denormals(interpret_kernel):
    """The packed f16-pair layout moves as i32 bit patterns precisely because
    TPU float data movement flushes denormals; interpret mode lets the CPU
    suite pin the bit-exactness contract on the real kernel body, denormal
    patterns included."""
    rng = np.random.default_rng(7)
    h, w = 32, 256
    packed = rng.integers(-(2**31), 2**31, size=(h, 4, w), dtype=np.int64).astype(
        np.int32
    )
    # plant f32-denormal bit patterns (tiny nonzero mantissas, zero exponent)
    packed[::3, 0, ::5] = 0x00000007
    packed[:, 1, :] &= 0x0000FFFF  # channel 1 high half is the flag slot
    r, c = _warp_indices(9, h, w, dr=2, dc=10)

    out, mask = wg.warp_gather_batched(
        jnp.asarray(packed)[None], jnp.asarray(r)[None], jnp.asarray(c)[None]
    )
    out = np.asarray(out)[0]
    mask = np.asarray(mask)[0]
    assert mask.mean() > 0.9  # small offsets: nearly full coverage

    direct = packed[r, :, c].transpose(2, 0, 1)
    np.testing.assert_array_equal(out[[0, 2, 3]][:, mask], direct[[0, 2, 3]][:, mask])
    # channel 1: low half is data, high half carries the f16-1.0 hit flag
    np.testing.assert_array_equal(
        out[1][mask] & 0xFFFF, direct[1][mask] & 0xFFFF
    )
    np.testing.assert_array_equal(
        (out[1][mask] >> 16) & 0xFFFF, np.int32(0x3C00)
    )
