"""Mosaic block-warp gather — the TPU kernel for the dense aligner's hot
gather (see PERF.md for the measured cost landscape that motivates it).

XLA's gather prices ~5.3 cycles per element; Mosaic's within-tile
dynamic_gather moves a full (8,128) tile in ~29 cycles. This kernel exploits
the warp's spatial coherence to turn the global gather into within-tile
gathers (measured ~1.1 ms for a full 1920x320 x 8-channel sweep vs ~3.5 ms
for the XLA packed-row take):

  * source pixels are processed in compact (8,128) image tiles;
  * the target channels live in HBM as (H, 8, W) f32 planes (channel is the
    sublane axis, so one dynamic_gather fetches all channels of 128 pixels);
  * each tile DMAs a (PR, 8, PC) window whose origin is the tile's minimum
    target coordinate (rows unaligned — the leading axis is untiled; columns
    aligned to 128);
  * each output row i selects its values from a K-row window starting at
    that row's own minimum target row: K x 2 dynamic_gathers + masked
    accumulation per row.

The theta wrap seam (reference RegisterPhotoICP.h:2678-2687 relies on
atan2+pi landing in range) is handled with a PC-column halo: the target
planes are extended with a copy of their first PC columns, and a tile whose
targets straddle the seam (spread > W/2) remaps targets c < W/2 to c + W so
one contiguous window covers both sides. Pixels whose target still falls
outside the window (strong parallax) are flagged in the returned mask and
treated as invisible by the caller — a documented deviation from the
reference that shrinks quadratically with inter-frame motion. The caller
feeds identity coordinates for invalid pixels so they don't distort the
window statistics.

Batching: pairs batch through an explicit leading grid axis (vmap routes
here via jax.custom_batching — Pallas ANY-space operands don't support
implicit batch dims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# channel sublanes: [gray, depth, ggx, ggy, dgx, dgy, reserved, 0] — the
# caller packs zeros in channels 6-7 (pack_target_planes8); the pipelined
# kernel returns the in-window flag in channel 6 of its output so no
# separate full-resolution mask array has to round-trip HBM
C = 8
BR, BC = 8, 128  # source tile (the window-placement granule)
# Window constants, env-overridable for on-chip sweeps
# (tools/sweep_window_constants.py runs one subprocess per configuration —
# they are read once at import and baked into every kernel/mirror trace).
# Defaults are the measured optimum: PR=14 (round 2), VR=2 (round 3),
# K=4 (round 4 on-chip sweep at the faithful landscape: 53.71 vs 52.79
# pairs/s over K=6 at batch 4; K=8 52.47 — the round-2 K=6 optimum was
# measured on the pre-fix flushed landscape).
import os as _os

PR = int(_os.environ.get("RGBD360_WARP_PR", "14"))  # target window rows
# Vertical tiles gathered per grid step: each step processes VR stacked
# (8,128) tiles through VR independent windows (origins stay per-8-row
# tile, so window/coverage semantics are IDENTICAL to one-tile steps —
# window_mask_reference needs no VR awareness). Fewer grid steps amortize
# the per-step fixed costs (origin loads, pipeline control, DMA issue):
# measured 2.82 -> 2.37 ms per batch-4 L0 gather at VR=2.
VR = int(_os.environ.get("RGBD360_WARP_VR", "2"))
K = int(_os.environ.get("RGBD360_WARP_K", "4"))  # per-output-row row window
# target window columns (128-aligned origin + 128 spread budget)
PC = int(_os.environ.get("RGBD360_WARP_PC", "256"))
# Mosaic dynamic_gather is native only at 128 lanes: the per-window gather
# is an explicit PC//128-subtile select, so non-128-multiple widths lower
# to an opaque Mosaic error deep in the first kernel trace. Fail loudly at
# import instead (an invalid sweep point burned a 1200 s on-chip timeout).
if PC <= 0 or PC % BC != 0:
    raise ValueError(f"RGBD360_WARP_PC={PC} must be a positive multiple of {BC}")
if PR <= 0 or VR <= 0 or K <= 0:
    raise ValueError(f"window constants must be positive: PR={PR} VR={VR} K={K}")
if K > PR:
    # window-origin clips are jnp.clip(lo, 0, PR - K): K > PR makes the
    # bound negative and the kernel gathers rows outside the window's
    # scratch slot while still flagging them as hits — silently wrong poses
    raise ValueError(f"RGBD360_WARP_K={K} must be <= RGBD360_WARP_PR={PR}")


def _kernel(r_ref, c_ref, planes_hbm, out_ref, mask_ref, patch, sem, *, w_real):
    b = pl.program_id(0)
    r = r_ref[0]  # (8,128) i32 target rows
    c = c_ref[0]
    hp = planes_hbm.shape[1]
    wp_ext = planes_hbm.shape[3]  # true width + PC halo, 128-padded

    # theta-wrap: targets of one coherent source tile only spread beyond
    # W/2 when they straddle the seam; remap the low side into the halo so
    # one contiguous window covers both sides
    straddle = (jnp.max(c) - jnp.min(c)) > (w_real // 2)
    c = jnp.where(straddle & (c < w_real // 2), c + w_real, c)

    r0 = jnp.clip(jnp.min(r), 0, hp - PR)
    c0 = pl.multiple_of((jnp.clip(jnp.min(c), 0, wp_ext - PC) // 128) * 128, 128)
    dma = pltpu.make_async_copy(
        planes_hbm.at[b, pl.ds(r0, PR), :, pl.ds(c0, PC)], patch, sem
    )
    dma.start()

    lr = r - r0
    lc = c - c0
    lc_ok = (lc >= 0) & (lc < PC)
    lcc = jnp.clip(lc, 0, PC - 1)
    lcm = jnp.remainder(lcc, 128)
    sub_idx = lcc // 128  # which 128-lane column subtile

    # per-output-row window base, centred on the row mean (a min would let a
    # single near pixel drag the window off the rest of the row)
    lr_f = lr.astype(jnp.float32)
    lc_okf = lc_ok.astype(jnp.float32)
    row_n = jnp.maximum(jnp.sum(lc_okf, axis=1), 1.0)
    row_mean = jnp.sum(jnp.where(lc_ok, lr_f, 0.0), axis=1) / row_n
    lo_rows = (row_mean - (K - 1) / 2 + 0.5).astype(jnp.int32)  # (8,)

    dma.wait()

    hit_rows = []
    for i in range(BR):
        lo_i = jnp.clip(lo_rows[i], 0, PR - K)
        idx = jnp.broadcast_to(lcm[i : i + 1, :], (C, BC))
        hit_i = jnp.zeros((1, BC), jnp.float32)
        acc = jnp.zeros((C, BC), jnp.float32)
        for kk in range(K):
            plane = patch[lo_i + kk]  # (C, PC), dynamic untiled leading index
            val = jnp.zeros((C, BC), jnp.float32)
            for sb in range(PC // 128):
                g = jnp.take_along_axis(plane[:, sb * 128 : (sb + 1) * 128], idx, axis=1)
                val = jnp.where(sub_idx[i : i + 1, :] == sb, g, val)
            sel = (lr[i : i + 1, :] == lo_i + kk) & lc_ok[i : i + 1, :]  # (1, BC)
            acc = acc + jnp.where(sel, val, 0.0)
            hit_i = jnp.maximum(hit_i, sel.astype(jnp.float32))
        out_ref[0, :, i, :] = acc
        hit_rows.append(hit_i)
    # f32 mask rows: Mosaic cannot concatenate i1 vectors
    mask_ref[0] = jnp.concatenate(hit_rows, axis=0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _wrap_halo(wt: int) -> int:
    """Pad-band-free theta-wrap halo width (single source of truth — the
    kernel entries and window_mask_reference's wp_ext must agree on this
    rule or the XLA mask mirror silently desynchronizes from the kernel).

    Replicating the first `halo` true columns after column wt lets
    seam-straddling tiles gather through one contiguous window. For
    wt <= 2*PC remapped coordinates stay below wt + min(PC, wt) and the
    BC-alignment pad band is unreachable; for wt > 2*PC (where the straddle
    remap can reach past wt + PC) the halo is widened to exactly fill the
    BC-aligned padded width with genuine wrapped data, so a max-anchored
    window at a non-BC-aligned width (the 960-wide L1 pyramid level) can
    never land on zero padding (halo <= PC + BC - 1 < 2*PC <= wt, so one
    slice of the true columns suffices)."""
    halo = min(PC, wt)
    if wt > 2 * PC:
        halo = max(_round_up(wt + PC, BC), PC + BC) - wt
    return halo


def _prep_operands(planes, r_idx, c_idx, active, wrap, row_granule):
    """Shared operand prologue for the batched kernel entries: append the
    wrap halo, zero-pad the planes to the aligned (htp, wtp) footprint, and
    edge-replicate the index arrays to the (row_granule, BC) output grid
    (edge mode so padded entries can't fake a seam straddle or drag a tile's
    window origin away from its real targets; `active` pads with zeros so
    pad pixels never participate). Returns the padded operands plus the
    static geometry tuple."""
    bsz, ht, cdim, wt = planes.shape
    _, ho, wo = r_idx.shape
    # 8-channel f32 planes only (pack_target_planes8): the packed f16-pair
    # 4-channel layout was retired in round 4 — measured loser (68.3 vs 72.6
    # pairs/s, PERF.md lever 0b), and its i32 flag-slot convention was a
    # second untested variant of this safety-critical call site
    assert cdim == 8, cdim
    assert planes.dtype == jnp.float32, planes.dtype
    active = active.astype(jnp.int32)
    hop = _round_up(ho, row_granule)
    wop = _round_up(wo, BC)
    htp = max(ht, PR)
    if wrap:
        planes = jnp.concatenate([planes, planes[..., : _wrap_halo(wt)]], axis=3)
        w_eff = wt  # straddle threshold = half the true width
    else:
        w_eff = 1 << 22  # spread can never exceed this: remap disabled
    wtp = max(_round_up(planes.shape[3], BC), PC + BC)
    planes = jnp.pad(
        planes, ((0, 0), (0, htp - ht), (0, 0), (0, wtp - planes.shape[3]))
    )
    if (hop, wop) != (ho, wo):
        r_idx = jnp.pad(r_idx, ((0, 0), (0, hop - ho), (0, wop - wo)), mode="edge")
        c_idx = jnp.pad(c_idx, ((0, 0), (0, hop - ho), (0, wop - wo)), mode="edge")
        active = jnp.pad(active, ((0, 0), (0, hop - ho), (0, wop - wo)))
    return planes, r_idx, c_idx, active, (bsz, cdim, ho, wo, hop, wop, htp, w_eff)


# Double-buffer the per-tile window DMA across grid steps (PERF.md lever #1:
# the kernel is DMA/overhead-bound). Window origins are precomputed in XLA
# (one fused reduction) and scalar-prefetched so grid step t can start the
# DMA for step t+1 into the alternate buffer before computing its own tile.
PIPELINE_KERNEL = True


_BIG = 1 << 24  # sentinel for masked reductions (far above any coordinate)


def _tile_origins(r_idx, c_idx, active, w_real, hp, wp_ext, anchor="min"):
    """Per-(8,128)-tile window origins, exactly the kernel's rule: remap
    seam-straddling targets into the halo, anchor, clip, 128-align the
    column origin; only `active` pixels participate (re-gather passes
    restrict to pixels earlier passes missed). anchor: "min" places the
    window at the lowest active target (row and column), "max" at the
    highest — the two ends let repeated passes peel parallax bands that a
    single window cannot span. One fused pass over the index arrays.
    Returns (B, nr, nc) i32 r0s/c0s."""
    bsz, hpad, wpad = r_idx.shape
    nr, nc = hpad // BR, wpad // BC
    r_t = r_idx.reshape(bsz, nr, BR, nc, BC)
    c_t = c_idx.reshape(bsz, nr, BR, nc, BC)
    a_t = active.reshape(bsz, nr, BR, nc, BC)
    c_hi = jnp.where(a_t, c_t, -_BIG)
    c_lo = jnp.where(a_t, c_t, _BIG)
    cmin = jnp.min(c_lo, axis=(2, 4))
    cmax = jnp.max(c_hi, axis=(2, 4))
    straddle = (cmax - cmin) > (w_real // 2)
    c_remap = jnp.where(
        a_t, c_t + jnp.where(c_t < w_real // 2, w_real, 0), _BIG
    )
    if anchor == "min":
        # min over the remapped coordinates without materializing them: the
        # low side shifts by +W, so min(c + W*[c < W/2]) is the remapped min
        sel_c = jnp.where(straddle, jnp.min(c_remap, axis=(2, 4)), cmin)
        c0 = jnp.clip(sel_c, 0, wp_ext - PC) // 128 * 128
        r0 = jnp.clip(jnp.min(jnp.where(a_t, r_t, _BIG), axis=(2, 4)), 0, hp - PR)
    else:  # "max": window END covers the highest active target
        c_remap_hi = jnp.where(
            a_t, c_t + jnp.where(c_t < w_real // 2, w_real, 0), -_BIG
        )
        sel_c = jnp.where(straddle, jnp.max(c_remap_hi, axis=(2, 4)), cmax)
        c0 = jnp.clip(sel_c // 128 * 128 - (PC - 128), 0, wp_ext - PC)
        r0 = jnp.clip(
            jnp.max(jnp.where(a_t, r_t, -_BIG), axis=(2, 4)) - (PR - 1), 0, hp - PR
        )
    return r0.astype(jnp.int32), c0.astype(jnp.int32)


def _kernel_pipelined(
    r0s, c0s, r_ref, c_ref, a_ref, planes_hbm, out_ref, patch, sems,
    *, w_real, row_policy="mean"
):
    """Double-buffered variant of _kernel: window origins arrive via scalar
    prefetch; each grid step processes VR stacked (8,128) tiles through VR
    independent windows (origins, straddle remap, and row windows stay
    per-8-row tile — identical coverage semantics to single-tile steps) and
    starts the next step's VR window DMAs into the alternate half of `patch`
    ((2*VR*PR, cdim, PC)) before gathering its own tiles. The in-window flag
    rides in channel 6 of the output — a reserved zero slot of the
    8-channel layout — saving a separate full-resolution mask array's HBM
    round trip."""
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb, nr, nc = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
    linear = (b * nr + i) * nc + j
    total = nb * nr * nc
    slot = jax.lax.rem(linear, 2)
    cdim = planes_hbm.shape[2]

    def start_dma(lin, slot_):
        bn = lin // (nr * nc)
        rem = jax.lax.rem(lin, nr * nc)
        in_, jn = rem // nc, jax.lax.rem(rem, nc)
        for v in range(VR):
            r0n = r0s[bn, in_ * VR + v, jn]
            c0n = pl.multiple_of(c0s[bn, in_ * VR + v, jn], 128)
            pltpu.make_async_copy(
                planes_hbm.at[bn, pl.ds(r0n, PR), :, pl.ds(c0n, PC)],
                patch.at[pl.ds((slot_ * VR + v) * PR, PR)],
                sems.at[slot_ * VR + v],
            ).start()

    @pl.when(linear == 0)
    def _():
        start_dma(linear, slot)

    @pl.when(linear + 1 < total)
    def _():
        start_dma(linear + 1, jax.lax.rem(linear + 1, 2))

    for v in range(VR):
        r = r_ref[0, v * BR : (v + 1) * BR]  # (8,128) i32 target rows
        c = c_ref[0, v * BR : (v + 1) * BR]
        act = a_ref[0, v * BR : (v + 1) * BR] != 0  # pixels in this pass
        c_hi = jnp.where(act, c, -_BIG)
        c_lo = jnp.where(act, c, _BIG)
        straddle = (jnp.max(c_hi) - jnp.min(c_lo)) > (w_real // 2)
        c = jnp.where(straddle & (c < w_real // 2), c + w_real, c)

        r0 = r0s[b, i * VR + v, j]
        c0 = pl.multiple_of(c0s[b, i * VR + v, j], 128)
        lr = r - r0
        lc = c - c0
        lc_ok = (lc >= 0) & (lc < PC) & act
        lcc = jnp.clip(lc, 0, PC - 1)
        lcm = jnp.remainder(lcc, 128)
        sub_idx = lcc // 128
        if row_policy == "mean":
            # centre each output row's K-window on its mean target row (best
            # single-window coverage for unimodal tiles)
            lr_f = lr.astype(jnp.float32)
            lc_okf = lc_ok.astype(jnp.float32)
            row_n = jnp.maximum(jnp.sum(lc_okf, axis=1), 1.0)
            row_mean = jnp.sum(jnp.where(lc_ok, lr_f, 0.0), axis=1) / row_n
            lo_rows = (row_mean - (K - 1) / 2 + 0.5).astype(jnp.int32)  # (8,)
        elif row_policy == "min":
            # start at the lowest active target row — a re-gather pass
            # provably covers the lowest remaining parallax band
            lo_rows = jnp.min(jnp.where(lc_ok, lr, _BIG), axis=1).astype(jnp.int32)
        else:  # "max": end at the highest active target row (peel the top band)
            lo_rows = (
                jnp.max(jnp.where(lc_ok, lr, -_BIG), axis=1) - (K - 1)
            ).astype(jnp.int32)

        # wait for this tile's window (started at the previous grid step;
        # waiting per v lets tile v+1's DMA overlap tile v's gathers)
        pltpu.make_async_copy(
            planes_hbm.at[b, pl.ds(r0, PR), :, pl.ds(c0, PC)],
            patch.at[pl.ds((slot * VR + v) * PR, PR)],
            sems.at[slot * VR + v],
        ).wait()

        # Data moves happen in i32: TPU float ops flush denormals, which
        # would corrupt bit-packed f16 pairs (and genuine denormal f32
        # values) on the select-accumulate below. Integer select/add is
        # bit-exact.
        base = (slot * VR + v) * PR
        for row in range(BR):
            lo_i = jnp.clip(lo_rows[row], 0, PR - K)
            idx = jnp.broadcast_to(lcm[row : row + 1, :], (cdim, BC))
            hit_i = jnp.zeros((1, BC), jnp.int32)
            acc = jnp.zeros((cdim, BC), jnp.int32)
            for kk in range(K):
                plane = patch[base + lo_i + kk]  # (cdim, PC) i32
                val = jnp.zeros((cdim, BC), jnp.int32)
                for sb in range(PC // 128):
                    g = jnp.take_along_axis(plane[:, sb * 128 : (sb + 1) * 128], idx, axis=1)
                    val = jnp.where(sub_idx[row : row + 1, :] == sb, g, val)
                sel = (lr[row : row + 1, :] == lo_i + kk) & lc_ok[row : row + 1, :]
                acc = acc + jnp.where(sel, val, 0)
                hit_i = hit_i | sel.astype(jnp.int32)
            # channel 6 is zero in the packed planes: carry the hit flag
            # there as the f32-1.0 bit pattern
            flag = jnp.where(hit_i > 0, jnp.int32(0x3F800000), jnp.int32(0))
            acc = jnp.concatenate([acc[:6], flag, acc[7:]], axis=0)
            out_ref[0, :, v * BR + row, :] = acc


def _kernel_pipelined_multi(
    r0s, c0s, any_t, r_ref, c_ref, a_ref, planes_hbm, out_ref, patch, sems,
    *, w_real, anchors, slot_of
):
    """Multi-window variant of _kernel_pipelined: each tile DMAs one window
    PER UNIQUE-ORIGIN ANCHOR (origins arrive stacked as (U, B, nr, nc)
    scalar-prefetch arrays) and gathers every active pixel from the first
    anchor that covers it (values agree wherever windows overlap: same
    source planes).  One grid traversal replaces the sequential masked
    passes — one out-array HBM write, no XLA-side where-merges.  anchors is a static tuple drawn from
    {"mean", "min", "max"}; ("min", "max") fuses the exact-final banded
    re-gather, ("mean", "min", "max") is a full-coverage single pass.
    Coverage == the UNION of the standalone per-anchor passes over the same
    active set (window_mask_reference per policy) — gated in interpret mode
    by tests/test_warp_kernel_interpret.py.

    Empty-tile skip: masked active sets are sparse (the exact-final miss set
    concentrates in parallax bands), so a tile with NO active pixel — which
    would contribute all-zero acc/hit anyway — skips its window DMAs and
    gathers entirely and just writes zeros (any_t is the per-tile
    any-active flag, scalar-prefetched; start/wait consult the same flag so
    every started DMA is waited exactly once).

    Anchors with identical window origins ("mean" and "min" both use
    min-anchored windows) share one DMA'd patch slot: r0s/c0s are stacked
    per UNIQUE window and the static slot_of tuple maps each anchor to its
    slot — on a DMA/issue-bound kernel, transferring the ("mean","min")
    window twice would erode exactly the traffic the fusion exists to
    save."""
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb, nr, nc = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
    linear = (b * nr + i) * nc + j
    total = nb * nr * nc
    slot = jax.lax.rem(linear, 2)
    cdim = planes_hbm.shape[2]
    U = r0s.shape[0]  # unique windows (<= len(anchors))

    def start_dma(lin, slot_):
        bn = lin // (nr * nc)
        rem = jax.lax.rem(lin, nr * nc)
        in_, jn = rem // nc, jax.lax.rem(rem, nc)
        for v in range(VR):
            @pl.when(any_t[bn, in_ * VR + v, jn] != 0)
            def _():
                for which in range(U):
                    r0n = r0s[which, bn, in_ * VR + v, jn]
                    c0n = pl.multiple_of(c0s[which, bn, in_ * VR + v, jn], 128)
                    pltpu.make_async_copy(
                        planes_hbm.at[bn, pl.ds(r0n, PR), :, pl.ds(c0n, PC)],
                        patch.at[pl.ds(((slot_ * VR + v) * U + which) * PR, PR)],
                        sems.at[(slot_ * VR + v) * U + which],
                    ).start()

    @pl.when(linear == 0)
    def _():
        start_dma(linear, slot)

    @pl.when(linear + 1 < total)
    def _():
        start_dma(linear + 1, jax.lax.rem(linear + 1, 2))

    for v in range(VR):
        tile_active = any_t[b, i * VR + v, j] != 0

        @pl.when(jnp.logical_not(tile_active))
        def _(v=v):
            zero = jnp.zeros((cdim, BC), jnp.int32)
            for row in range(BR):
                out_ref[0, :, v * BR + row, :] = zero

        @pl.when(tile_active)
        def _(v=v):
            _gather_tile(
                v, r0s, c0s, r_ref, c_ref, a_ref, planes_hbm, out_ref, patch,
                sems, b, i, j, slot, cdim, w_real, anchors, slot_of,
            )


def _gather_tile(
    v, r0s, c0s, r_ref, c_ref, a_ref, planes_hbm, out_ref, patch, sems,
    b, i, j, slot, cdim, w_real, anchors, slot_of,
):
    """Body of one ACTIVE tile of _kernel_pipelined_multi: wait for its
    unique windows, gather each active pixel from the first anchor covering
    it, write acc + hit flag."""
    U = r0s.shape[0]
    r = r_ref[0, v * BR : (v + 1) * BR]
    c = c_ref[0, v * BR : (v + 1) * BR]
    act = a_ref[0, v * BR : (v + 1) * BR] != 0
    c_hi = jnp.where(act, c, -_BIG)
    c_lo = jnp.where(act, c, _BIG)
    straddle = (jnp.max(c_hi) - jnp.min(c_lo)) > (w_real // 2)
    c = jnp.where(straddle & (c < w_real // 2), c + w_real, c)

    for u in range(U):
        pltpu.make_async_copy(
            planes_hbm.at[
                b,
                pl.ds(r0s[u, b, i * VR + v, j], PR),
                :,
                pl.ds(pl.multiple_of(c0s[u, b, i * VR + v, j], 128), PC),
            ],
            patch.at[pl.ds(((slot * VR + v) * U + u) * PR, PR)],
            sems.at[(slot * VR + v) * U + u],
        ).wait()

    accs = []
    hits = []
    for which, anchor in enumerate(anchors):
        u = slot_of[which]
        r0 = r0s[u, b, i * VR + v, j]
        c0 = pl.multiple_of(c0s[u, b, i * VR + v, j], 128)
        lr = r - r0
        lc = c - c0
        lc_ok = (lc >= 0) & (lc < PC) & act
        lcc = jnp.clip(lc, 0, PC - 1)
        lcm = jnp.remainder(lcc, 128)
        sub_idx = lcc // 128
        if anchor == "mean":  # centre on each row's mean target row
            lr_f = lr.astype(jnp.float32)
            lc_okf = lc_ok.astype(jnp.float32)
            row_n = jnp.maximum(jnp.sum(lc_okf, axis=1), 1.0)
            row_mean = jnp.sum(jnp.where(lc_ok, lr_f, 0.0), axis=1) / row_n
            lo_rows = (row_mean - (K - 1) / 2 + 0.5).astype(jnp.int32)
        elif anchor == "min":  # cover the lowest active band
            lo_rows = jnp.min(jnp.where(lc_ok, lr, _BIG), axis=1).astype(
                jnp.int32
            )
        else:  # "max": cover the highest active band
            lo_rows = (
                jnp.max(jnp.where(lc_ok, lr, -_BIG), axis=1) - (K - 1)
            ).astype(jnp.int32)

        base = ((slot * VR + v) * U + u) * PR
        for row in range(BR):
            lo_i = jnp.clip(lo_rows[row], 0, PR - K)
            idx = jnp.broadcast_to(lcm[row : row + 1, :], (cdim, BC))
            hit_i = jnp.zeros((1, BC), jnp.int32)
            acc = jnp.zeros((cdim, BC), jnp.int32)
            for kk in range(K):
                plane = patch[base + lo_i + kk]
                val = jnp.zeros((cdim, BC), jnp.int32)
                for sb in range(PC // 128):
                    g = jnp.take_along_axis(
                        plane[:, sb * 128 : (sb + 1) * 128], idx, axis=1
                    )
                    val = jnp.where(sub_idx[row : row + 1, :] == sb, g, val)
                sel = (lr[row : row + 1, :] == lo_i + kk) & lc_ok[
                    row : row + 1, :
                ]
                acc = acc + jnp.where(sel, val, 0)
                hit_i = hit_i | sel.astype(jnp.int32)
            if which == 0:
                accs.append(acc)
                hits.append(hit_i)
            else:
                # a later anchor contributes only where every earlier one
                # missed — values agree where windows overlap, but the sum
                # must not double-count
                covered = hits[row] > 0
                accs[row] = accs[row] + jnp.where(
                    (hit_i > 0) & ~covered, acc, 0
                )
                hits[row] = hits[row] | hit_i

    for row in range(BR):
        acc, hit_i = accs[row], hits[row]
        flag = jnp.where(hit_i > 0, jnp.int32(0x3F800000), jnp.int32(0))
        acc = jnp.concatenate([acc[:6], flag, acc[7:]], axis=0)
        out_ref[0, :, v * BR + row, :] = acc


@functools.partial(jax.jit, static_argnames=("wrap", "anchors"))
def warp_gather_batched_multi(
    planes: jnp.ndarray,
    r_idx: jnp.ndarray,
    c_idx: jnp.ndarray,
    active: jnp.ndarray,
    wrap: bool = True,
    anchors: tuple = ("min", "max"),
):
    """One-pass multi-anchored masked gather: covers active pixels reachable
    by ANY of the per-anchor windows of their tile (the union of the
    corresponding standalone passes over the same active set).  Same
    operand/return contract as warp_gather_batched."""
    planes, r_idx, c_idx, active, (
        bsz, cdim, ho, wo, hop, wop, htp, w_eff,
    ) = _prep_operands(planes, r_idx, c_idx, active, wrap, BR * VR)

    planes_bits = (
        planes
        if planes.dtype == jnp.int32
        else jax.lax.bitcast_convert_type(planes, jnp.int32)
    )
    # "mean" row policy uses min-anchored DMA windows, like
    # warp_gather_batched's default pass — so ("mean", "min") share one
    # window; dedupe by origin kind so each unique window DMAs once
    # (slot_of maps anchor index -> unique-window slot, static).
    origin_kind = ["max" if a == "max" else "min" for a in anchors]
    uniq = list(dict.fromkeys(origin_kind))
    slot_of = tuple(uniq.index(k) for k in origin_kind)
    origins = [
        _tile_origins(
            r_idx, c_idx, active != 0, w_eff, htp, planes.shape[3], anchor=k
        )
        for k in uniq
    ]
    U = len(uniq)
    r0s = jnp.stack([o[0] for o in origins])
    c0s = jnp.stack([o[1] for o in origins])
    # per-(8,128)-tile any-active flag: empty tiles skip DMA + gathers in
    # the kernel (their acc/hit would be all-zero anyway)
    nr_t, nc_t = hop // BR, wop // BC
    any_t = (
        active.reshape(bsz, nr_t, BR, nc_t, BC).max(axis=(2, 4)).astype(jnp.int32)
    )
    grid = (bsz, hop // (BR * VR), wop // BC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BR * VR, BC), lambda b, i, j, *_: (b, i, j)),
            pl.BlockSpec((1, BR * VR, BC), lambda b, i, j, *_: (b, i, j)),
            pl.BlockSpec((1, BR * VR, BC), lambda b, i, j, *_: (b, i, j)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, cdim, BR * VR, BC), lambda b, i, j, *_: (b, 0, i, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * VR * U * PR, cdim, PC), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * VR * U,)),
        ],
    )
    out_bits = pl.pallas_call(
        functools.partial(
            _kernel_pipelined_multi, w_real=w_eff, anchors=anchors,
            slot_of=slot_of,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, cdim, hop, wop), jnp.int32),
    )(r0s, c0s, any_t, r_idx, c_idx, active, planes_bits)
    # cdim == 8 asserted in _prep_operands (packed 4-channel layout retired)
    out = jax.lax.bitcast_convert_type(out_bits, jnp.float32)
    mask = out[:, 6]
    if (hop, wop) != (ho, wo):
        out = out[:, :, :ho, :wo]
        mask = mask[:, :ho, :wo]
    return out, mask > 0.5


@functools.partial(jax.jit, static_argnames=("row_policy", "wrap"))
def warp_gather_batched(
    planes: jnp.ndarray,
    r_idx: jnp.ndarray,
    c_idx: jnp.ndarray,
    active: jnp.ndarray = None,
    row_policy: str = "mean",
    wrap: bool = True,
):
    """planes: (B, Ht, 8, Wt) f32 channel planes (pack_target_planes8); the
    kernel moves them as i32 bit patterns internally because TPU f32 data
    movement flushes denormals.
    r_idx/c_idx: (B, Ho, Wo) i32 target coordinates (into the planes'
    (Ht, Wt) grid) clipped into range — the output grid may differ from the
    target grid (the panorama stitcher gathers a (320, 240) block from a
    (240, 320) sensor image). active: optional (B, Ho, Wo) bool — only
    these pixels participate in window placement and gathering (re-gather
    passes restrict to pixels earlier passes missed). wrap: whether column
    coordinates wrap at Wt (the panorama theta seam) — enables the halo +
    per-tile remap; pass False for non-periodic targets like sensor images.
    Returns (out (B, C, Ho, Wo) in the input dtype, in_window (B, Ho, Wo)
    bool)."""
    if active is None:
        active = jnp.ones(r_idx.shape, jnp.int32)
    # pipelined grid steps process VR stacked tiles: pad rows to BR*VR
    # (window placement stays per-BR-row tile; pad rows are inactive)
    planes, r_idx, c_idx, active, (
        bsz, cdim, ho, wo, hop, wop, htp, w_eff,
    ) = _prep_operands(
        planes, r_idx, c_idx, active, wrap,
        BR * VR if PIPELINE_KERNEL else BR,
    )

    out_shape = [
        jax.ShapeDtypeStruct((bsz, cdim, hop, wop), jnp.float32),
        jax.ShapeDtypeStruct((bsz, hop, wop), jnp.float32),
    ]
    # fallback kernel tiles single BR rows; pipelined steps take VR at once
    grid = (bsz, hop // (BR * VR if PIPELINE_KERNEL else BR), wop // BC)
    if PIPELINE_KERNEL:
        # the pipelined kernel moves data as i32 bit patterns (see _kernel_pipelined)
        planes_bits = (
            planes
            if planes.dtype == jnp.int32
            else jax.lax.bitcast_convert_type(planes, jnp.int32)
        )
        r0s, c0s = _tile_origins(
            r_idx, c_idx, active != 0, w_eff, htp, planes.shape[3],
            anchor="max" if row_policy == "max" else "min",
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BR * VR, BC), lambda b, i, j, *_: (b, i, j)),
                pl.BlockSpec((1, BR * VR, BC), lambda b, i, j, *_: (b, i, j)),
                pl.BlockSpec((1, BR * VR, BC), lambda b, i, j, *_: (b, i, j)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, cdim, BR * VR, BC), lambda b, i, j, *_: (b, 0, i, j)
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * VR * PR, cdim, PC), jnp.int32),
                pltpu.SemaphoreType.DMA((2 * VR,)),
            ],
        )
        out_bits = pl.pallas_call(
            functools.partial(_kernel_pipelined, w_real=w_eff, row_policy=row_policy),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, cdim, hop, wop), jnp.int32),
        )(r0s, c0s, r_idx, c_idx, active, planes_bits)
        out = jax.lax.bitcast_convert_type(out_bits, jnp.float32)
        mask = out[:, 6]
    else:
        assert cdim == 8, "the single-buffer fallback kernel is 8-channel only"
        # (the fallback ignores `active`; it exists only for A/B debugging of
        # the default full-frame pass)
        out, mask = pl.pallas_call(
            functools.partial(_kernel, w_real=w_eff),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BR, BC), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BR, BC), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, C, BR, BC), lambda b, i, j: (b, 0, i, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, BR, BC), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((PR, C, PC), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(r_idx, c_idx, planes)
    if (hop, wop) != (ho, wo):
        out = out[:, :, :ho, :wo]
        mask = mask[:, :ho, :wo]
    return out, mask > 0.5


def window_mask_reference(
    r_idx: jnp.ndarray,
    c_idx: jnp.ndarray,
    active: jnp.ndarray = None,
    row_policy: str = "mean",
    target_shape=None,
    wrap: bool = True,
) -> jnp.ndarray:
    """Pure-XLA emulation of the kernel's in-window mask — runs on any
    backend, so the CPU suite can quantify the coverage deviation the kernel
    introduces (out-of-window targets are masked; seam-straddling targets
    are covered via the wrap halo) without TPU hardware. Mirrors _kernel's
    window selection exactly: per-(8,128)-tile seam remap, DMA window origin
    from the tile minimum (columns 128-aligned), then a K-row window centred
    on each output row's mean target row.

    r_idx/c_idx: (H, W) i32 target coordinates already clipped into range
    (invalid pixels fed identity coordinates, as fused_sweep_sphere does).
    Returns (H, W) bool.
    """
    ho, wo = r_idx.shape
    ht, wt = target_shape if target_shape is not None else (ho, wo)
    hp = max(ht, PR)
    hop = _round_up(ho, BR)
    wop = _round_up(wo, BC)
    # wp_ext equals the kernel's padded width under the shared pad-band-free
    # halo rule (_wrap_halo): for wt > 2*PC the widened halo exactly fills
    # the BC-aligned padded width with wrapped data, so geometric in-window
    # == gatherable; the _round_up is then an identity
    halo = _wrap_halo(wt) if wrap else 0
    wp_ext = max(_round_up(wt + halo, BC), PC + BC)
    w = wt if wrap else (1 << 22)  # straddle threshold (disabled when not wrapping)
    if active is None:
        active = jnp.ones((ho, wo), bool)
    if (hop, wop) != (ho, wo):
        r_idx = jnp.pad(r_idx, ((0, hop - ho), (0, wop - wo)), mode="edge")
        c_idx = jnp.pad(c_idx, ((0, hop - ho), (0, wop - wo)), mode="edge")
        active = jnp.pad(active, ((0, hop - ho), (0, wop - wo)))
    nr, nc = hop // BR, wop // BC
    # (nr, nc, BR, BC) tile view
    r_t = r_idx.reshape(nr, BR, nc, BC).transpose(0, 2, 1, 3)
    c_t = c_idx.reshape(nr, BR, nc, BC).transpose(0, 2, 1, 3)
    a_t = active.reshape(nr, BR, nc, BC).transpose(0, 2, 1, 3)
    # theta-wrap remap into the halo (mirrors _kernel_pipelined)
    spread = jnp.max(jnp.where(a_t, c_t, -_BIG), axis=(2, 3)) - jnp.min(
        jnp.where(a_t, c_t, _BIG), axis=(2, 3)
    )
    straddle = (spread > (w // 2))[:, :, None, None]
    c_t = jnp.where(straddle & (c_t < w // 2), c_t + w, c_t)
    if row_policy == "max":  # max-anchored window (mirrors _tile_origins)
        r0 = jnp.clip(
            jnp.max(jnp.where(a_t, r_t, -_BIG), axis=(2, 3)) - (PR - 1), 0, hp - PR
        )[:, :, None, None]
        c0 = (
            jnp.clip(
                jnp.max(jnp.where(a_t, c_t, -_BIG), axis=(2, 3)) // 128 * 128
                - (PC - 128),
                0,
                wp_ext - PC,
            )
        )[:, :, None, None]
    else:
        r0 = jnp.clip(
            jnp.min(jnp.where(a_t, r_t, _BIG), axis=(2, 3)), 0, hp - PR
        )[:, :, None, None]
        c0 = (
            jnp.clip(jnp.min(jnp.where(a_t, c_t, _BIG), axis=(2, 3)), 0, wp_ext - PC)
            // 128 * 128
        )[:, :, None, None]
    lr = r_t - r0
    lc = c_t - c0
    lc_ok = (lc >= 0) & (lc < PC) & a_t
    if row_policy == "mean":
        lr_f = lr.astype(jnp.float32)
        row_n = jnp.maximum(jnp.sum(lc_ok.astype(jnp.float32), axis=3), 1.0)
        row_mean = jnp.sum(jnp.where(lc_ok, lr_f, 0.0), axis=3) / row_n
        lo = jnp.clip((row_mean - (K - 1) / 2 + 0.5).astype(jnp.int32), 0, PR - K)
    elif row_policy == "min":
        lo = jnp.clip(
            jnp.min(jnp.where(lc_ok, lr, _BIG), axis=3).astype(jnp.int32), 0, PR - K
        )
    else:
        lo = jnp.clip(
            (jnp.max(jnp.where(lc_ok, lr, -_BIG), axis=3) - (K - 1)).astype(jnp.int32),
            0,
            PR - K,
        )
    lo = lo[:, :, :, None]
    in_win = lc_ok & (lr >= lo) & (lr < lo + K)
    out = in_win.transpose(0, 2, 1, 3).reshape(hop, wop)
    return out[:ho, :wo]


@jax.custom_batching.custom_vmap
def warp_gather(planes: jnp.ndarray, r_idx: jnp.ndarray, c_idx: jnp.ndarray):
    """Single-pair entry: planes (H, C, W), r/c (H, W). vmap maps onto the
    batched grid axis."""
    out, mask = warp_gather_batched(planes[None], r_idx[None], c_idx[None])
    return out[0], mask[0]


@warp_gather.def_vmap
def _warp_gather_vmap(axis_size, in_batched, planes, r_idx, c_idx):
    pb, rb, cb = in_batched

    def ensure(x, batched):
        return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

    out, mask = warp_gather_batched(
        ensure(planes, pb), ensure(r_idx, rb), ensure(c_idx, cb)
    )
    return (out, mask), (True, True)


def _make_masked_entry(policy):
    @jax.custom_batching.custom_vmap
    def entry(planes, r_idx, c_idx, active):
        out, mask = warp_gather_batched(
            planes[None], r_idx[None], c_idx[None], active[None], row_policy=policy
        )
        return out[0], mask[0]

    @entry.def_vmap
    def _vmap(axis_size, in_batched, planes, r_idx, c_idx, active):
        pb, rb, cb, ab = in_batched

        def ensure(x, batched):
            return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        out, mask = warp_gather_batched(
            ensure(planes, pb), ensure(r_idx, rb), ensure(c_idx, cb),
            ensure(active, ab), row_policy=policy,
        )
        return (out, mask), (True, True)

    return entry


# warp_gather restricted to `active` (H, W) bool pixels: windows are placed
# from the active subset only, anchored at its lowest ("min") or highest
# ("max") targets — alternating the two lets repeated re-gather passes peel
# parallax bands a single window cannot span.
warp_gather_masked = _make_masked_entry("min")
warp_gather_masked_max = _make_masked_entry("max")


def _make_multi_entry(anchors):
    @jax.custom_batching.custom_vmap
    def entry(planes, r_idx, c_idx, active):
        out, mask = warp_gather_batched_multi(
            planes[None], r_idx[None], c_idx[None], active[None], anchors=anchors
        )
        return out[0], mask[0]

    @entry.def_vmap
    def _vmap(axis_size, in_batched, planes, r_idx, c_idx, active):
        pb, rb, cb, ab = in_batched

        def ensure(x, batched):
            return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        out, mask = warp_gather_batched_multi(
            ensure(planes, pb), ensure(r_idx, rb), ensure(c_idx, cb),
            ensure(active, ab), anchors=anchors,
        )
        return (out, mask), (True, True)

    return entry


# One traversal fusing the exact-final's min- then max-anchored re-gathers.
warp_gather_masked_dual = _make_multi_entry(("min", "max"))
# One traversal covering mean+min+max — a full-coverage single-pass gather
# (candidate replacement for default-pass + mirror + two re-gathers when the
# XLA window-mask recompute prices high; see tools/profile_stats_cost.py).
warp_gather_masked_full = _make_multi_entry(("mean", "min", "max"))
