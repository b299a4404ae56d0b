"""Pallas block-warp gather — the flagship TPU kernel.

The dense aligner needs, per sweep, target-image values at warped pixel
positions: out[i] = planes[:, r[i], c[i]]. XLA's TPU gather costs ~0.5 ms
fixed + ~15 ns/index, which dominates the whole registration (44 sweeps per
pair). This kernel exploits the warp's spatial coherence: source pixels are
processed in compact (8, 128) image tiles; each tile's targets land in a
small (PR=16, PC=256) window whose origin is the tile minimum, fetched from
HBM with one dynamic-slice DMA; the within-window gather is a masked
row-sum over PR rows combined with a lane-wise dynamic gather
(take_along_axis on (8,128) tiles — the gather primitive Mosaic supports).

Pixels whose target falls outside the window (depth-parallax outliers and
targets straddling the theta=0 wrap seam) are flagged in the returned mask
and treated as invisible by the caller — a documented deviation from the
reference, which gathers them; measured on the bundled pair this affects
<0.1% of pixels and does not move the pose beyond the 1e-3 gate
(tests/test_warp_gather.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 8  # packed target channels (photoicp.pack_target_channels)
BR, BC = 8, 128  # source tile
PR, PC = 16, 256  # target window per tile


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(r_ref, c_ref, planes_hbm, out_ref, mask_ref, patch, sem):
    r = r_ref[...]
    c = c_ref[...]
    hp = planes_hbm.shape[1]
    wp = planes_hbm.shape[2]
    # window origin, aligned down to the (8, 128) HBM tile grid (Mosaic
    # requires tile-aligned dynamic-slice DMAs); PR/PC budget the alignment
    # loss (<=7 rows, <=127 cols) plus the within-tile warp spread
    r0 = pl.multiple_of((jnp.clip(jnp.min(r), 0, hp - PR) // 8) * 8, 8)
    c0 = pl.multiple_of((jnp.clip(jnp.min(c), 0, wp - PC) // 128) * 128, 128)
    dma = pltpu.make_async_copy(
        planes_hbm.at[:, pl.ds(r0, PR), pl.ds(c0, PC)], patch, sem
    )
    dma.start()

    lr = r - r0
    lc = c - c0
    inp = (lr >= 0) & (lr < PR) & (lc >= 0) & (lc < PC)
    lrc = jnp.clip(lr, 0, PR - 1)
    lcc = jnp.clip(lc, 0, PC - 1)
    lcm = jnp.remainder(lcc, 128)
    sub_hi = lcc >= 128  # PC == 256: two 128-lane column subtiles

    dma.wait()

    for ch in range(C):
        acc = jnp.zeros((BR, BC), jnp.float32)
        for k in range(PR):
            row_lo = jnp.broadcast_to(patch[ch, k, 0:128][None, :], (BR, BC))
            row_hi = jnp.broadcast_to(patch[ch, k, 128:256][None, :], (BR, BC))
            g_lo = jnp.take_along_axis(row_lo, lcm, axis=1)
            g_hi = jnp.take_along_axis(row_hi, lcm, axis=1)
            val = jnp.where(sub_hi, g_hi, g_lo)
            acc = acc + jnp.where(lrc == k, val, 0.0)
        out_ref[ch] = jnp.where(inp, acc, 0.0)
    mask_ref[...] = inp


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_gather(planes: jnp.ndarray, r_idx: jnp.ndarray, c_idx: jnp.ndarray, interpret: bool = False):
    """Gather planes[:, r_idx, c_idx] blockwise.

    planes: (C, H, W) f32; r_idx/c_idx: (H, W) i32 (any values; out-of-image
    targets must already be clipped into [0,H)x[0,W) by the caller — they are
    masked by the caller's visibility logic).
    Returns (out (C, H, W) f32, in_window (H, W) bool).
    """
    _, h, w = planes.shape
    hp = max(_round_up(h, BR), PR)
    wp = max(_round_up(w, BC), PC)
    if (hp, wp) != (h, w):
        planes = jnp.pad(planes, ((0, 0), (0, hp - h), (0, wp - w)))
        r_idx = jnp.pad(r_idx, ((0, hp - h), (0, wp - w)))
        c_idx = jnp.pad(c_idx, ((0, hp - h), (0, wp - w)))

    grid = (hp // BR, wp // BC)
    out, mask = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BR, BC), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, BC), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # planes stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((C, BR, BC), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, BC), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.bool_),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, PR, PC), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(r_idx, c_idx, planes)
    if (hp, wp) != (h, w):
        out = out[:, :h, :w]
        mask = mask[:h, :w]
    return out, mask
