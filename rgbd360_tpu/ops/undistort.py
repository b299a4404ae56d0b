"""Batched CLAMS depth undistortion.

The reference undistorts the 8 sensors with one OpenMP thread each, walking a
per-pixel frustum object tree (reference include/Frame360.h:293-310 +
CLAMS discrete_depth_distortion_model.cpp:49-70 interpolatedUndistort).
Here the whole rig is one fused gather/FMA over a (8, H, W) depth stack with
dense (8, by, bx, nbins) multiplier/count tables (io/clams.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# interpolatedUndistort falls back to nearest-bin when either bracketing depth
# bin has fewer than 50 training examples (discrete_depth_distortion_model.cpp:60)
MIN_COUNTS = 50.0


@functools.partial(jax.jit, static_argnames=("bin_width", "bin_height", "bin_depth"))
def undistort_depth(
    depth_m: jnp.ndarray,  # (S, H, W) f32 metres, 0 = invalid
    multipliers: jnp.ndarray,  # (S, BY, BX, K) f32
    counts: jnp.ndarray,  # (S, BY, BX, K) f32
    bin_width: int = 4,
    bin_height: int = 3,
    bin_depth: float = 2.0,
) -> jnp.ndarray:
    s, h, w = depth_m.shape
    by, bx, k = multipliers.shape[1:]

    z = depth_m
    idx = jnp.minimum(k - 1, jnp.floor(z / bin_depth)).astype(jnp.int32)
    start = bin_depth * idx.astype(jnp.float32)
    idx1 = jnp.where(z - start < bin_depth * 0.5, idx, idx + 1)
    idx0 = idx1 - 1

    # per-pixel spatial bin, flattened for gathers
    row_bin = (jnp.arange(h) // bin_height)[None, :, None]
    col_bin = (jnp.arange(w) // bin_width)[None, None, :]
    sensor = jnp.arange(s)[:, None, None]
    base = ((sensor * by + row_bin) * bx + col_bin) * k  # (S,H,W)

    m_flat = multipliers.reshape(-1)
    c_flat = counts.reshape(-1)

    def gather(flat, depth_idx):
        di = jnp.clip(depth_idx, 0, k - 1)
        return jnp.take(flat, base + di, mode="clip")

    m_near = gather(m_flat, idx)
    m0 = gather(m_flat, idx0)
    m1 = gather(m_flat, idx1)
    c0 = gather(c_flat, idx0)
    c1 = gather(c_flat, idx1)

    use_nearest = (idx0 < 0) | (idx1 >= k) | (c0 < MIN_COUNTS) | (c1 < MIN_COUNTS)
    z0 = (idx0.astype(jnp.float32) + 1.0) * bin_depth - bin_depth * 0.5
    coeff1 = (z - z0) / bin_depth
    m_interp = (1.0 - coeff1) * m0 + coeff1 * m1
    mult = jnp.where(use_nearest, m_near, m_interp)
    return jnp.where(z == 0.0, z, z * mult)
