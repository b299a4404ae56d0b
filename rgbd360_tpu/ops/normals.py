"""Integral-image surface normals for organized clouds.

Equivalent of PCL IntegralImageNormalEstimation in AVERAGE_3D_GRADIENT mode
as configured by the reference (include/Frame360.h:949-967: smoothing 8,
max depth change 0.02, depth-dependent smoothing): per-pixel central-
difference 3D gradients along image x and y are box-averaged (validity-aware,
via cumulative-sum integral images — the TPU-friendly equivalent of PCL's
integral images), and the normal is the normalized cross product, flipped
toward the viewpoint. Pixels whose averaging window straddles a depth
discontinuity larger than max_depth_change*depth are rejected like PCL's
depth-change map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box_sum(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """Sum over a (2r+1)^2 window via padded cumsum (integral image)."""
    h, w = img.shape[:2]
    ii = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    ii = jnp.pad(ii, [(1, 0), (1, 0)] + [(0, 0)] * (img.ndim - 2))
    y0 = jnp.clip(jnp.arange(h) - r, 0, h)
    y1 = jnp.clip(jnp.arange(h) + r + 1, 0, h)
    x0 = jnp.clip(jnp.arange(w) - r, 0, w)
    x1 = jnp.clip(jnp.arange(w) + r + 1, 0, w)
    a = ii[y1][:, x1]
    b = ii[y1][:, x0]
    c = ii[y0][:, x1]
    d = ii[y0][:, x0]
    return a - b - c + d


@functools.partial(jax.jit, static_argnames=("smoothing",))
def organized_normals(
    xyz: jnp.ndarray,  # (H, W, 3) with NaN invalid
    smoothing: int = 8,
    max_depth_change: float = 0.02,
):
    """Returns (normals (H,W,3) f32 NaN-invalid, curvature-proxy none)."""
    valid = jnp.all(jnp.isfinite(xyz), axis=-1)
    p = jnp.where(valid[..., None], xyz, 0.0)

    # central-difference 3D gradients (invalid where either neighbour invalid)
    gx = jnp.zeros_like(p).at[:, 1:-1].set(p[:, 2:] - p[:, :-2])
    gx_ok = jnp.zeros_like(valid).at[:, 1:-1].set(valid[:, 2:] & valid[:, :-2])
    gy = jnp.zeros_like(p).at[1:-1, :].set(p[2:, :] - p[:-2, :])
    gy_ok = jnp.zeros_like(valid).at[1:-1, :].set(valid[2:, :] & valid[:-2, :])

    # depth-discontinuity map: neighbour z jumps beyond max_depth_change*z
    z = xyz[..., 2]
    thr = jnp.maximum(max_depth_change * jnp.where(valid, z, 1.0), max_depth_change)
    jump_x = jnp.zeros_like(valid).at[:, 1:-1].set(
        (jnp.abs(z[:, 2:] - z[:, 1:-1]) > thr[:, 1:-1])
        | (jnp.abs(z[:, 1:-1] - z[:, :-2]) > thr[:, 1:-1])
    )
    jump_y = jnp.zeros_like(valid).at[1:-1, :].set(
        (jnp.abs(z[2:, :] - z[1:-1, :]) > thr[1:-1, :])
        | (jnp.abs(z[1:-1, :] - z[:-2, :]) > thr[1:-1, :])
    )
    edge = (jump_x | jump_y) & valid
    clean = valid & ~edge

    r = smoothing // 2
    gx_m = jnp.where((gx_ok & clean)[..., None], gx, 0.0)
    gy_m = jnp.where((gy_ok & clean)[..., None], gy, 0.0)
    sum_gx = _box_sum(gx_m, r)
    sum_gy = _box_sum(gy_m, r)
    n_gx = _box_sum((gx_ok & clean).astype(jnp.float32), r)
    n_gy = _box_sum((gy_ok & clean).astype(jnp.float32), r)

    normal = jnp.cross(sum_gx, sum_gy)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    # PCL shrinks the smoothing area near depth discontinuities rather than
    # rejecting; the closest cheap equivalent: the centre pixel must be clean
    # and a supermajority of the window's gradients must be edge-free
    # (a strict edge-free-window policy halves plane recall on real data)
    win = float((2 * r + 1) ** 2)
    ok = (
        clean
        & (n_gx > 0.6 * win)
        & (n_gy > 0.6 * win)
        & (norm[..., 0] > 1e-12)
    )
    normal = normal / jnp.maximum(norm, 1e-12)
    # flip toward the viewpoint (sensor at origin): n . p < 0
    flip = jnp.sum(normal * p, axis=-1) > 0
    normal = jnp.where(flip[..., None], -normal, normal)
    nan = jnp.float32(jnp.nan)
    return jnp.where(ok[..., None], normal, nan)
