"""Fast bilateral filter on the z channel of an organized cloud.

Replicates PCL's FastBilateralFilter (Paris & Durand bilateral grid) as used
by the frame pipeline with sigma_s=10 px, sigma_r=0.05 m (reference
include/Frame360.h:417-430, 493-499). Like PCL, only z is filtered; x and y
keep their un-filtered values.

Grid shape ~ (H/10+4, W/10+4, zrange/0.05+4): splat (z, 1) homogeneous
values, blur each axis with a [1 2 1]/4 kernel, slice with trilinear
interpolation. The splat is a scatter-add over a tiny grid, which XLA
handles fine at this size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SIGMA_S = 10.0
SIGMA_R = 0.05
_PAD = 2


def _blur_axis(grid: jnp.ndarray, axis: int) -> jnp.ndarray:
    lo = jnp.roll(grid, 1, axis)
    hi = jnp.roll(grid, -1, axis)
    return 0.25 * lo + 0.5 * grid + 0.25 * hi


@functools.partial(jax.jit, static_argnames=())
def fast_bilateral_z(z: jnp.ndarray) -> jnp.ndarray:
    """z: (H, W) f32 with NaN invalid. Returns filtered z (NaN preserved)."""
    h, w = z.shape
    valid = jnp.isfinite(z)
    zv = jnp.where(valid, z, 0.0)
    zmin = jnp.min(jnp.where(valid, z, jnp.inf))
    zmin = jnp.where(jnp.isfinite(zmin), zmin, 0.0)

    gh = int(round(h / SIGMA_S)) + 1 + 2 * _PAD
    gw = int(round(w / SIGMA_S)) + 1 + 2 * _PAD
    # depth range bins: generous static bound (10 m / 0.05 = 200)
    gd = 200 + 1 + 2 * _PAD

    yy = jnp.arange(h, dtype=jnp.float32)[:, None] / SIGMA_S + _PAD
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] / SIGMA_S + _PAD
    # clamp the depth coordinate into the static grid span: beyond it the
    # trilinear slice would EXTRAPOLATE (fractional weights like 1-fz=-86)
    # instead of clamping like the splat's di clip does
    dd = jnp.clip((zv - zmin) / SIGMA_R + _PAD, 0.0, float(200 + _PAD))
    yi = jnp.clip(jnp.round(yy).astype(jnp.int32), 0, gh - 1)
    xi = jnp.clip(jnp.round(xx).astype(jnp.int32), 0, gw - 1)
    di = jnp.clip(jnp.round(dd).astype(jnp.int32), 0, gd - 1)
    yi = jnp.broadcast_to(yi, (h, w))
    xi = jnp.broadcast_to(xi, (h, w))

    flat = (yi * gw + xi) * gd + di
    feat = jnp.stack(
        [jnp.where(valid, zv, 0.0), jnp.where(valid, 1.0, 0.0)], axis=-1
    ).reshape(-1, 2)
    grid = (
        jnp.zeros((gh * gw * gd, 2), jnp.float32)
        .at[flat.reshape(-1)]
        .add(feat)  # one (value, weight) scatter instead of two scalar ones
        .reshape(gh, gw, gd, 2)
    )
    for axis in range(3):
        grid = _blur_axis(grid, axis)

    # trilinear slice at the real-valued grid coordinates; the 8 corner
    # fetches gather (value, weight) ROWS together — 8 takes, not 16
    gy = jnp.broadcast_to(yy, (h, w))
    gx = jnp.broadcast_to(xx, (h, w))
    gz = dd
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, gh - 2)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, gw - 2)
    z0 = jnp.clip(jnp.floor(gz).astype(jnp.int32), 0, gd - 2)
    fy = gy - y0
    fx = gx - x0
    fz = gz - z0
    flatg = grid.reshape(-1, 2)

    def at(dy, dx, dz):
        idx = ((y0 + dy) * gw + (x0 + dx)) * gd + (z0 + dz)
        return jnp.take(flatg, idx.reshape(-1), axis=0).reshape(h, w, 2)

    acc = (
        at(0, 0, 0) * ((1 - fy) * (1 - fx) * (1 - fz))[..., None]
        + at(1, 0, 0) * (fy * (1 - fx) * (1 - fz))[..., None]
        + at(0, 1, 0) * ((1 - fy) * fx * (1 - fz))[..., None]
        + at(0, 0, 1) * ((1 - fy) * (1 - fx) * fz)[..., None]
        + at(1, 1, 0) * (fy * fx * (1 - fz))[..., None]
        + at(1, 0, 1) * (fy * (1 - fx) * fz)[..., None]
        + at(0, 1, 1) * ((1 - fy) * fx * fz)[..., None]
        + at(1, 1, 1) * (fy * fx * fz)[..., None]
    )
    num = acc[..., 0]
    den = acc[..., 1]
    zf = jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), z)
    return jnp.where(valid, zf, z)
