"""Spherical geometry ops for the 1920x320 panorama.

Sphere pixel <-> 3D convention (reference include/Frame360.h:589-592,
include/RegisterPhotoICP.h:4580-4582):
    phi   = (0.5*H - 0.5 - row) * angle_res,   angle_res = 2*pi/W
    theta = col * angle_res
    x = d*sin(phi);  y = -d*cos(phi)*sin(theta);  z = -d*cos(phi)*cos(theta)
and the forward projection used by the dense aligner
(reference include/RegisterPhotoICP.h:2675-2680):
    dist = |p|;  phi' = asin(x/dist);  theta' = atan2(y, z) + pi
    row' = round(0.5*H-0.5 - phi'/angle_res);  col' = round(theta'/angle_res)
"""

from __future__ import annotations

import jax.numpy as jnp

from rgbd360_tpu.ops.image import round_half_away


def sphere_xyz_lut(depth: jnp.ndarray, min_depth: float, max_depth: float):
    """Spherical backprojection of a panorama depth image.

    Returns (xyz, valid): xyz (H*W, 3) f32 with invalid points zeroed, valid
    (H*W,) bool. Mirrors the LUT build at reference
    include/RegisterPhotoICP.h:4553-4587.
    """
    h, w = depth.shape
    angle_res = 2.0 * jnp.pi / w
    row = jnp.arange(h, dtype=jnp.float32)[:, None]
    col = jnp.arange(w, dtype=jnp.float32)[None, :]
    phi = (0.5 * h - 0.5 - row) * angle_res
    theta = col * angle_res
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)
    x = depth * sin_phi
    y = -depth * cos_phi * jnp.sin(theta)
    z = -depth * cos_phi * jnp.cos(theta)
    valid = (depth > min_depth) & (depth < max_depth)
    xyz = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = valid.reshape(-1)
    return jnp.where(valid[:, None], xyz, 0.0), valid


def sphere_project(p: jnp.ndarray, h: int, w: int):
    """Project transformed 3D points back onto the panorama grid.

    p: (N, 3). Returns (dist, row_int, col_int, inbounds). Out-of-range pixels
    (including the theta==2*pi wrap column, which the reference drops rather
    than wraps) are flagged invalid, matching RegisterPhotoICP.h:2684.
    """
    angle_res_inv = w / (2.0 * jnp.pi)
    half_rows = 0.5 * h - 0.5
    dist = jnp.sqrt(jnp.sum(p * p, axis=-1))
    safe = jnp.maximum(dist, 1e-12)
    phi = jnp.arcsin(jnp.clip(p[..., 0] / safe, -1.0, 1.0))
    theta = jnp.arctan2(p[..., 1], p[..., 2]) + jnp.pi
    r_int = round_half_away(half_rows - phi * angle_res_inv).astype(jnp.int32)
    c_int = round_half_away(theta * angle_res_inv).astype(jnp.int32)
    inb = (r_int >= 0) & (r_int < h) & (c_int >= 0) & (c_int < w)
    return dist, r_int, c_int, inb


def sphere_cloud_from_image(sphere_rgb: jnp.ndarray, sphere_depth_m: jnp.ndarray):
    """Colored spherical point cloud from the stitched panorama
    (reference include/Frame360.h:555-612 buildSphereCloud_fromImage).

    Note this variant uses an offset phi grid (31.5deg top, 1/angle_pixel
    spacing) rather than the aligner's half-pixel-centred grid — replicated
    as-is for output parity. Invalid (zero-depth) points become NaN.
    """
    h, w = sphere_depth_m.shape
    angle_pixel_inv = 2.0 * jnp.pi / w
    offset_phi = jnp.pi * 31.5 / 180.0
    row = jnp.arange(h, dtype=jnp.float32)[:, None]
    col = jnp.arange(w, dtype=jnp.float32)[None, :]
    phi = offset_phi - row * angle_pixel_inv
    theta = col * angle_pixel_inv
    d = sphere_depth_m
    x = jnp.sin(phi) * d
    y = -jnp.cos(phi) * jnp.sin(theta) * d
    z = -jnp.cos(phi) * jnp.cos(theta) * d
    nan = jnp.float32(jnp.nan)
    invalid = d == 0
    xyz = jnp.stack(
        [jnp.where(invalid, nan, x), jnp.where(invalid, nan, y), jnp.where(invalid, nan, z)],
        axis=-1,
    )
    # sphereRGB is stored BGR (OpenCV order); emit RGB
    rgb = sphere_rgb[..., ::-1]
    return xyz, rgb
