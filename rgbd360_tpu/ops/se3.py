"""SE(3)/SO(3) helpers (jit/vmap-friendly, f32 by default).

The dense aligner composes pose updates as ``exp(xi) @ pose`` where ``xi`` is
a 6-vector ``[v, w]``. The spherical path uses the *pseudo-exponential*
(translation copied verbatim, rotation exponentiated), matching
``mrpt::poses::CPose3D::exp(xi, pseudo_exponential=true)`` as called at
reference include/RegisterPhotoICP.h:4697; the pinhole path uses the full
SE(3) exponential (reference include/RegisterPhotoICP.h:4358).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Standard hat operator: skew(v) @ u == v x u
    (reference include/Miscellaneous.h:88-99 uses the same convention)."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, numerically safe near 0 (Taylor fallbacks)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < 1e-6
    # sin(t)/t and (1-cos(t))/t^2 with series fallback
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2)
    )
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def exp_se3(xi: jnp.ndarray, pseudo: bool = True) -> jnp.ndarray:
    """4x4 pose from twist [v, w].

    pseudo=True: t = v (mrpt pseudo-exponential, sphere path).
    pseudo=False: t = V(w) @ v (full SE(3) exponential, pinhole path).
    """
    v, w = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    if pseudo:
        t = v
    else:
        theta2 = jnp.sum(w * w, axis=-1)
        theta = jnp.sqrt(theta2)
        small = theta < 1e-6
        b = jnp.where(
            small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2)
        )
        c = jnp.where(
            small,
            1.0 / 6.0 - theta2 / 120.0,
            (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta),
        )
        W = skew(w)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
        V = eye + b[..., None, None] * W + c[..., None, None] * (W @ W)
        t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        np.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector from a rotation matrix (for diagnostics/graph ops)."""
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w_hat = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    small = theta < 1e-6
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * jnp.sin(jnp.where(small, 1.0, theta))))
    return scale * w_hat


def compose(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    return pose_a @ pose_b


def inverse(pose: jnp.ndarray) -> jnp.ndarray:
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        np.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rot_angle_deg(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Angular distance between two rotations in degrees
    (reference include/Miscellaneous.h:127-140 diffRotation)."""
    Rrel = jnp.swapaxes(Ra, -1, -2) @ Rb
    cos_theta = jnp.clip((jnp.trace(Rrel) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos_theta))
