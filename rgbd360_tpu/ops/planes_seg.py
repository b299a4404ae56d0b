"""Organized multi-plane segmentation as iterative label propagation.

Equivalent of PCL OrganizedMultiPlaneSegmentation with the reference's
configuration (include/Frame360.h:958-977: min inliers 80, angular threshold
0.039812 rad, distance threshold 0.02 m): two 4-connected pixels belong to
the same planar region when their normals agree within the angular threshold
and their plane offsets (n . p) differ by less than the distance threshold.
Region growing — inherently sequential in PCL — becomes a fixed-point
min-label flood fill (a lax.while_loop of vectorized 4-neighbour minima),
converging in O(image diameter) sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ANGULAR_THRESHOLD = 0.039812  # rad (~2.3 deg)
DISTANCE_THRESHOLD = 0.02  # m
MIN_INLIERS = 80


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def segment_planes(
    xyz: jnp.ndarray,  # (H, W, 3) NaN-invalid
    normals: jnp.ndarray,  # (H, W, 3) NaN-invalid
    # min-label propagation moves one pixel per sweep: the half-res sensor
    # grid is 120x160, so the worst-case distance is 120+160-2 = 278 plus
    # slack for concave paths around depth holes — 512 bounds it comfortably
    max_sweeps: int = 512,
):
    """Returns labels (H, W) int32: -1 invalid, else the component id (the
    smallest flat pixel index in the component)."""
    h, w = xyz.shape[:2]
    valid = jnp.all(jnp.isfinite(xyz), axis=-1) & jnp.all(jnp.isfinite(normals), axis=-1)
    n = jnp.where(valid[..., None], normals, 0.0)
    p = jnp.where(valid[..., None], xyz, 0.0)
    d = jnp.sum(n * p, axis=-1)  # plane offset per pixel
    cos_thr = jnp.cos(ANGULAR_THRESHOLD)

    def connected(sl_a, sl_b):
        """Edge predicate between two equally-shaped pixel slabs."""
        dot = jnp.sum(sl_a[0] * sl_b[0], axis=-1)
        return (
            sl_a[2]
            & sl_b[2]
            & (dot > cos_thr)
            & (jnp.abs(sl_a[1] - sl_b[1]) < DISTANCE_THRESHOLD)
        )

    a = (n, d, valid)
    right = jnp.zeros((h, w), bool).at[:, :-1].set(
        connected(tuple(x[:, :-1] for x in a), tuple(x[:, 1:] for x in a))
    )
    down = jnp.zeros((h, w), bool).at[:-1, :].set(
        connected(tuple(x[:-1, :] for x in a), tuple(x[1:, :] for x in a))
    )

    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    BIG = h * w  # sentinel larger than any label
    labels0 = jnp.where(valid, idx, BIG)

    def sweep(lab):
        # pull the min label across each connected edge, both directions
        shift_l = jnp.pad(lab[:, 1:], ((0, 0), (0, 1)), constant_values=BIG)
        shift_u = jnp.pad(lab[1:, :], ((0, 1), (0, 0)), constant_values=BIG)
        from_right = jnp.where(right, shift_l, BIG)
        from_down = jnp.where(down, shift_u, BIG)
        from_left = jnp.pad(jnp.where(right, lab, BIG), ((0, 0), (1, 0)), constant_values=BIG)[:, :w]
        from_up = jnp.pad(jnp.where(down, lab, BIG), ((1, 0), (0, 0)), constant_values=BIG)[:h, :]
        new = jnp.minimum(
            jnp.minimum(lab, from_right),
            jnp.minimum(from_left, jnp.minimum(from_down, from_up)),
        )
        return jnp.where(valid, new, BIG)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_sweeps)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(valid, labels, -1)


@functools.partial(jax.jit, static_argnames=("sweeps",))
def refine_plane_labels(
    labels: jnp.ndarray,  # (H, W) i32 from segment_planes (-1 unlabeled)
    xyz: jnp.ndarray,  # (H, W, 3) NaN-invalid
    normals: jnp.ndarray,  # (H, W, 3) NaN-invalid
    sweeps: int = 8,
):
    """Boundary refinement after the flood fill — the 'refine' half of PCL's
    segmentAndRefine (reference include/Frame360.h:977): valid pixels left
    unlabeled (their normal was rejected near a depth edge) are absorbed by
    an adjacent region when their point fits that region's plane model within
    DISTANCE_THRESHOLD. Fixed number of one-pixel dilation sweeps, each one
    fully vectorized.
    """
    h, w = labels.shape
    hw = h * w
    valid_xyz = jnp.all(jnp.isfinite(xyz), axis=-1)
    p = jnp.where(valid_xyz[..., None], xyz, 0.0)

    # per-region plane model (mean normal + centroid) via one scatter-add
    labf = labels.reshape(-1)
    bin_ = jnp.where(labf >= 0, labf, hw)
    nrm = jnp.where(jnp.isfinite(normals), normals, 0.0).reshape(-1, 3)
    feat = jnp.concatenate(
        [nrm, p.reshape(-1, 3), jnp.ones((hw, 1), jnp.float32)], axis=-1
    )
    sums = jnp.zeros((hw + 1, 7), jnp.float32).at[bin_].add(feat)
    cnt = jnp.maximum(sums[:, 6:7], 1.0)
    n_mean = sums[:, :3] / cnt
    n_mean = n_mean / jnp.maximum(jnp.linalg.norm(n_mean, axis=-1, keepdims=True), 1e-12)
    centroid = sums[:, 3:6] / cnt
    d_mean = jnp.sum(n_mean * centroid, axis=-1)  # plane offset n . p

    NOLAB = jnp.int32(-1)

    def neighbors(lab):
        up = jnp.pad(lab[1:, :], ((0, 1), (0, 0)), constant_values=NOLAB)
        down = jnp.pad(lab[:-1, :], ((1, 0), (0, 0)), constant_values=NOLAB)
        left = jnp.pad(lab[:, 1:], ((0, 0), (0, 1)), constant_values=NOLAB)
        right = jnp.pad(lab[:, :-1], ((0, 0), (1, 0)), constant_values=NOLAB)
        return up, down, left, right

    lab = labels
    for _ in range(sweeps):
        # each neighbour label is tested against ITS OWN plane model: a
        # boundary pixel between a fitting region and a non-fitting one must
        # still be absorbed (taking only the max label and testing that one
        # candidate left such pixels unlabeled forever)
        best = jnp.full_like(lab, NOLAB)
        for cand in neighbors(lab):
            safe = jnp.clip(cand, 0, hw - 1)
            n_c = jnp.take(n_mean, safe.reshape(-1), axis=0).reshape(h, w, 3)
            d_c = jnp.take(d_mean, safe.reshape(-1), axis=0).reshape(h, w)
            fit = jnp.abs(jnp.sum(n_c * p, axis=-1) - d_c) < DISTANCE_THRESHOLD
            cand_ok = (cand >= 0) & fit
            best = jnp.where(cand_ok & (cand > best), cand, best)
        grow = (lab < 0) & valid_xyz & (best >= 0)
        lab = jnp.where(grow, best, lab)
    return lab
