"""Batched plane-compatibility prefilter on device.

SURVEY.md §2.3 calls for relocalization and loop-closure candidate
evaluation to be *batched* rather than a sequential host loop per keyframe
(reference Relocalizer360.h:78-93 scans all KFs one by one; the rebuild
evaluates every candidate's unary plane-compatibility matrix in ONE vmapped
jit and runs the exact host interpretation-tree search only on candidates
whose compatibility upper bound clears the acceptance gates).

The prefilter is a strict relaxation of SubgraphMatcher._unary (it drops the
label-equality constraint and never *adds* one), so a candidate the exact
matcher would accept always survives it: if the tree search can assign
>= MIN_MATCHES planes with matched area > MIN_AREA, then at least that many
reference planes have a unary-compatible target and their area is at least
the matched area. Results are therefore identical to the sequential scan.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.config import default_params
from rgbd360_tpu.core.matcher import (
    ODOMETRY_6DOF,
    PLANAR_3DOF,
    PLANAR_ODOMETRY_3DOF,
    MatcherConfig,
)
from rgbd360_tpu.core.pbmap import HIST_H_BINS, PbMap

MAX_PLANES = 48  # pad bound for one keyframe's plane set


def pack_pbmap(pbmap: PbMap, k: int = MAX_PLANES):
    """Plane parameters as fixed-shape arrays (pad/truncate to k planes).

    Ordering must keep the packed set a SUPERSET of the exact matcher's
    subgraph selection (RegisterRGBD360._select: curvature-filtered, labeled
    planes force-promoted with area key 10.0, top max_match_planes=25) or
    the 'strict relaxation' guarantee breaks — a plane the tree search would
    match could be truncated out of the prefilter's k=48 and the candidate
    wrongly pruned. So: curvature-passing planes first, then _select's own
    label-forced area key; the exact top-25 is always a prefix."""
    planes = sorted(
        pbmap.planes,
        key=lambda p: (
            p.curvature < default_params.max_curvature_plane,
            10.0 if p.label else p.area_hull,
        ),
        reverse=True,
    )[:k]
    n = len(planes)
    normals = np.zeros((k, 3), np.float32)
    d = np.zeros(k, np.float32)
    area = np.zeros(k, np.float32)
    elong = np.ones(k, np.float32)
    hist = np.zeros((k, HIST_H_BINS), np.float32)
    has_hist = np.zeros(k, bool)
    valid = np.zeros(k, bool)
    for i, p in enumerate(planes):
        normals[i] = p.normal
        d[i] = p.d
        area[i] = p.area_hull
        elong[i] = max(p.elongation, 1.0)
        if p.hist_h is not None and np.sum(p.hist_h) > 0:
            hist[i] = p.hist_h
            has_hist[i] = True
        valid[i] = True
    return dict(
        normals=normals, d=d, area=area, elong=elong, hist=hist,
        has_hist=has_hist, valid=valid, count=n,
    )


def stack_packs(packs: List[dict]):
    return {
        key: np.stack([p[key] for p in packs])
        for key in ("normals", "d", "area", "elong", "hist", "has_hist", "valid")
    }


@functools.partial(jax.jit, static_argnames=("mode",))
def _compat_matrix(ref, trg, cfg: Tuple[float, ...], mode: int):
    """(Kr, Kt) unary compatibility for one candidate (vmapped over a batch).

    cfg = (area_threshold, elongation_threshold, hue_threshold, dist_d,
           cos_angle_min) — scalars traced, mode static.
    """
    area_thr, elong_thr, hue_thr, dist_d, cos_angle_min = cfg
    a1 = jnp.maximum(ref["area"][:, None], 1e-6)
    a2 = jnp.maximum(trg["area"][None, :], 1e-6)
    ok = jnp.maximum(a1, a2) / jnp.minimum(a1, a2) <= area_thr

    e1 = ref["elong"][:, None]
    e2 = trg["elong"][None, :]
    ok &= jnp.maximum(e1, e2) / jnp.minimum(e1, e2) <= elong_thr

    # Bhattacharyya coefficient of the hue histograms; pass when either side
    # has no color statistics (mirrors the host matcher's None check)
    bc = jnp.einsum(
        "ih,jh->ij", jnp.sqrt(ref["hist"]), jnp.sqrt(trg["hist"])
    )
    both = ref["has_hist"][:, None] & trg["has_hist"][None, :]
    ok &= jnp.where(both, bc >= hue_thr, True)

    if mode in (ODOMETRY_6DOF, PLANAR_ODOMETRY_3DOF):
        ok &= jnp.abs(ref["d"][:, None] - trg["d"][None, :]) <= dist_d
        cos_ang = jnp.einsum("ic,jc->ij", ref["normals"], trg["normals"])
        ok &= cos_ang >= cos_angle_min
    if mode in (PLANAR_3DOF, PLANAR_ODOMETRY_3DOF):
        up_r = ref["normals"][:, 0][:, None]  # up axis is x (matcher.UP_AXIS)
        up_t = trg["normals"][None, :, 0]
        ok &= jnp.abs(up_r - up_t) <= 0.1

    return ok & ref["valid"][:, None] & trg["valid"][None, :]


def prefilter_candidates(
    frame_pbmap: PbMap,
    cand_pbmaps: List[PbMap],
    config: MatcherConfig,
    mode: int = PLANAR_3DOF,
) -> Tuple[np.ndarray, np.ndarray]:
    """For each candidate keyframe: (upper bound on matchable plane count,
    upper bound on the candidate-side matchable area) — one batched device
    evaluation. The area bound is over the *candidate's* planes because both
    call sites register with the candidate as the reference frame, whose
    matched area feeds the acceptance gate (RegisterRGBD360.get_area_matched)."""
    if not cand_pbmaps:
        return np.zeros(0, int), np.zeros(0)
    ref = {k: jnp.asarray(v) for k, v in pack_pbmap(frame_pbmap).items() if k != "count"}
    packed = stack_packs([pack_pbmap(p) for p in cand_pbmaps])
    trg = {k: jnp.asarray(v) for k, v in packed.items()}
    import math

    cfg = (
        config.area_threshold,
        config.elongation_threshold,
        config.hue_threshold,
        config.dist_d,
        math.cos(math.radians(config.angle_deg)),
    )
    compat = jax.vmap(lambda t: _compat_matrix(ref, t, cfg, mode))(trg)  # (B, Kf, Kc)
    frame_has = np.asarray(jnp.any(compat, axis=2))  # (B, Kf)
    cand_has = np.asarray(jnp.any(compat, axis=1))  # (B, Kc)
    counts = np.minimum(frame_has.sum(axis=1), cand_has.sum(axis=1))
    areas = (cand_has * np.asarray(trg["area"])).sum(axis=1)
    return counts, areas
