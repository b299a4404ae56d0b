"""Dense spherical photometric + depth-ICP alignment — the hot core.

TPU-first reformulation of the reference Gauss-Newton aligner
(include/RegisterPhotoICP.h:2545-2739 errorPhotoICP_sphere,
:2745-3228 calcHessGrad_sphere, :4519-4784 alignFrames360):

  * the per-pixel scalar loops become one fused, masked tensor program per
    pyramid level: transform (N,3)x(3,3) matmul -> spherical projection ->
    nearest-pixel gather of 6 target images -> Huber residuals -> analytic
    2x6 warp Jacobian -> 6x6 Hessian/gradient as a [6,N]x[N,6] matmul;
  * the <=10-iteration Gauss-Newton loop per level is a lax.while_loop with
    the reference's accept/reject + tolerance semantics;
  * the 5-level coarse-to-fine pyramid is unrolled in one jit;
  * everything is batchable over pairs with vmap (parallel/batch.py) and
    shardable over chips with shard_map (parallel/mesh.py).

Parity notes (kept bit-faithful up to f32 reduction order):
  * theta wrap column W (atan2+pi == 2*pi) is *dropped*, not wrapped, like the
    reference (RegisterPhotoICP.h:2684);
  * in PHOTO_DEPTH mode a pixel whose *photo* saliency test fails contributes
    neither photo nor depth terms (the `continue` at :2690-2692 and :3038);
  * depth==0 target pixels are "finite" (stitched panoramas store invalid as
    0, not NaN) and are only rejected by the depth-gradient saliency test;
  * pose update uses the mrpt pseudo-exponential exp([v,w]) @ pose (:4697);
  * a rejected step exits the level loop (diff_error <= tol_residual).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from rgbd360_tpu.ops import linalg6, se3
from rgbd360_tpu.ops.image import (
    build_depth_pyramid,
    build_gray_pyramid,
    gradient_xy,
    mask_sensor_seams,
)
from rgbd360_tpu.ops.sphere import sphere_project, sphere_xyz_lut

PHOTO_CONSISTENCY = 0
DEPTH_CONSISTENCY = 1
PHOTO_DEPTH = 2

# Default optimization constants (reference RegisterPhotoICP.h:201-221, 4589-4595)
MIN_DEPTH = 0.3
MAX_DEPTH = 6.0
STD_DEV_PHOTO = 6.0 / 255.0
STD_DEV_DEPTH = 0.2
THRES_SALIENCY = 0.01
MAX_ITERS = 10
TOL_UPDATE = 1e-4
TOL_RESIDUAL = 1e-3


class LevelData(NamedTuple):
    """Per-pyramid-level image set for one source/target pair."""

    gray_src: jnp.ndarray  # (H, W) f32
    depth_src: jnp.ndarray  # (H, W) f32 metres
    gray_trg: jnp.ndarray
    depth_trg: jnp.ndarray
    gray_trg_gx: jnp.ndarray
    gray_trg_gy: jnp.ndarray
    depth_trg_gx: jnp.ndarray
    depth_trg_gy: jnp.ndarray


class AlignResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) optimal relative pose
    hessian: jnp.ndarray  # (6, 6) at the final accepted pose
    gradient: jnp.ndarray  # (6,)
    error: jnp.ndarray  # final sqrt(err2/n) at the finest level
    av_photo_residual: jnp.ndarray
    av_depth_residual: jnp.ndarray
    sso: jnp.ndarray  # sensed-space overlap (visible/total pixels)
    num_iterations: jnp.ndarray  # (n_levels,) i32, coarse->fine
    ill_posed: jnp.ndarray  # bool


def build_pyramid_set(
    gray: jnp.ndarray,
    depth_m: jnp.ndarray,
    n_levels: int,
    *,
    is_target: bool,
    sphere_seam_mask: bool,
    min_depth: float = MIN_DEPTH,
    max_depth: float = MAX_DEPTH,
) -> Tuple[Sequence[jnp.ndarray], ...]:
    """Gray + depth pyramids, plus target gradient pyramids
    (reference setSourceFrame/setTargetFrame, RegisterPhotoICP.h:480-516)."""
    gray_pyr = build_gray_pyramid(gray, n_levels)
    depth_pyr = build_depth_pyramid(depth_m, n_levels, min_depth, max_depth)
    if not is_target:
        return gray_pyr, depth_pyr
    ggx, ggy, dgx, dgy = [], [], [], []
    for level in range(n_levels):
        gx, gy = gradient_xy(gray_pyr[level])
        dx, dy = gradient_xy(depth_pyr[level])
        if sphere_seam_mask:
            gx, gy = mask_sensor_seams(gx), mask_sensor_seams(gy)
            dx, dy = mask_sensor_seams(dx), mask_sensor_seams(dy)
        ggx.append(gx)
        ggy.append(gy)
        dgx.append(dx)
        dgy.append(dy)
    return gray_pyr, depth_pyr, ggx, ggy, dgx, dgy


def make_level_data(src_pyrs, trg_pyrs, level: int) -> LevelData:
    gray_src_pyr, depth_src_pyr = src_pyrs
    gray_trg_pyr, depth_trg_pyr, ggx, ggy, dgx, dgy = trg_pyrs
    return LevelData(
        gray_src=gray_src_pyr[level],
        depth_src=depth_src_pyr[level],
        gray_trg=gray_trg_pyr[level],
        depth_trg=depth_trg_pyr[level],
        gray_trg_gx=ggx[level],
        gray_trg_gy=ggy[level],
        depth_trg_gx=dgx[level],
        depth_trg_gy=dgy[level],
    )


def _gather(img: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(img.reshape(-1), flat_idx, mode="clip")


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-f32 matmul. TPU's default matmul precision is bf16, which injects
    enough noise into the 6x6 Gauss-Newton system (H = J^T J) and the point
    transform to flip accept/reject decisions near the 1e-3 tolerance; these
    matmuls are a negligible fraction of sweep cost, so run them exactly."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


# Packed-channel layout for the single fused gather per sweep. Measured on
# v5e: gather cost is minimised at 16 bytes/index (4 f32 lanes; 8 f32 lanes
# hit a 4x slower path), so the six target channels ride in 4 lanes — the
# residual-critical gray/depth values in full f32, the gradient pairs as
# packed f16 (they only scale Jacobian rows and feed threshold tests; f16's
# 0.05% relative error keeps the accept/reject cascade on the f32 path).
CH_GRAY, CH_DEPTH, CH_GG, CH_DG = range(4)
NUM_CH = 4


def _pack2_f16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pack two f32 arrays as an f16 pair in an **i32** slot (low = a).
    i32, never f32: a pair whose high half is zero IS an f32 denormal, and
    TPU f32 data movement (stack/concatenate/gather) flushes denormals —
    the value never exists as f32 on the way in (PERF.md probe)."""
    ab = jnp.stack([a.astype(jnp.float16), b.astype(jnp.float16)], axis=-1)
    return jax.lax.bitcast_convert_type(ab, jnp.int32)


def _unpack2_f16(x: jnp.ndarray):
    """Inverse of _pack2_f16; accepts any 32-bit slot dtype (i32 or f32)."""
    ab = jax.lax.bitcast_convert_type(x, jnp.float16)
    return ab[..., 0].astype(jnp.float32), ab[..., 1].astype(jnp.float32)


def _f32_bits(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _bits_f32(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def pack_target_channels(level: LevelData) -> jnp.ndarray:
    """(H*W, 4) **i32** rows: gray/depth as raw f32 bit patterns, gradient
    pairs as packed f16 — all per-pixel target data touched by a sweep.
    The rows stay i32 end-to-end: moving f16 pairs in f32 slots through the
    stack/gather would flush the pair to zero whenever the high half is
    zero (TPU denormal flush, PERF.md lever 0a)."""
    h, w = level.gray_trg.shape
    return jnp.stack(
        [
            _f32_bits(level.gray_trg),
            _f32_bits(level.depth_trg),
            _pack2_f16(level.gray_trg_gx, level.gray_trg_gy),
            _pack2_f16(level.depth_trg_gx, level.depth_trg_gy),
        ],
        axis=-1,
    ).reshape(h * w, NUM_CH)


def pack_target_planes8(level: LevelData) -> jnp.ndarray:
    """(H, 8, W) f32 channel-sublane layout for the Mosaic block-warp kernel
    (ops/warp_gather.py): [gray, depth, ggx, ggy, dgx, dgy, 0, 0]."""
    h, w = level.gray_trg.shape
    zeros = jnp.zeros((h, w), jnp.float32)
    return jnp.stack(
        [
            level.gray_trg,
            level.depth_trg,
            level.gray_trg_gx,
            level.gray_trg_gy,
            level.depth_trg_gx,
            level.depth_trg_gy,
            zeros,
            zeros,
        ],
        axis=1,
    )


# (pack_target_planes4 — the packed f16-pair 4-channel kernel layout — was
# retired in round 4: a measured loser both times it was A/B'd on chip
# (68.3 vs 72.6 pairs/s, PERF.md lever 0b) and a second flag-gated variant
# of the flagship kernel call site that the tests mostly didn't run.)


# Use the Mosaic block-warp kernel for levels at least this large when
# running on TPU (smaller levels are cheap either way).
WARP_KERNEL_MIN_PIXELS = 30_000

# Test shim: apply the kernel's window mask on the XLA path too, so the CPU
# suite can measure the pose drift the kernel's coverage deviation causes at
# loop-closure-scale motion without TPU hardware (tests/test_warp_kernel.py).
EMULATE_KERNEL_WINDOW_MASK = False

# Exact-final banded re-gather runs as ONE dual-anchored kernel pass
# (warp_gather_masked_dual — min+max windows per tile in one grid
# traversal, one out-array write, no where-merge). Coverage is the union
# of both anchors over the full miss set. Sole path since round 5: the
# sequential min- then max-anchored composition lost its final on-chip
# A/B (53.87 vs 55.37 pairs/s at HEAD, after round-3's 50.82 vs 52.35)
# and was deleted; its stats parity stays pinned by the interpret-mode
# composition test (tests/test_warp_kernel_interpret.py), which rebuilds
# the sequential form from the primitive masked gathers.
#
# full_coverage sweeps (LC refinement, relocalization verify) likewise run
# as ONE triple-anchored kernel pass per GN sweep (warp_gather_masked_full:
# mean+min+max windows, identical-origin anchors sharing one DMA'd slot).
# Sole path since round 5: the sequential default-plus-two-re-gathers
# composition lost 29.52 vs 37.67 full-coverage aligns/s at HEAD (after
# round-4's 30.58 vs 37.53) at identical iteration signature and in-basin
# pose, and was deleted; gated by the interpret-mode union test and the
# on-chip pose-agreement test (tests/test_warp_kernel.py).
#
# (EXACT_FINAL_FULLPASS — a third exact-final variant recomputing the
# finest level's stats with one triple-anchored stats-only sweep — was
# retired in round 4 after losing its deduped-DMA re-A/B on chip:
# 52.41 vs 53.68 pairs/s at batch 4 and 52.27 vs 55.21 at batch 8, same
# session, VERDICT r3 #1b/#7.)


def _use_warp_kernel(shape) -> bool:
    import jax as _jax

    return (
        shape[0] * shape[1] >= WARP_KERNEL_MIN_PIXELS
        and _jax.default_backend() == "tpu"
    )


def _gather_rows(packed: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """The sweep's one gather. Measured on v5e (see PERF.md): XLA's gather is
    per-element priced (~5.3 cycles/element) for every structured form tried
    (flat takes, slice gathers, one-hot MXU selection all converge to the
    same cost), so a plain take of the 16-byte packed rows is optimal here;
    a block-local Mosaic kernel is the remaining headroom."""
    return jnp.take(packed, flat_idx, axis=0, mode="clip")


def _huber_weight(err: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """weightHuber (reference RegisterPhotoICP.h:544-554)."""
    e = jnp.abs(err)
    big = e >= reg
    safe_e = jnp.maximum(e, 1e-20)
    w = jnp.sqrt(jnp.maximum(2.0 * reg * e - reg * reg, 0.0)) / safe_e
    return jnp.where(big, w, 1.0)


def _warp_terms(level: LevelData, xyz, valid, pose, method: int):
    """Shared warp + residual computation for the error and H/g passes.

    Returns a dict of per-pixel masked terms.
    """
    h, w = level.gray_src.shape
    R = pose[:3, :3]
    t = pose[:3, 3]
    p = _mm(xyz, R.T) + t  # (N,3) — MXU, full f32
    dist, r_int, c_int, inb = sphere_project(p, h, w)
    visible = valid & inb
    flat = jnp.clip(r_int, 0, h - 1) * w + jnp.clip(c_int, 0, w - 1)

    out = {"p": p, "dist": dist, "flat": flat, "visible": visible}

    if method in (PHOTO_CONSISTENCY, PHOTO_DEPTH):
        gx = _gather(level.gray_trg_gx, flat)
        gy = _gather(level.gray_trg_gy, flat)
        salient_photo = (jnp.abs(gx) >= THRES_SALIENCY) | (jnp.abs(gy) >= THRES_SALIENCY)
        photo_ok = visible & salient_photo
        pixel1 = level.gray_src.reshape(-1)
        pixel2 = _gather(level.gray_trg, flat)
        diff = pixel2 - pixel1
        w_photo = _huber_weight(diff, STD_DEV_PHOTO) * (1.0 / STD_DEV_PHOTO)
        out.update(photo_ok=photo_ok, photo_wdiff=w_photo * diff, photo_w=w_photo, photo_g=(gx, gy))
    if method in (DEPTH_CONSISTENCY, PHOTO_DEPTH):
        depth2 = _gather(level.depth_trg, flat)
        dgx = _gather(level.depth_trg_gx, flat)
        dgy = _gather(level.depth_trg_gy, flat)
        salient_depth = (jnp.abs(dgx) >= THRES_SALIENCY) | (jnp.abs(dgy) >= THRES_SALIENCY)
        finite = jnp.isfinite(depth2)
        depth_ok = visible & finite & salient_depth
        if method == PHOTO_DEPTH:
            # the reference `continue` on failed photo saliency skips depth too
            depth_ok = depth_ok & out["photo_ok"] if "photo_ok" in out else depth_ok
        ddiff = depth2 - dist
        reg = STD_DEV_DEPTH * jnp.maximum(depth2, 1e-20)
        w_depth = _huber_weight(ddiff, reg) / reg
        out.update(depth_ok=depth_ok, depth_wdiff=w_depth * ddiff, depth_w=w_depth, depth_g=(dgx, dgy))
    return out


def error_sphere(level: LevelData, xyz, valid, pose, method: int):
    """errorPhotoICP_sphere (reference RegisterPhotoICP.h:2545-2739):
    sqrt(sum of squared weighted residuals / number of contributing terms)."""
    terms = _warp_terms(level, xyz, valid, pose, method)
    err2 = jnp.float32(0.0)
    n = jnp.int32(0)
    if method in (PHOTO_CONSISTENCY, PHOTO_DEPTH):
        m = terms["photo_ok"]
        err2 += jnp.sum(jnp.where(m, terms["photo_wdiff"] ** 2, 0.0))
        n += jnp.sum(m.astype(jnp.int32))
    if method in (DEPTH_CONSISTENCY, PHOTO_DEPTH):
        m = terms["depth_ok"]
        err2 += jnp.sum(jnp.where(m, terms["depth_wdiff"] ** 2, 0.0))
        n += jnp.sum(m.astype(jnp.int32))
    return jnp.sqrt(err2 / jnp.maximum(n, 1).astype(jnp.float32))


def _warp_jacobian(p: jnp.ndarray, dist: jnp.ndarray, angle_res_inv: float):
    """2x6 Jacobian of the spherical warp wrt the left-multiplied twist
    (reference RegisterPhotoICP.h:2995-3026): rows are (d col/d xi, d row/d xi)."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    dist_inv = 1.0 / jnp.maximum(dist, 1e-12)
    z_inv = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    z_inv2 = z_inv * z_inv
    d_atan = angle_res_inv / (1.0 + y * y * z_inv2)
    j_theta = jnp.stack(
        [jnp.zeros_like(x), d_atan * z_inv, -y * z_inv2 * d_atan], axis=-1
    )  # (N,3) d(col)/d(xyz)
    dist_inv2 = dist_inv * dist_inv
    x_dist_inv2 = x * dist_inv2
    d_asin = angle_res_inv / jnp.sqrt(jnp.maximum(1.0 - x * x_dist_inv2, 1e-12))
    j_phi = jnp.stack(
        [
            -d_asin * dist_inv * (1.0 - x * x_dist_inv2),
            d_asin * x_dist_inv2 * y * dist_inv,
            d_asin * x_dist_inv2 * z * dist_inv,
        ],
        axis=-1,
    )  # (N,3) d(row)/d(xyz)
    # chain with d(xyz)/d(xi) = [I | -skew(p)]  (jacobianT36, :2995-2997)
    def chain(j3):  # (N,3) -> (N,6)
        jw = jnp.stack(
            [
                p[:, 1] * j3[:, 2] - p[:, 2] * j3[:, 1],
                p[:, 2] * j3[:, 0] - p[:, 0] * j3[:, 2],
                p[:, 0] * j3[:, 1] - p[:, 1] * j3[:, 0],
            ],
            axis=-1,
        )  # row-vector j3 @ (-skew(p)) == p x j3
        return jnp.concatenate([j3, jw], axis=-1)

    return chain(j_theta), chain(j_phi), chain


def hess_grad_sphere(level: LevelData, xyz, valid, pose, method: int):
    """calcHessGrad_sphere (reference RegisterPhotoICP.h:2745-3228).

    Returns (H 6x6, g 6, sso, photo_err2_sum, n_photo, depth_err2_sum, n_depth).
    """
    h, w = level.gray_src.shape
    angle_res_inv = w / (2.0 * jnp.pi)
    terms = _warp_terms(level, xyz, valid, pose, method)
    p, dist = terms["p"], terms["dist"]
    j_col, j_row, chain = _warp_jacobian(p, dist, angle_res_inv)

    H = jnp.zeros((6, 6), jnp.float32)
    g = jnp.zeros((6,), jnp.float32)
    photo_err2 = jnp.float32(0.0)
    n_photo = jnp.int32(0)
    depth_err2 = jnp.float32(0.0)
    n_depth = jnp.int32(0)

    if method in (PHOTO_CONSISTENCY, PHOTO_DEPTH):
        gx, gy = terms["photo_g"]
        m = terms["photo_ok"]
        jac = terms["photo_w"][:, None] * (gx[:, None] * j_col + gy[:, None] * j_row)
        jac = jnp.where(m[:, None], jac, 0.0)
        res = jnp.where(m, terms["photo_wdiff"], 0.0)
        H = H + _mm(jac.T, jac)
        g = g + _mm(jac.T, res)
        photo_err2 = jnp.sum(res * res)
        n_photo = jnp.sum(m.astype(jnp.int32))
    if method in (DEPTH_CONSISTENCY, PHOTO_DEPTH):
        dgx, dgy = terms["depth_g"]
        m = terms["depth_ok"]
        # d(dist)/d(xyz) = p/dist, chained through [I | -skew(p)]
        j_dist = chain(p / jnp.maximum(dist, 1e-12)[:, None])
        jac = terms["depth_w"][:, None] * (
            dgx[:, None] * j_col + dgy[:, None] * j_row - j_dist
        )
        jac = jnp.where(m[:, None], jac, 0.0)
        res = jnp.where(m, terms["depth_wdiff"], 0.0)
        H = H + _mm(jac.T, jac)
        g = g + _mm(jac.T, res)
        depth_err2 = jnp.sum(res * res)
        n_depth = jnp.sum(m.astype(jnp.int32))

    sso = jnp.sum(terms["visible"].astype(jnp.float32)) / jnp.float32(h * w)
    return H, g, sso, photo_err2, n_photo, depth_err2, n_depth


def fused_sweep_sphere(
    gray_src_flat: jnp.ndarray,  # (N,) f32
    target_packed: jnp.ndarray,  # (H*W, 4) i32 rows (pack_target_channels)
    #                              or (H, 4|8, W) kernel planes (pack_target_planes*)
    shape: Tuple[int, int],
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    pose: jnp.ndarray,
    method: int,
    occlusion: int = 0,
    two_pass: bool = False,
    stats_only: bool = False,
):
    """One fused pass: error + Hessian + gradient + stats at `pose`.

    Computes exactly the same quantities as errorPhotoICP_sphere followed by
    calcHessGrad_sphere at the same pose (the reference evaluates both at every
    accepted pose; fusing halves the number of image sweeps), with a single
    packed gather of the six target channels.

    two_pass (kernel path only): re-gather the pixels whose targets fell
    outside the first pass's windows with a second kernel pass whose windows
    are placed from the missed subset — recovers nearly all of the kernel's
    coverage deviation at a kernel pass's cost instead of a full XLA gather
    (which is ~6x slower, PERF.md).

    stats_only: skip the Jacobian / Hessian / gradient work and return zero
    H and g — for the exact-final stats re-sweep, whose consumers (the LC /
    KF acceptance gates) only read the residual statistics; H/g at the
    accepted pose already exist from the optimization sweep.
    """
    h, w = shape
    angle_res_inv = w / (2.0 * jnp.pi)
    R = pose[:3, :3]
    t = pose[:3, 3]
    p = _mm(xyz, R.T) + t
    dist, r_int, c_int, inb = sphere_project(p, h, w)
    visible = valid & inb
    flat = jnp.clip(r_int, 0, h - 1) * w + jnp.clip(c_int, 0, w - 1)

    if target_packed.ndim == 3:  # (H, 4|8, W): Mosaic block-warp kernel path
        from rgbd360_tpu.ops.warp_gather import warp_gather

        rc = jnp.clip(r_int, 0, h - 1)
        cc = jnp.clip(c_int, 0, w - 1)
        # invalid pixels get identity coordinates so they don't distort the
        # kernel's per-tile window statistics
        src_rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        src_cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        r2d = jnp.where(visible.reshape(h, w), rc.reshape(h, w), src_rows)
        c2d = jnp.where(visible.reshape(h, w), cc.reshape(h, w), src_cols)
        if two_pass:
            from rgbd360_tpu.ops.warp_gather import warp_gather_masked_full

            # one triple-anchored traversal (mean+min+max windows per tile)
            # covers the union of all three window policies over the full
            # visible set — full coverage in a single grid pass
            planes_out, in_window = warp_gather_masked_full(
                target_packed, r2d, c2d, visible.reshape(h, w)
            )
        else:
            planes_out, in_window = warp_gather(target_packed, r2d, c2d)
        # 8xf32 channel planes (the only kernel layout since the packed
        # 4-channel retirement; _prep_operands asserts cdim == 8)
        gray2 = planes_out[0].reshape(-1)
        depth2 = planes_out[1].reshape(-1)
        ggx = planes_out[2].reshape(-1)
        ggy = planes_out[3].reshape(-1)
        dgx = planes_out[4].reshape(-1)
        dgy = planes_out[5].reshape(-1)
        visible = visible & in_window.reshape(-1)
    else:
        tgt = _gather_rows(target_packed, flat)  # (N, 4): the sweep's one gather
        gray2 = _bits_f32(tgt[:, CH_GRAY])
        depth2 = _bits_f32(tgt[:, CH_DEPTH])
        ggx, ggy = _unpack2_f16(tgt[:, CH_GG])
        dgx, dgy = _unpack2_f16(tgt[:, CH_DG])
        if EMULATE_KERNEL_WINDOW_MASK and h * w >= WARP_KERNEL_MIN_PIXELS:
            # Emulate the TPU routing faithfully: the hardware path gathers
            # through the kernel (and so masks out-of-window targets) ONLY
            # at levels with >= WARP_KERNEL_MIN_PIXELS pixels; the coarse
            # levels run the exact XLA gather unmasked. Masking the coarse
            # levels here too overstates the deviation — the coarse levels
            # pick the convergence basin, and an emulation that masks them
            # lands in a different basin than the real chip does
            # (|t| 0.20 vs 0.32 on the bundled pair's 27 cm motion).
            from rgbd360_tpu.ops.warp_gather import window_mask_reference

            src_rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            src_cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            vis2d = visible.reshape(h, w)
            r2d = jnp.where(vis2d, jnp.clip(r_int, 0, h - 1).reshape(h, w), src_rows)
            c2d = jnp.where(vis2d, jnp.clip(c_int, 0, w - 1).reshape(h, w), src_cols)
            if two_pass:
                # mirror the fused triple-anchored pass: all three window
                # policies placed from the SAME (full visible) active set
                mask = jnp.zeros_like(vis2d)
                for policy in ("mean", "min", "max"):
                    mask = mask | window_mask_reference(
                        r2d, c2d, active=vis2d, row_policy=policy
                    )
                mask = mask & vis2d
            else:
                mask = window_mask_reference(r2d, c2d)
            visible = visible & mask.reshape(-1)

    if occlusion:
        if occlusion >= 2:
            # dynamic-occlusion rejection (reference _sphereOcc2 :3789-3792,
            # thresDepthOutliers = 0.3 set by alignFrames360 :4525). The
            # filter runs BEFORE the z-buffer write in the reference, so a
            # moving/occluded outlier never occupies the buffer and cannot
            # displace a clean farther point landing on the same pixel.
            dynamic = visible & (jnp.abs(depth2 - dist) > THRES_DEPTH_OUTLIERS) & (depth2 > 0)
            visible = visible & ~dynamic
        # z-buffer: only the closest source point per target pixel survives
        # (reference _sphereOcc1 :3300-3304; scatter-max replaces the
        # sequential invDepthBuffer, ties all survive)
        dist_inv = jnp.where(visible, 1.0 / jnp.maximum(dist, 1e-12), 0.0)
        zbuf = jnp.zeros(h * w, jnp.float32).at[flat].max(dist_inv)
        visible = visible & (dist_inv >= jnp.take(zbuf, flat))

    if not stats_only:
        j_col, j_row, chain = _warp_jacobian(p, dist, angle_res_inv)

    H = jnp.zeros((6, 6), jnp.float32)
    g = jnp.zeros((6,), jnp.float32)
    err2 = jnp.float32(0.0)
    n_terms = jnp.int32(0)
    photo_err2 = jnp.float32(0.0)
    n_photo = jnp.int32(0)
    depth_err2 = jnp.float32(0.0)
    n_depth = jnp.int32(0)
    photo_ok = None

    if method in (PHOTO_CONSISTENCY, PHOTO_DEPTH):
        salient = (jnp.abs(ggx) >= THRES_SALIENCY) | (jnp.abs(ggy) >= THRES_SALIENCY)
        photo_ok = visible & salient
        diff = gray2 - gray_src_flat
        wgt = _huber_weight(diff, STD_DEV_PHOTO) * (1.0 / STD_DEV_PHOTO)
        res = jnp.where(photo_ok, wgt * diff, 0.0)
        if not stats_only:
            jac = wgt[:, None] * (ggx[:, None] * j_col + ggy[:, None] * j_row)
            jac = jnp.where(photo_ok[:, None], jac, 0.0)
            H = H + _mm(jac.T, jac)
            g = g + _mm(jac.T, res)
        photo_err2 = jnp.sum(res * res)
        n_photo = jnp.sum(photo_ok.astype(jnp.int32))
        err2 += photo_err2
        n_terms += n_photo
    if method in (DEPTH_CONSISTENCY, PHOTO_DEPTH):
        salient = (jnp.abs(dgx) >= THRES_SALIENCY) | (jnp.abs(dgy) >= THRES_SALIENCY)
        depth_ok = visible & jnp.isfinite(depth2) & salient
        if method == PHOTO_DEPTH:
            depth_ok = depth_ok & photo_ok  # reference `continue` semantics
        ddiff = depth2 - dist
        reg = STD_DEV_DEPTH * jnp.maximum(depth2, 1e-20)
        wgt = _huber_weight(ddiff, reg) / reg
        res = jnp.where(depth_ok, wgt * ddiff, 0.0)
        if not stats_only:
            j_dist = chain(p / jnp.maximum(dist, 1e-12)[:, None])
            jac = wgt[:, None] * (dgx[:, None] * j_col + dgy[:, None] * j_row - j_dist)
            jac = jnp.where(depth_ok[:, None], jac, 0.0)
            H = H + _mm(jac.T, jac)
            g = g + _mm(jac.T, res)
        depth_err2 = jnp.sum(res * res)
        n_depth = jnp.sum(depth_ok.astype(jnp.int32))
        err2 += depth_err2
        n_terms += n_depth

    error = jnp.sqrt(err2 / jnp.maximum(n_terms, 1).astype(jnp.float32))
    sso = jnp.sum(visible.astype(jnp.float32)) / jnp.float32(h * w)
    return error, H, g, sso, photo_err2, n_photo, depth_err2, n_depth


THRES_DEPTH_OUTLIERS = 0.3  # alignFrames360 sets this for Occ2 (:4525)


def _exact_final_missed_stats(
    gray_src_flat: jnp.ndarray,
    packed: jnp.ndarray,  # kernel-path target layout (H, 4|8, W)
    shape: Tuple[int, int],
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    pose: jnp.ndarray,
    method: int,
):
    """Residual statistics of ONLY the pixels the kernel's windows missed at
    `pose`: the in-window mask is recomputed in pure XLA
    (warp_gather.window_mask_reference mirrors the kernel's window selection
    exactly), then ONE dual-anchored masked kernel pass (min+max windows per
    tile, warp_gather_masked_dual) re-gathers just the missed set. Combined
    with the optimization sweep's own windowed sums (already evaluated at
    the accepted pose), this reproduces the three-pass exact-final stats at
    one extra kernel pass instead of two (sequential-composition parity
    pinned by tests/test_warp_kernel_interpret.py).

    Returns (photo_err2, n_photo, depth_err2, n_depth, n_extra_visible).
    """
    from rgbd360_tpu.ops.warp_gather import (
        warp_gather_masked_dual,
        window_mask_reference,
    )

    h, w = shape
    R = pose[:3, :3]
    t = pose[:3, 3]
    p = _mm(xyz, R.T) + t
    dist, r_int, c_int, inb = sphere_project(p, h, w)
    visible = valid & inb
    src_rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    src_cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    vis2d = visible.reshape(h, w)
    r2d = jnp.where(vis2d, jnp.clip(r_int, 0, h - 1).reshape(h, w), src_rows)
    c2d = jnp.where(vis2d, jnp.clip(c_int, 0, w - 1).reshape(h, w), src_cols)

    in_window = window_mask_reference(r2d, c2d)
    miss = vis2d & ~in_window
    planes_out, covered = warp_gather_masked_dual(packed, r2d, c2d, miss)

    # 8xf32 channel planes (cdim == 8 asserted in _prep_operands)
    gray2 = planes_out[0].reshape(-1)
    depth2 = planes_out[1].reshape(-1)
    ggx = planes_out[2].reshape(-1)
    ggy = planes_out[3].reshape(-1)
    dgx = planes_out[4].reshape(-1)
    dgy = planes_out[5].reshape(-1)

    extra = (visible & covered.reshape(-1)).astype(jnp.float32)
    n_extra = jnp.sum(extra)
    vis = visible & covered.reshape(-1)
    photo_err2 = jnp.float32(0.0)
    n_photo = jnp.int32(0)
    depth_err2 = jnp.float32(0.0)
    n_depth = jnp.int32(0)
    photo_ok = None
    if method in (PHOTO_CONSISTENCY, PHOTO_DEPTH):
        salient = (jnp.abs(ggx) >= THRES_SALIENCY) | (jnp.abs(ggy) >= THRES_SALIENCY)
        photo_ok = vis & salient
        diff = gray2 - gray_src_flat
        wgt = _huber_weight(diff, STD_DEV_PHOTO) * (1.0 / STD_DEV_PHOTO)
        res = jnp.where(photo_ok, wgt * diff, 0.0)
        photo_err2 = jnp.sum(res * res)
        n_photo = jnp.sum(photo_ok.astype(jnp.int32))
    if method in (DEPTH_CONSISTENCY, PHOTO_DEPTH):
        salient = (jnp.abs(dgx) >= THRES_SALIENCY) | (jnp.abs(dgy) >= THRES_SALIENCY)
        depth_ok = vis & jnp.isfinite(depth2) & salient
        if method == PHOTO_DEPTH:
            depth_ok = depth_ok & photo_ok
        ddiff = depth2 - dist
        reg = STD_DEV_DEPTH * jnp.maximum(depth2, 1e-20)
        wgt = _huber_weight(ddiff, reg) / reg
        res = jnp.where(depth_ok, wgt * ddiff, 0.0)
        depth_err2 = jnp.sum(res * res)
        n_depth = jnp.sum(depth_ok.astype(jnp.int32))
    return photo_err2, n_photo, depth_err2, n_depth, n_extra


def occlusion_mask_sphere(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    pose: jnp.ndarray,
    shape: Tuple[int, int],
    target_depth_flat: jnp.ndarray = None,
    occlusion: int = 1,
):
    """Visibility refinement for the occlusion-aware variants
    (reference errorPhotoICP_sphereOcc1 :3232-3370, _sphereOcc2 :3720-3860).

    Occ1: a z-buffer over target pixels — when several source points land on
    the same target pixel only the closest survives (the reference's
    sequential invDepthBuffer becomes a scatter-max; ties all survive, a
    benign deviation from its order-dependent overwrite).
    Occ2: first rejects dynamic/occluded points whose depth residual exceeds
    thresDepthOutliers (0.3 m) — BEFORE the z-buffer, as in the reference
    (:3789-3799), so an outlier never displaces a clean point — returning
    that mask separately (the reference's mask_dynamic_occlusion, :169).
    """
    h, w = shape
    R = pose[:3, :3]
    t = pose[:3, 3]
    p = _mm(xyz, R.T) + t
    dist, r_int, c_int, inb = sphere_project(p, h, w)
    visible = valid & inb
    flat = jnp.clip(r_int, 0, h - 1) * w + jnp.clip(c_int, 0, w - 1)
    dynamic = jnp.zeros_like(visible)
    if occlusion >= 2 and target_depth_flat is not None:
        depth2 = jnp.take(target_depth_flat, flat, mode="clip")
        dynamic = visible & (jnp.abs(depth2 - dist) > THRES_DEPTH_OUTLIERS) & (depth2 > 0)
        visible = visible & ~dynamic
    dist_inv = jnp.where(visible, 1.0 / jnp.maximum(dist, 1e-12), 0.0)
    zbuf = jnp.zeros(h * w, jnp.float32).at[flat].max(dist_inv)
    closest = visible & (dist_inv >= jnp.take(zbuf, flat))
    return closest, dynamic


def align_level_sphere(
    level: LevelData,
    pose0: jnp.ndarray,
    method: int,
    max_iters: int = MAX_ITERS,
    tol_update: float = TOL_UPDATE,
    tol_residual: float = TOL_RESIDUAL,
    min_depth: float = MIN_DEPTH,
    max_depth: float = MAX_DEPTH,
    occlusion: int = 0,
    exact_final: bool = False,
    full_coverage: bool = False,
):
    """One pyramid level of alignFrames360's Gauss-Newton loop
    (reference RegisterPhotoICP.h:4589-4772).

    The loop carries (pose, error, H, g, stats) all evaluated at the current
    accepted pose by a single fused sweep; each iteration takes one GN step
    and one fused sweep at the candidate pose. The evaluation sequence and
    accept/reject decisions are identical to the reference, which evaluates
    error and H/g in separate image passes.

    exact_final: when the Mosaic warp kernel drove the loop (its window
    masking drops out-of-window pixels — a coverage deviation that grows
    with motion, PERF.md), re-evaluate the returned stats at the accepted
    pose with a two-pass kernel sweep (the second pass re-gathers the
    pixels the first pass's windows missed) so reported error / residuals
    / Hessian / SSO follow the reference semantics to within the residual
    double-miss fraction (the acceptance gates downstream — LC's
    avDepthResidual<2, KF selection's >=0.9 — consume these numbers). A
    full XLA-path sweep would be exact but costs ~6x a kernel pass; it
    previously ate a third of end-to-end align time (PERF.md).
    """
    xyz, valid = sphere_xyz_lut(level.depth_src, min_depth, max_depth)
    gray_src_flat = level.gray_src.reshape(-1)
    shape = level.gray_src.shape
    if _use_warp_kernel(shape):
        packed = pack_target_planes8(level)
    else:
        packed = pack_target_channels(level)

    def sweep(pose):
        # full_coverage: large-motion callers (LC refinement, relocalization
        # verify) run the banded min/max-anchored re-gathers inside EVERY GN
        # sweep, not just at exact-final — the kernel's window mask then
        # loses almost no pixels even at loop-closure-scale motion
        # (VERDICT r2 #3; reference full-coverage semantics,
        # RegisterPhotoICP.h:2678-2687)
        return fused_sweep_sphere(
            gray_src_flat, packed, shape, xyz, valid, pose, method, occlusion,
            two_pass=full_coverage,
        )

    state0 = sweep(pose0)

    def cond(carry):
        _pose, _state, diff_error, upd_norm, it, ill = carry
        return (
            (it < max_iters)
            & (upd_norm > tol_update)
            & (diff_error > tol_residual)
            & jnp.logical_not(ill)
        )

    def body(carry):
        pose, state, diff_error, upd_norm, it, ill = carry
        error, H, g = state[0], state[1], state[2]
        ok = linalg6.spd_well_posed(H, jnp.float32(1.0))
        x, solve_ok = linalg6.solve6_sym(H + (~ok) * jnp.eye(6, dtype=H.dtype), g)
        ok = ok & solve_ok
        update = -x
        # compose in full f32 (_mm): the default bf16 matmul would quantize
        # every accepted pose ~10x coarser than tol_update itself
        new_pose = _mm(se3.exp_se3(update, pseudo=True), pose)
        new_state = sweep(new_pose)
        diff = error - new_state[0]
        accept = ok & (diff > tol_residual)
        pose = jnp.where(accept, new_pose, pose)
        state = jax.tree.map(lambda n, o: jnp.where(accept, n, o), new_state, state)
        it = it + accept.astype(jnp.int32)
        upd_norm = jnp.where(ok, jnp.linalg.norm(update), 0.0)
        return pose, state, jnp.where(ok, diff, 0.0), upd_norm, it, ill | ~ok

    carry0 = (
        pose0,
        state0,
        state0[0],  # diff_error initialized to the error (reference :4605)
        jnp.float32(jnp.sqrt(6.0)),  # |(1,1,1,1,1,1)|
        jnp.int32(0),
        jnp.bool_(False),
    )
    pose, state, _, _, it, ill = jax.lax.while_loop(cond, body, carry0)
    if exact_final and _use_warp_kernel(shape):
        # Exact-final stats: the acceptance-gate consumers (LC
        # avDepthResidual<2, KF >=0.9) read the residual statistics; H/g at
        # the accepted pose stay as the optimization sweep produced them
        # (windowed — they feed entropy/info-matrix uses,
        # tolerance-insensitive).
        if occlusion == 0:
            # fast path: the loop state's residual sums are already the
            # in-window contributions at the accepted pose; add ONLY the
            # missed pixels via the two masked re-gather passes (saves the
            # full third kernel pass the previous formulation re-ran)
            _e, H_s, g_s, sso_s, pe2_s, np_s, de2_s, nd_s = state
            m_pe2, m_np, m_de2, m_nd, n_extra = _exact_final_missed_stats(
                gray_src_flat, packed, shape, xyz, valid, pose, method
            )
            pe2 = pe2_s + m_pe2
            np2 = np_s + m_np
            de2 = de2_s + m_de2
            nd2 = nd_s + m_nd
            n_terms = jnp.maximum(np2 + nd2, 1).astype(jnp.float32)
            error = jnp.sqrt((pe2 + de2) / n_terms)
            sso = sso_s + n_extra / jnp.float32(shape[0] * shape[1])
            state = (error, H_s, g_s, sso, pe2, np2, de2, nd2)
        else:
            exact = fused_sweep_sphere(
                gray_src_flat, packed, shape, xyz, valid,
                pose, method, occlusion, two_pass=True, stats_only=True,
            )
            state = exact[:1] + state[1:3] + exact[3:]
    error, H, g, sso, pe2, np_, de2, nd = state
    av_photo = jnp.sqrt(pe2 / jnp.maximum(np_, 1).astype(jnp.float32))
    av_depth = jnp.sqrt(de2 / jnp.maximum(nd, 1).astype(jnp.float32))
    return pose, error, H, g, sso, av_photo, av_depth, it, ill


def align_frames360(
    src_pyrs,
    trg_pyrs,
    pose_guess: jnp.ndarray,
    method: int = PHOTO_DEPTH,
    *,
    max_iters: int = MAX_ITERS,
    min_depth: float = MIN_DEPTH,
    max_depth: float = MAX_DEPTH,
    occlusion: int = 0,
    need_stats: bool = True,
    full_coverage: bool = False,
) -> AlignResult:
    """Coarse-to-fine spherical alignment (reference RegisterPhotoICP.h:4519;
    occlusion 0/1/2 selects the plain, z-buffered, or dynamic-occlusion
    variants like the reference's `occlusion` parameter).

    src_pyrs/trg_pyrs come from build_pyramid_set(..., sphere_seam_mask=True).
    The python level loop unrolls inside one jit.

    need_stats: consumer-driven switch for the finest level's exact-final
    stats re-sweep (kernel path only). Callers that read the acceptance-gate
    quantities (avPhotoResidual / avDepthResidual / error / SSO — LC, KF
    selection, odometry, graph edge gating) keep the default True; pure
    pose consumers (calibration sweeps) may pass False and skip the cost.
    """
    n_levels = len(src_pyrs[0])
    pose = pose_guess
    iters = []
    ill_any = jnp.bool_(False)
    last = None
    for level_idx in range(n_levels - 1, -1, -1):
        level = make_level_data(src_pyrs, trg_pyrs, level_idx)
        pose_new, error, H, g, sso, av_p, av_d, it, ill = align_level_sphere(
            level, pose, method, max_iters=max_iters,
            min_depth=min_depth, max_depth=max_depth, occlusion=occlusion,
            # only the finest level's stats are reported, and only when the
            # caller consumes them; full-coverage loops already carry
            # banded-coverage stats at the accepted pose
            exact_final=(level_idx == 0 and need_stats and not full_coverage),
            full_coverage=full_coverage,
        )
        # An ill-posed system aborts the whole alignment, keeping the steps
        # accepted so far (reference :4682-4690); levels after an ill-posed
        # one leave the pose untouched.
        pose = jnp.where(ill_any, pose, pose_new)
        ill_any = ill_any | ill
        iters.append(it)
        last = (error, H, g, sso, av_p, av_d)
    error, H, g, sso, av_p, av_d = last
    return AlignResult(
        pose=pose,
        hessian=H,
        gradient=g,
        error=error,
        av_photo_residual=av_p,
        av_depth_residual=av_d,
        sso=sso,
        num_iterations=jnp.stack(iters),
        ill_posed=ill_any,
    )


# jitted entries for the OO facade (core/register_photoicp.py): the raw
# functions compose into other jits (align_spheres_jit, parallel/batch), but
# called EAGERLY on the axon backend every op pays a ~30 ms dispatch RPC —
# an unjitted align was minutes per pair instead of tens of milliseconds
align_frames360_jit = functools.partial(
    jax.jit, static_argnames=("method", "max_iters", "occlusion", "need_stats", "full_coverage")
)(align_frames360)


@functools.partial(
    jax.jit, static_argnames=("method", "max_iters", "occlusion", "need_stats", "full_coverage")
)
def align_frames360_packed(
    src_pyrs, trg_pyrs, pose_guess, method: int = PHOTO_DEPTH, *,
    max_iters: int = MAX_ITERS, occlusion: int = 0, need_stats: bool = True,
    full_coverage: bool = False,
):
    """align_frames360 plus a single flat f32 vector of every host-consumed
    output: [pose 16, hessian 36, gradient 6, error, av_photo, av_depth,
    sso, ill_posed, num_iterations (n_levels)].

    On the axon backend every device->host transfer pays a ~30 ms RPC
    (CLAUDE.md); the OO facade's per-accessor np.asarray calls made a single
    tracked SLAM frame spend ~100-150 ms just FETCHING scalars (pose,
    avDepthResidual, hessian, sso each a round trip — PERF.md round-4
    bisect). Packing them inside the jit makes the whole result one
    transfer. The structured AlignResult is still returned for device-side
    consumers."""
    res = align_frames360(
        src_pyrs, trg_pyrs, pose_guess, method, max_iters=max_iters,
        occlusion=occlusion, need_stats=need_stats, full_coverage=full_coverage,
    )
    flat = jnp.concatenate(
        [
            res.pose.reshape(-1).astype(jnp.float32),
            res.hessian.reshape(-1).astype(jnp.float32),
            res.gradient.reshape(-1).astype(jnp.float32),
            jnp.stack(
                [
                    res.error, res.av_photo_residual, res.av_depth_residual,
                    res.sso, res.ill_posed.astype(jnp.float32),
                ]
            ),
            res.num_iterations.astype(jnp.float32),
        ]
    )
    return res, flat
def build_pyramid_set_raw(
    rgb_bgr_u8: jnp.ndarray,
    depth: jnp.ndarray,
    n_levels: int,
    *,
    is_target: bool,
    sphere_seam_mask: bool,
    min_depth: float = MIN_DEPTH,
    max_depth: float = MAX_DEPTH,
):
    """build_pyramid_set taking the RAW panorama (u8 BGR + u16-mm or f32-m
    depth) with the gray and metre conversions fused inside the jit: the
    facade previously ran them as eager ops, and each eager op over the
    axon tunnel is a ~20-30 ms dispatch RPC per set_*_frame call (round-4
    SLAM bisect: the 24 ms 'speculative align dispatch' host block was
    these conversions, not the jit issue)."""
    from rgbd360_tpu.ops.image import gray_f32

    gray = gray_f32(rgb_bgr_u8)
    if depth.dtype == jnp.uint16:  # millimetres -> metres (buildPyramidRange)
        depth = depth.astype(jnp.float32) * 0.001
    return build_pyramid_set(
        gray,
        depth.astype(jnp.float32),
        n_levels,
        is_target=is_target,
        sphere_seam_mask=sphere_seam_mask,
        min_depth=min_depth,
        max_depth=max_depth,
    )


build_pyramid_set_raw_jit = functools.partial(
    jax.jit, static_argnames=("n_levels", "is_target", "sphere_seam_mask")
)(build_pyramid_set_raw)


@functools.partial(
    jax.jit,
    static_argnames=("method", "n_levels", "max_iters", "occlusion", "need_stats", "full_coverage"),
)
def align_spheres_jit(
    gray_src,
    depth_src_m,
    gray_trg,
    depth_trg_m,
    pose_guess,
    method: int = PHOTO_DEPTH,
    n_levels: int = 5,
    max_iters: int = MAX_ITERS,
    occlusion: int = 0,
    need_stats: bool = True,
    full_coverage: bool = False,
) -> AlignResult:
    """End-to-end jit: pyramids + gradients + coarse-to-fine alignment."""
    src_pyrs = build_pyramid_set(gray_src, depth_src_m, n_levels, is_target=False, sphere_seam_mask=True)
    trg_pyrs = build_pyramid_set(gray_trg, depth_trg_m, n_levels, is_target=True, sphere_seam_mask=True)
    return align_frames360(
        src_pyrs, trg_pyrs, pose_guess, method, max_iters=max_iters,
        occlusion=occlusion, need_stats=need_stats, full_coverage=full_coverage,
    )


def calc_entropy(hessian: jnp.ndarray) -> jnp.ndarray:
    """Differential entropy of the pose estimate (Kerl IROS13 formula,
    reference RegisterPhotoICP.h:4789-4797). log|cov| == -log|H|, so use
    the closed-form 6x6 Cholesky (ops/linalg6.py) instead of a generic
    inverse + slogdet — the generic LU path costs ~1 ms/op on TPU and this
    is called eagerly per pair (CLAUDE.md)."""
    dof = 6.0
    logdet_h, _ok = linalg6.logdet6_sym(hessian)
    return 0.5 * (dof * (1.0 + jnp.log(2.0 * jnp.pi)) - logdet_h)
