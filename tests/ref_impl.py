"""Independent NumPy transcription of the reference scalar semantics.

These functions re-state, in plain scalar-loop NumPy (float64), the pixel
semantics of the C++ reference so the fused JAX kernels can be parity-tested
against them on small inputs:

  * errorPhotoICP_sphere      (reference include/RegisterPhotoICP.h:2545-2739)
  * calcHessGrad_sphere       (reference include/RegisterPhotoICP.h:2745-3228)
  * buildPyramidRange         (:312-354), calcGradientXY (:365-398)
  * stitchImage               (reference include/Frame360.h:1098-1148)
  * interpolatedUndistort     (CLAMS discrete_depth_distortion_model.cpp:49-70)

Deliberately slow and simple — run them only on crops / coarse levels.
"""

from __future__ import annotations

import math

import numpy as np

MIN_DEPTH = 0.3
MAX_DEPTH = 6.0
STD_DEV_PHOTO = 6.0 / 255.0
STD_DEV_DEPTH = 0.2
THRES_SALIENCY = 0.01


def round_c(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def weight_huber(err: float, reg: float) -> float:
    e = abs(err)
    if e < reg:
        return 1.0
    return math.sqrt(2.0 * reg * e - reg * reg) / e


def build_sphere_lut(depth: np.ndarray):
    h, w = depth.shape
    angle_res = 2.0 * np.pi / w
    xyz = np.zeros((h * w, 3))
    valid = np.zeros(h * w, bool)
    half = 0.5 * h - 0.5
    for r in range(h):
        phi = (half - r) * angle_res
        for c in range(w):
            d = depth[r, c]
            i = r * w + c
            if MIN_DEPTH < d < MAX_DEPTH:
                theta = c * angle_res
                xyz[i] = [
                    d * math.sin(phi),
                    -d * math.cos(phi) * math.sin(theta),
                    -d * math.cos(phi) * math.cos(theta),
                ]
                valid[i] = True
    return xyz, valid


def error_sphere(level, xyz, valid, pose, method):
    """level: dict with gray_src, depth_src, gray_trg, depth_trg and the four
    target gradient images. method: 0 photo, 1 depth, 2 both."""
    gray_src = level["gray_src"]
    h, w = gray_src.shape
    angle_res_inv = w / (2.0 * np.pi)
    half = 0.5 * h - 0.5
    R, t = pose[:3, :3], pose[:3, 3]
    err2 = 0.0
    n = 0
    for i in range(h * w):
        if not valid[i]:
            continue
        p = R @ xyz[i] + t
        dist = np.linalg.norm(p)
        phi = math.asin(p[0] / dist)
        theta = math.atan2(p[1], p[2]) + np.pi
        ri = round_c(half - phi * angle_res_inv)
        ci = round_c(theta * angle_res_inv)
        if not (0 <= ri < h and 0 <= ci < w):
            continue
        if method in (0, 2):
            if (
                abs(level["gray_trg_gx"][ri, ci]) < THRES_SALIENCY
                and abs(level["gray_trg_gy"][ri, ci]) < THRES_SALIENCY
            ):
                continue  # skips the depth term too (reference :2690-2692)
            diff = level["gray_trg"][ri, ci] - gray_src.flat[i]
            wgt = weight_huber(diff, STD_DEV_PHOTO) / STD_DEV_PHOTO
            err2 += (wgt * diff) ** 2
            n += 1
        if method in (1, 2):
            depth2 = level["depth_trg"][ri, ci]
            if not np.isfinite(depth2):
                continue
            if (
                abs(level["depth_trg_gx"][ri, ci]) < THRES_SALIENCY
                and abs(level["depth_trg_gy"][ri, ci]) < THRES_SALIENCY
            ):
                continue
            ddiff = depth2 - dist
            reg = STD_DEV_DEPTH * depth2
            if reg <= 0:
                continue  # depth2 == 0 never survives the saliency test
            wgt = weight_huber(ddiff, reg) / reg
            err2 += (wgt * ddiff) ** 2
            n += 1
    return math.sqrt(err2 / max(n, 1))


def hess_grad_sphere(level, xyz, valid, pose, method):
    gray_src = level["gray_src"]
    h, w = gray_src.shape
    angle_res_inv = w / (2.0 * np.pi)
    half = 0.5 * h - 0.5
    R, t = pose[:3, :3], pose[:3, 3]
    H = np.zeros((6, 6))
    g = np.zeros(6)
    n_visible = 0
    for i in range(h * w):
        if not valid[i]:
            continue
        p = R @ xyz[i] + t
        dist = np.linalg.norm(p)
        dist_inv = 1.0 / dist
        phi = math.asin(p[0] * dist_inv)
        theta = math.atan2(p[1], p[2]) + np.pi
        ri = round_c(half - phi * angle_res_inv)
        ci = round_c(theta * angle_res_inv)
        if not (0 <= ri < h and 0 <= ci < w):
            continue
        n_visible += 1
        # jacobianT36 = [I | -skew(p)] ; jacobianProj23 rows (col', row')
        jT = np.hstack([np.eye(3), -skew(p)])
        z_inv = 1.0 / p[2]
        z_inv2 = z_inv * z_inv
        d_atan = angle_res_inv / (1.0 + p[1] * p[1] * z_inv2)
        j_col = np.array([0.0, d_atan * z_inv, -p[1] * z_inv2 * d_atan])
        dist_inv2 = dist_inv * dist_inv
        x_d2 = p[0] * dist_inv2
        d_asin = angle_res_inv / math.sqrt(1.0 - p[0] * x_d2)
        j_row = np.array(
            [
                -d_asin * dist_inv * (1.0 - p[0] * x_d2),
                d_asin * x_d2 * p[1] * dist_inv,
                d_asin * x_d2 * p[2] * dist_inv,
            ]
        )
        jw = np.vstack([j_col, j_row]) @ jT  # (2,6)
        if method in (0, 2):
            gx = level["gray_trg_gx"][ri, ci]
            gy = level["gray_trg_gy"][ri, ci]
            if abs(gx) < THRES_SALIENCY and abs(gy) < THRES_SALIENCY:
                continue
            diff = level["gray_trg"][ri, ci] - gray_src.flat[i]
            wgt = weight_huber(diff, STD_DEV_PHOTO) / STD_DEV_PHOTO
            jac = wgt * (gx * jw[0] + gy * jw[1])
            H += np.outer(jac, jac)
            g += jac * (wgt * diff)
        if method in (1, 2):
            depth2 = level["depth_trg"][ri, ci]
            if not np.isfinite(depth2):
                continue
            dgx = level["depth_trg_gx"][ri, ci]
            dgy = level["depth_trg_gy"][ri, ci]
            if abs(dgx) < THRES_SALIENCY and abs(dgy) < THRES_SALIENCY:
                continue
            ddiff = depth2 - dist
            reg = STD_DEV_DEPTH * depth2
            if reg <= 0:
                continue
            wgt = weight_huber(ddiff, reg) / reg
            j_dist = (p * dist_inv) @ jT
            jac = wgt * (dgx * jw[0] + dgy * jw[1] - j_dist)
            H += np.outer(jac, jac)
            g += jac * (wgt * ddiff)
    return H, g, n_visible / (h * w)


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], float)


def gradient_xy(src: np.ndarray):
    h, w = src.shape
    gx = np.zeros_like(src)
    gy = np.zeros_like(src)
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            cur = src[r, c]
            nxt, prv = src[r, c + 1], src[r, c - 1]
            if (cur > nxt and cur < prv) or (cur < nxt and cur > prv):
                gx[r, c] = 2.0 / (1.0 / (nxt - cur) + 1.0 / (cur - prv))
            nxt, prv = src[r + 1, c], src[r - 1, c]
            if (cur > nxt and cur < prv) or (cur < nxt and cur > prv):
                gy[r, c] = 2.0 / (1.0 / (nxt - cur) + 1.0 / (cur - prv))
    return gx, gy


def depth_pyramid_down(depth: np.ndarray):
    h, w = depth.shape
    out = np.zeros((h // 2, w // 2), depth.dtype)
    for r in range(0, h - 1, 2):
        for c in range(0, w - 1, 2):
            acc, n = 0.0, 0
            for i in range(2):
                for j in range(2):
                    z = depth[r + i, c + j]
                    if MIN_DEPTH < z < MAX_DEPTH:
                        acc += z
                        n += 1
            if n:
                out[r // 2, c // 2] = acc / n
    return out


def stitch_sensor(rgb, depth_mm, rt_inv, K, sphere_h, sphere_w, sensor_id):
    """One sensor's slice of the panorama (reference Frame360.h:1098-1148)."""
    size_h, size_w = rgb.shape[:2]
    out_rgb = np.zeros((sphere_h, sphere_w, 3), np.uint8)
    out_d = np.zeros((sphere_h, sphere_w), np.uint16)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    angle_pixel = 2.0 * np.pi / sphere_w
    off_phi = sphere_h / 2 - 0.5
    off_theta = -size_h * 15 / 2 + 0.5
    for row in range(sphere_h):
        phi = (off_phi - row) * angle_pixel
        vx = math.sin(phi)
        cphi = math.cos(phi)
        c0, c1 = (7 - sensor_id) * size_h, (8 - sensor_id) * size_h
        for col in range(c0, c1):
            theta = (col + off_theta) * angle_pixel
            v = np.array([vx, cphi * math.sin(theta), cphi * math.cos(theta)])
            p = rt_inv[:3, :3] @ v + rt_inv[:3, 3]
            u = fx * p[0] / p[2] + cx
            w_ = fy * p[1] / p[2] + cy
            if 0 <= u < size_w and 0 <= w_ < size_h:
                out_rgb[row, col] = rgb[int(w_), int(u)]
                d = depth_mm[int(w_), int(u)]
                obliq = math.sqrt(1 + ((u - cx) / fx) ** 2 + ((w_ - cy) / fy) ** 2)
                out_d[row, col] = np.uint16(float(d) * obliq)
    return out_rgb, out_d


def interpolated_undistort(z, model, v, u):
    """Scalar CLAMS correction for pixel (v,u) with depth z metres."""
    if z == 0:
        return z
    by, bx = v // model.bin_height, u // model.bin_width
    m = model.multipliers[by, bx]
    c = model.counts[by, bx]
    k = len(m)
    idx = min(k - 1, int(z / model.bin_depth))
    start = model.bin_depth * idx
    idx1 = idx if (z - start) < model.bin_depth / 2 else idx + 1
    idx0 = idx1 - 1
    if idx0 < 0 or idx1 >= k or c[idx0] < 50 or c[idx1] < 50:
        return z * m[idx]
    z0 = (idx0 + 1) * model.bin_depth - model.bin_depth * 0.5
    c1 = (z - z0) / model.bin_depth
    return z * ((1.0 - c1) * m[idx0] + c1 * m[idx1])


# ---------------------------------------------------------------------------
# pinhole path (reference errorPhotoICP :560-775 / calcHessGrad :776-1100),
# transcribed fresh from the C++ like the sphere functions above
# ---------------------------------------------------------------------------


def build_pinhole_lut(depth: np.ndarray, k_full: np.ndarray, level: int):
    """Backprojection LUT (reference :4272-4299): x=(c-ox)z/fx, y=(r-oy)z/fy,
    valid iff minDepth < z < maxDepth; intrinsics scaled by 2^-level."""
    h, w = depth.shape
    s = 1.0 / (2.0 ** level)
    fx, fy = k_full[0, 0] * s, k_full[1, 1] * s
    ox, oy = k_full[0, 2] * s, k_full[1, 2] * s
    xyz = np.zeros((h * w, 3))
    valid = np.zeros(h * w, bool)
    for r in range(h):
        for c in range(w):
            z = depth[r, c]
            i = r * w + c
            if MIN_DEPTH < z < MAX_DEPTH:
                xyz[i] = [(c - ox) * z / fx, (r - oy) * z / fy, z]
                valid[i] = True
    return xyz, valid


def _project_pinhole(p, fx, fy, ox, oy):
    inv_z = 1.0 / p[2]
    return round_c(p[1] * fy * inv_z + oy), round_c(p[0] * fx * inv_z + ox)


def error_pinhole(level, xyz, valid, pose, k_full, lvl, method):
    """errorPhotoICP (:560-775): NO saliency gates — the error pixel set is
    deliberately different from calcHessGrad's. Returns
    (photo_err2, n_photo, depth_err2, n_depth); note the reference's
    avPhotoResidual quirk divides the photo sum by the DEPTH count (:763)."""
    gray_src = level["gray_src"]
    h, w = gray_src.shape
    s = 1.0 / (2.0 ** lvl)
    fx, fy = k_full[0, 0] * s, k_full[1, 1] * s
    ox, oy = k_full[0, 2] * s, k_full[1, 2] * s
    R, t = pose[:3, :3], pose[:3, 3]
    photo_err2 = depth_err2 = 0.0
    n_photo = n_depth = 0
    for i in range(h * w):
        if not valid[i]:
            continue
        p = R @ xyz[i] + t
        ri, ci = _project_pinhole(p, fx, fy, ox, oy)
        if not (0 <= ri < h and 0 <= ci < w):
            continue
        if method in (0, 2):
            diff = level["gray_trg"][ri, ci] - gray_src.flat[i]
            wgt = weight_huber(diff, STD_DEV_PHOTO) / STD_DEV_PHOTO
            photo_err2 += (wgt * diff) ** 2
            n_photo += 1
        if method in (1, 2):
            depth2 = level["depth_trg"][ri, ci]
            if np.isfinite(depth2) and depth2 > 0:
                # (depth2 > 0: packed targets store invalid depth as 0, the
                # panorama convention — the reference's NaN-only isfinite
                # check maps to finite-and-positive here)
                ddiff = depth2 - p[2]
                reg = STD_DEV_DEPTH * p[2]
                wgt = weight_huber(ddiff, reg) / reg
                depth_err2 += (wgt * ddiff) ** 2
                n_depth += 1
    return photo_err2, n_photo, depth_err2, n_depth


def hess_grad_pinhole(level, xyz, valid, pose, k_full, lvl, method):
    """calcHessGrad (:776-1100): saliency-gated, with the PHOTO_DEPTH
    coupling — the photo-saliency `continue` (:997-1001) skips the pixel
    entirely and the depth-saliency `continue` (:1020-1024) skips the PHOTO
    accumulation too (the accumulation block sits after both tests); the
    depth accumulation additionally requires finite depth2 (:1090)."""
    gray_src = level["gray_src"]
    h, w = gray_src.shape
    s = 1.0 / (2.0 ** lvl)
    fx, fy = k_full[0, 0] * s, k_full[1, 1] * s
    ox, oy = k_full[0, 2] * s, k_full[1, 2] * s
    R, t = pose[:3, :3], pose[:3, 3]
    H = np.zeros((6, 6))
    g = np.zeros(6)
    for i in range(h * w):
        if not valid[i]:
            continue
        p = R @ xyz[i] + t
        inv_z = 1.0 / p[2]
        ri, ci = _project_pinhole(p, fx, fy, ox, oy)
        if not (0 <= ri < h and 0 <= ci < w):
            continue
        # 2x6 warp jacobian (:928-951): [du/dxi; dv/dxi] with the
        # translation block first, then the rotation block
        inv_z2 = inv_z * inv_z
        jw = np.array(
            [
                [fx * inv_z, 0.0, -fx * p[0] * inv_z2,
                 -fx * p[1] * p[0] * inv_z2,
                 fx * (1.0 + p[0] * p[0] * inv_z2),
                 -fx * p[1] * inv_z],
                [0.0, fy * inv_z, -fy * p[1] * inv_z2,
                 -fy * (1.0 + p[1] * p[1] * inv_z2),
                 fy * p[0] * p[1] * inv_z2,
                 fy * p[0] * inv_z],
            ]
        )
        j_photo = None
        w_err_photo = 0.0
        if method in (0, 2):
            ggx = level["gray_trg_gx"][ri, ci]
            ggy = level["gray_trg_gy"][ri, ci]
            if abs(ggx) < THRES_SALIENCY and abs(ggy) < THRES_SALIENCY:
                continue  # skips the depth term too
            diff = level["gray_trg"][ri, ci] - gray_src.flat[i]
            wgt = weight_huber(diff, STD_DEV_PHOTO) / STD_DEV_PHOTO
            w_err_photo = wgt * diff
            j_photo = wgt * (np.array([ggx, ggy]) @ jw)
        j_depth = None
        w_err_depth = 0.0
        if method in (1, 2):
            dgx = level["depth_trg_gx"][ri, ci]
            dgy = level["depth_trg_gy"][ri, ci]
            if abs(dgx) < THRES_SALIENCY and abs(dgy) < THRES_SALIENCY:
                continue  # ALSO skips the photo accumulation below
            depth2 = level["depth_trg"][ri, ci]
            if np.isfinite(depth2) and depth2 > 0:
                ddiff = depth2 - p[2]
                reg = STD_DEV_DEPTH * p[2]
                wgt = weight_huber(ddiff, reg) / reg
                w_err_depth = wgt * ddiff
                j_z = np.array([0.0, 0.0, 1.0, p[1], -p[0], 0.0])
                j_depth = wgt * (np.array([dgx, dgy]) @ jw - j_z)
        if j_photo is not None:
            H += np.outer(j_photo, j_photo)
            g += j_photo * w_err_photo
        if j_depth is not None:
            H += np.outer(j_depth, j_depth)
            g += j_depth * w_err_depth
    return H, g


# ---------------------------------------------------------------------------
# occlusion-aware spherical error paths (reference errorPhotoICP_sphereOcc1
# :3232-3370, errorPhotoICP_sphereOcc2 :3720-3860), transcribed fresh with
# their SEQUENTIAL z-buffer semantics
# ---------------------------------------------------------------------------

THRES_DEPTH_OUTLIERS = 0.3  # alignFrames360 sets this for the Occ2 sphere (:4525)


def error_sphere_occ(level, xyz, valid, pose, method, occlusion=1,
                     winners_only=False):
    """Sequential transcription of the Occ1/Occ2 error sweeps.

    invDepthBuffer is written in source-pixel order: a point is skipped iff
    an earlier point on the same target pixel was STRICTLY closer
    (:3300-3304 / :3795-3799); otherwise it overwrites the buffer. Occ1 keys
    the residual slots by TARGET pixel (:3322, :3339 — a closer point
    overwrites a displaced point's residual, so the final sums hold exactly
    the per-pixel winners), while Occ2 keys them by SOURCE pixel (:3816,
    :3832 — displaced points KEEP their residual slots in the sums). Counts
    increment per accepted-at-processing-time point and are never rolled
    back (Occ1 :3326/:3342; Occ2 counts every buffer-surviving point once,
    pre-saliency, :3802 — and its avPhotoResidual divides by that same
    depth count). Occ2 additionally rejects depth outliers
    |depth2 - dist| > thresDepthOutliers BEFORE the buffer write
    (:3789-3792), so an outlier never displaces a clean point; a NaN depth2
    passes that gate (fabs(NaN) > t is false).

    Returns (photo_err2, n_photo, depth_err2, n_depth) — raw sums as the
    reference's second accumulation loop computes them (:3348-3357 /
    :3839-3848); for occlusion=2 both counts are the single nValidDepthPts.

    winners_only=True keys the Occ2 residual slots by TARGET pixel like
    Occ1 does, which makes the final sums hold exactly the per-pixel
    z-buffer winners — the deterministic projection of the reference's
    (OpenMP-racy) semantics that the repo's scatter-max implements; the
    faithful by-source sums are an upper bound on it (displaced points
    only ever ADD residual slots). Counts are returned per the faithful
    semantics either way.
    """
    gray_src = level["gray_src"]
    h, w = gray_src.shape
    angle_res_inv = w / (2.0 * np.pi)
    half = 0.5 * h - 0.5
    R, t = pose[:3, :3], pose[:3, 3]
    residuals_photo = np.zeros(h * w)
    residuals_depth = np.zeros(h * w)
    inv_buf = np.zeros(h * w)
    n_photo = 0
    n_depth = 0
    for i in range(h * w):
        if not valid[i]:
            continue
        p = R @ xyz[i] + t
        dist = np.linalg.norm(p)
        dist_inv = 1.0 / dist
        phi = math.asin(p[0] * dist_inv)
        theta = math.atan2(p[1], p[2]) + np.pi
        ri = round_c(half - phi * angle_res_inv)
        ci = round_c(theta * angle_res_inv)
        if not (0 <= ri < h and 0 <= ci < w):
            continue
        ii = ri * w + ci
        if occlusion >= 2:
            depth2 = level["depth_trg"][ri, ci]
            ddiff = depth2 - dist
            if abs(ddiff) > THRES_DEPTH_OUTLIERS:
                continue  # :3789-3792 — before the buffer write
        if inv_buf[ii] > 0 and dist_inv < inv_buf[ii]:
            continue  # occluded by an earlier, closer point
        inv_buf[ii] = dist_inv
        if occlusion >= 2:
            n_depth += 1  # :3802 — unconditional, pre-saliency, pre-method
        if method in (0, 2):
            if (
                abs(level["gray_trg_gx"][ri, ci]) < THRES_SALIENCY
                and abs(level["gray_trg_gy"][ri, ci]) < THRES_SALIENCY
            ):
                continue  # skips the depth block too
            diff = level["gray_trg"][ri, ci] - gray_src.flat[i]
            wgt = weight_huber(diff, STD_DEV_PHOTO) / STD_DEV_PHOTO
            slot = ii if (occlusion == 1 or winners_only) else i
            residuals_photo[slot] = (wgt * diff) ** 2
            if occlusion == 1:
                n_photo += 1
        if method in (1, 2):
            depth2 = level["depth_trg"][ri, ci]
            if not np.isfinite(depth2):
                continue
            if (
                abs(level["depth_trg_gx"][ri, ci]) < THRES_SALIENCY
                and abs(level["depth_trg_gy"][ri, ci]) < THRES_SALIENCY
            ):
                continue
            ddiff = depth2 - dist
            reg = STD_DEV_DEPTH * depth2
            if reg <= 0:
                continue  # depth2 == 0 never survives the saliency test
            wgt = weight_huber(ddiff, reg) / reg
            slot = ii if (occlusion == 1 or winners_only) else i
            residuals_depth[slot] = (wgt * ddiff) ** 2
            if occlusion == 1:
                n_depth += 1
    if occlusion >= 2:
        n_photo = n_depth
    return residuals_photo.sum(), n_photo, residuals_depth.sum(), n_depth


# ---------------------------------------------------------------------------
# robot-frame pinhole path (reference calcPhotoICPError_robot :4905-5082 /
# calcHessianGradient_robot :5083-5270): the camera rides a rig with
# extrinsic camRt; the optimized twist lives on the ROBOT pose
# ---------------------------------------------------------------------------


def sweep_robot(level, xyz, valid, pose, cam_rt, k_full, lvl, method):
    """Scalar oracle for the robot-frame sweep (all-points branch).

    Faithful parts: warp relPoseCam = camRt^-1 pose camRt (:4923-4924),
    pinhole projection, NO saliency gates anywhere, photo residual, the
    Jacobian chain Proj23 @ R_cam^-1 @ [I | -skew(p_robot')] with p_robot'
    the ROBOT-frame warped point (:5163-5167), isfinite depth gate.

    Deviations replicated-by-intent (mirroring ops/photoicp_pinhole.py's
    documented choices): the reference's depth residual uses the SOURCE
    depth (depth2 - depth1, :5168/:5219) while its Jacobian corresponds to
    the WARPED z, and its jacobianRt_z is never assigned (:5236-5238 — the
    block expression's value is discarded, so the C++ reads uninitialized
    memory); this oracle uses the internally consistent pair the code
    plainly intends: residual depth2 - z', scale stdDevDepth*z', and
    jacobianRt_z = row 2 of the T36 chain. depth2 <= 0 target pixels are
    excluded like the pinhole error oracle (packed-invalid convention).

    Returns (photo_err2, n_photo, depth_err2, n_depth, H, g) — raw sums
    (calcPhotoICPError_robot returns the raw error2, :5080).
    """
    gray_src = level["gray_src"]
    h, w = gray_src.shape
    s = 1.0 / (2.0 ** lvl)
    fx, fy = k_full[0, 0] * s, k_full[1, 1] * s
    ox, oy = k_full[0, 2] * s, k_full[1, 2] * s
    r_cr, t_cr = cam_rt[:3, :3], cam_rt[:3, 3]
    photo_err2 = depth_err2 = 0.0
    n_photo = n_depth = 0
    H = np.zeros((6, 6))
    g = np.zeros(6)
    for i in range(h * w):
        if not valid[i]:
            continue
        p_robot = r_cr @ xyz[i] + t_cr
        pr2 = pose[:3, :3] @ p_robot + pose[:3, 3]
        q = r_cr.T @ (pr2 - t_cr)  # camera-frame warped point
        inv_z = 1.0 / q[2]
        ri = round_c(q[1] * fy * inv_z + oy)
        ci = round_c(q[0] * fx * inv_z + ox)
        if not (0 <= ri < h and 0 <= ci < w):
            continue
        # T36 = R_cam^-1 [I | -skew(pr2)]  (:5163-5167)
        T36 = np.zeros((3, 6))
        T36[:, :3] = np.eye(3)
        T36[:, 3:] = -np.array(
            [
                [0, -pr2[2], pr2[1]],
                [pr2[2], 0, -pr2[0]],
                [-pr2[1], pr2[0], 0],
            ]
        )
        T36 = r_cr.T @ T36
        inv_z2 = inv_z * inv_z
        proj23 = np.array(
            [
                [fx * inv_z, 0.0, -fx * q[0] * inv_z2],
                [0.0, fy * inv_z, -fy * q[1] * inv_z2],
            ]
        )
        jw = proj23 @ T36  # (2,6)
        if method in (0, 2):
            diff = level["gray_trg"][ri, ci] - gray_src.flat[i]
            wgt = weight_huber(diff, STD_DEV_PHOTO) / STD_DEV_PHOTO
            werr = wgt * diff
            photo_err2 += werr * werr
            n_photo += 1
            jac = wgt * (np.array([level["gray_trg_gx"][ri, ci],
                                   level["gray_trg_gy"][ri, ci]]) @ jw)
            H += np.outer(jac, jac)
            g += jac * werr
        if method in (1, 2):
            depth2 = level["depth_trg"][ri, ci]
            if np.isfinite(depth2) and depth2 > 0:
                ddiff = depth2 - q[2]
                reg = STD_DEV_DEPTH * q[2]
                wgt = weight_huber(ddiff, reg) / reg
                werr = wgt * ddiff
                depth_err2 += werr * werr
                n_depth += 1
                jac = wgt * (
                    np.array([level["depth_trg_gx"][ri, ci],
                              level["depth_trg_gy"][ri, ci]]) @ jw
                    - T36[2]
                )
                H += np.outer(jac, jac)
                g += jac * werr
    return photo_err2, n_photo, depth_err2, n_depth, H, g
