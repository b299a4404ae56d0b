"""Error-vs-motion envelope for the kernel's out-of-window masking.

The Mosaic warp kernel masks targets outside its per-tile gather window
(ops/warp_gather.py:26-29) — a semantics deviation from the reference
(RegisterPhotoICP.h:2678-2687 gathers everywhere). PERF.md asserted the
deviation "shrinks quadratically with motion" from ONE data point (the
bundled pair's atypically large 27 cm motion, 76% coverage). This sweep
pins the claim: synthetic box-room panoramas at controlled motion
magnitudes, aligned with the kernel's window mask EMULATED (the
routing-faithful stand-in gated bit-exactly against the hardware mask by
tests/test_warp_kernel.py::test_kernel_mask_matches_emulation_on_tpu)
vs the exact full-coverage XLA path, both against ground truth.

Run:  python tools/sweep_window_mask_motion.py [--res H W] [--levels N]
The gated version of this sweep lives in tests/test_window_mask_motion.py;
the measured curve is recorded in PERF.md.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def unit_dirs(h: int, w: int) -> np.ndarray:
    """Panorama ray directions in the repo's sphere convention
    (ops/sphere.py: phi=(0.5H-0.5-row)*ares, theta=col*ares)."""
    ares = 2.0 * np.pi / w
    row = np.arange(h, dtype=np.float64)[:, None]
    col = np.arange(w, dtype=np.float64)[None, :]
    phi = (0.5 * h - 0.5 - row) * ares
    theta = col * ares
    x = np.broadcast_to(np.sin(phi), (h, w))
    y = -np.cos(phi) * np.sin(theta)
    z = -np.cos(phi) * np.cos(theta)
    return np.stack([x, y, z], axis=-1)


# asymmetric box (metres), camera orbits near the origin inside it
BOX = (-2.5, 2.1, -3.2, 2.8, -2.0, 2.6)


def render_sphere(pose: np.ndarray, h: int, w: int):
    """Ray-cast the box interior from camera pose (world_from_cam).
    Returns (gray f32 (h,w), depth f32 metres (h,w)) — spherical depth is
    radial distance, matching sphere_xyz_lut's xyz = depth * unit_dir."""
    dirs = unit_dirs(h, w) @ pose[:3, :3].T
    o = pose[:3, 3]
    x0, x1, y0, y1, z0, z1 = BOX
    lims = ((x0, x1), (y0, y1), (z0, z1))
    best = np.full((h, w), np.inf)
    hit = np.zeros((h, w, 3))
    fid_best = np.full((h, w), -1)
    fid = 0
    for ax in range(3):
        for val in lims[ax]:
            da = dirs[..., ax]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = (val - o[ax]) / da
            p = o[None, None, :] + s[..., None] * dirs
            inside = np.ones((h, w), bool)
            for ax2 in range(3):
                if ax2 == ax:
                    continue
                lo, hi = lims[ax2]
                inside &= (p[..., ax2] >= lo - 1e-9) & (p[..., ax2] <= hi + 1e-9)
            ok = (s > 0.05) & inside & (s < best)
            best = np.where(ok, s, best)
            fid_best = np.where(ok, fid, fid_best)
            hit = np.where(ok[..., None], p, hit)
            fid += 1
    a = hit[..., 0] + hit[..., 1]
    b = hit[..., 1] + hit[..., 2]
    c = hit[..., 0] + hit[..., 2]
    gray = (
        0.5
        + 0.18 * np.sin(3.1 * a + fid_best)
        + 0.15 * np.cos(4.3 * b + 2.0 * fid_best)
        + 0.08 * np.sin(9.7 * c)
        + 0.05 * np.sin(23.0 * a) * np.cos(17.0 * b)
    ).clip(0.0, 1.0)
    depth = np.where(np.isfinite(best), best, 0.0)
    return gray.astype(np.float32), depth.astype(np.float32)


def motion_pose(t_mag: float, rot_deg: float = 1.5) -> np.ndarray:
    """World pose of the source camera: |t| = t_mag along a mixed direction
    plus a small fixed yaw (rotation shifts columns ~uniformly and the wrap
    halo covers it; translation is what causes the depth-parallax window
    spread the mask deviation is about)."""
    d = np.array([0.55, 0.6, 0.58])
    d /= np.linalg.norm(d)
    a = np.deg2rad(rot_deg)
    pose = np.eye(4)
    pose[:3, :3] = np.array(
        [
            [np.cos(a), -np.sin(a), 0.0],
            [np.sin(a), np.cos(a), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    pose[:3, 3] = t_mag * d
    return pose


def finest_coverage(depth_src, pose_true: np.ndarray, h: int, w: int) -> float:
    """Finest-level kernel-window coverage of visible warped pixels at the
    true pose — fraction the kernel's window (incl. wrap halo) would cover,
    via the routing-faithful mask mirror the device path pins bit-exactly.
    The ONE definition of 'coverage' for both the recorded PERF.md curve and
    the gating test (tests/test_window_mask_motion.py imports this)."""
    import jax.numpy as jnp

    from rgbd360_tpu.ops import photoicp
    from rgbd360_tpu.ops.sphere import sphere_project, sphere_xyz_lut
    from rgbd360_tpu.ops.warp_gather import window_mask_reference

    xyz, valid = sphere_xyz_lut(depth_src, photoicp.MIN_DEPTH, photoicp.MAX_DEPTH)
    p = xyz @ jnp.asarray(pose_true[:3, :3].T, jnp.float32) + jnp.asarray(
        pose_true[:3, 3], jnp.float32
    )
    _, ri, ci, inb = sphere_project(p, h, w)
    vis = (valid & inb).reshape(h, w)
    src_r = np.broadcast_to(np.arange(h, dtype=np.int32)[:, None], (h, w))
    src_c = np.broadcast_to(np.arange(w, dtype=np.int32)[None, :], (h, w))
    r2d = jnp.where(vis, jnp.clip(ri, 0, h - 1).reshape(h, w), jnp.asarray(src_r))
    c2d = jnp.where(vis, jnp.clip(ci, 0, w - 1).reshape(h, w), jnp.asarray(src_c))
    mask = np.asarray(window_mask_reference(r2d, c2d))
    return float(mask[np.asarray(vis)].mean())


def sweep(h: int, w: int, n_levels: int, motions) -> list:
    import jax
    import jax.numpy as jnp

    from rgbd360_tpu.ops import photoicp, se3

    gt_gray, gt_depth = render_sphere(np.eye(4), h, w)  # target at identity

    def align(gs, ds, gt_, dt_, masked: bool):
        old = photoicp.EMULATE_KERNEL_WINDOW_MASK
        photoicp.EMULATE_KERNEL_WINDOW_MASK = masked

        try:
            @jax.jit  # fresh wrapper: retraces under the current mask flag
            def run():
                return photoicp.align_spheres_jit.__wrapped__(
                    gs, ds, gt_, dt_, jnp.eye(4),
                    method=photoicp.PHOTO_DEPTH, n_levels=n_levels,
                )

            res = run()
            jax.block_until_ready(res.pose)
            return res
        finally:
            photoicp.EMULATE_KERNEL_WINDOW_MASK = old

    rows = []
    for t_mag in motions:
        pose_true = motion_pose(t_mag)
        src_gray, src_depth = render_sphere(pose_true, h, w)
        gs, ds = jnp.asarray(src_gray), jnp.asarray(src_depth)
        gt_j, dt_j = jnp.asarray(gt_gray), jnp.asarray(gt_depth)

        coverage = finest_coverage(ds, pose_true, h, w)

        out = {}
        for name, masked in (("exact", False), ("masked", True)):
            t0 = time.time()
            res = align(gs, ds, gt_j, dt_j, masked)
            pose = np.asarray(res.pose, np.float64)
            t_err = float(np.linalg.norm(pose[:3, 3] - pose_true[:3, 3]))
            r_err = float(
                se3.rot_angle_deg(
                    jnp.asarray(pose[:3, :3]), jnp.asarray(pose_true[:3, :3])
                )
            )
            out[name] = dict(
                t_err=t_err, r_err=r_err,
                iters=np.asarray(res.num_iterations).tolist(),
                ill=bool(res.ill_posed), secs=time.time() - t0,
                pose=pose,
            )
        dt_mm = float(
            np.linalg.norm(out["masked"]["pose"][:3, 3] - out["exact"]["pose"][:3, 3])
        )
        rows.append(dict(t_mag=t_mag, coverage=coverage, dvs=dt_mm, **out))
        print(
            f"|t|={t_mag * 100:5.1f} cm  cov={coverage:.4f}  "
            f"exact: terr={out['exact']['t_err'] * 1000:7.2f} mm "
            f"rerr={out['exact']['r_err']:.3f}deg it={out['exact']['iters']}  "
            f"masked: terr={out['masked']['t_err'] * 1000:7.2f} mm "
            f"rerr={out['masked']['r_err']:.3f}deg it={out['masked']['iters']}  "
            f"masked-vs-exact={dt_mm * 1000:6.2f} mm  "
            f"({out['exact']['secs']:.0f}s/{out['masked']['secs']:.0f}s)",
            flush=True,
        )
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", nargs=2, type=int, default=[192, 768])
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument(
        "--motions", nargs="*", type=float, default=[0.05, 0.10, 0.20, 0.30]
    )
    # CPU by default (the curve uses the routing-faithful mask mirror, which
    # is backend-independent); --tpu runs the same sweep on the real chip
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    sweep(args.res[0], args.res[1], args.levels, args.motions)
