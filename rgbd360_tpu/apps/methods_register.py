"""MethodsRegisterRGBD360 — compare the registration methods on one pair
(reference Registration/MethodsRegisterRGBD360.cpp): plane-based PbMap,
dense spherical Photo+Depth (plain and occlusion-aware), projective
point-to-plane ICP, and the 8-camera robot-frame dense variant — all poses
reported in the cloud frame for direct comparison.

Usage: python -m rgbd360_tpu.apps.methods_register <a.bin> <b.bin>
"""

from __future__ import annotations

import argparse
import sys
import time

import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.apps.common import default_matcher_config, load_calib, rot_offset
from rgbd360_tpu.core.frame360 import Frame360
from rgbd360_tpu.core.matcher import PLANAR_3DOF
from rgbd360_tpu.core.register_photoicp import PHOTO_DEPTH, RegisterPhotoICP
from rgbd360_tpu.core.register_rgbd360 import RegisterRGBD360
from rgbd360_tpu.ops.icp import icp_point_to_plane_sphere


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("frame1")
    ap.add_argument("frame2")
    ap.add_argument("--calib-root", default=None)
    args = ap.parse_args(argv)

    calib = load_calib(args.calib_root)
    f1 = Frame360(calib, 0).build(args.frame1)
    f2 = Frame360(calib, 1).build(args.frame2)
    f1.get_planes()
    f2.get_planes()
    off = rot_offset()
    results = {}

    def record(name, pose_cloud, dt):
        t = np.asarray(pose_cloud)[:3, 3]
        results[name] = (t, dt)
        print(f"{name:26s} t = {np.round(t, 4)}  |t| = {np.linalg.norm(t):.4f}  ({dt:.2f}s)")

    # 1. PbMap plane-based
    reg = RegisterRGBD360(default_matcher_config(args.calib_root))
    t0 = time.time()
    ok = reg.register_pbmap(f1, f2, 25, PLANAR_3DOF)
    if ok:
        record("PbMap (PLANAR_3DoF)", reg.get_pose(), time.time() - t0)
    else:
        print("PbMap (PLANAR_3DoF): failed")

    # 2-3. dense spherical, plain and occlusion-aware
    aligner = RegisterPhotoICP(n_pyr_levels=5)
    aligner.set_target_frame(f1.sphere_rgb, f1.sphere_depth_mm)
    aligner.set_source_frame(f2.sphere_rgb, f2.sphere_depth_mm)
    for occ, name in ((0, "Dense Photo+Depth"), (1, "Dense Photo+Depth Occ1")):
        t0 = time.time()
        aligner.align_frames360(np.eye(4, dtype=np.float32), PHOTO_DEPTH, occlusion=occ)
        pose = np.linalg.inv(off) @ aligner.get_optimal_pose().astype(np.float64) @ off
        record(name, pose, time.time() - t0)

    # 4. projective point-to-plane ICP on the panoramas
    t0 = time.time()
    icp = icp_point_to_plane_sphere(
        f2.sphere_depth_mm.astype(jnp.float32) * 1e-3,
        f1.sphere_depth_mm.astype(jnp.float32) * 1e-3,
        jnp.eye(4),
    )
    pose = np.linalg.inv(off) @ np.asarray(icp.pose, np.float64) @ off
    record("Point-to-plane ICP", pose, time.time() - t0)

    # 5. 8-camera robot-frame dense
    t0 = time.time()
    ok = reg.register_dense_photoicp(f1, f2, method=PHOTO_DEPTH, n_levels=4)
    if ok:
        record("Dense 8-camera (robot)", reg.get_pose(), time.time() - t0)
    else:
        print("Dense 8-camera: ill-posed")

    # agreement summary
    ts = np.stack([t for t, _ in results.values()])
    spread = np.linalg.norm(ts - ts.mean(axis=0), axis=1).max()
    print(f"\nmax deviation from mean translation: {spread:.4f} m over {len(results)} methods")
    return 0


if __name__ == "__main__":
    sys.exit(main())
