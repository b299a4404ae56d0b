"""LoadSphere / LoadFrame360 — inspect a raw spherical frame and export its
panorama + point cloud (reference Visualization/LoadSphere.cpp and
LoadFrame360.cpp, viewers replaced with artifact dumps).

Usage: python -m rgbd360_tpu.apps.load_sphere <frame.bin> --out DIR [--planes]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from rgbd360_tpu.apps.common import load_calib
from rgbd360_tpu.core.frame360 import Frame360
from rgbd360_tpu.utils.viz import save_pcd, save_ply, save_sphere_images


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("frame")
    ap.add_argument("--out", required=True)
    ap.add_argument("--planes", action="store_true")
    ap.add_argument("--calib-root", default=None)
    args = ap.parse_args(argv)

    calib = load_calib(args.calib_root)
    frame = Frame360(calib).build(args.frame)
    os.makedirs(args.out, exist_ok=True)
    save_sphere_images(frame, args.out, "sphere")
    xyz, rgb = frame.build_sphere_cloud_from_image()
    save_ply(os.path.join(args.out, "sphereCloud.ply"), np.asarray(xyz), np.asarray(rgb))
    save_pcd(os.path.join(args.out, "sphereCloud_0.pcd"), np.asarray(xyz), np.asarray(rgb))
    print(f"panorama {frame.sphere_rgb.shape}, cloud with "
          f"{int(np.isfinite(np.asarray(xyz)[...,0]).sum())} valid points -> {args.out}")
    if args.planes:
        pbmap = frame.get_planes()
        print(f"{len(pbmap)} planes, total area {frame.get_planar_area():.2f} m^2")
        for p in pbmap.planes:
            print(f"  plane {p.id}: area {p.area_hull:.2f} n {np.round(p.normal,3)} d {p.d:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
