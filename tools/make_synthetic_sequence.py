"""Generate a synthetic .bin sphere sequence for end-to-end app runs.

The bundled reference dataset ships only two frames (samples/sphere_images_
{1,10}.bin), which exercises pair registration but not the SLAM loop. This
tool ray-casts the tests/room_scene.py textured box room through the real
8-sensor rig (shipped extrinsics) along a closed loop trajectory and writes
reference-wire-format archives (io/boost_archive.write_frame360_bin, the
byte-compatible Frame360.h:333-345 format), so every app that consumes
sphere_images_%d.bin directories (odometry, KF odometry, both SLAM apps,
load_sequence, labelize...) can run a full multi-frame session — keyframe
selection, nearby-KF connections, loop closure on trajectory re-entry,
partitioning — with known ground-truth poses for gating.

The loop: a radius-r circle in the ground (y-z) plane around the room
centre with tangential yaw, closing after --frames steps (circumference
2*pi*r > the 6 m loop-closure trajectory-gap gate at the default r=1.1).
Two interior pillars (off the rig's path) occlude the walls differently
from different viewpoints — the empty box is visible in full from
everywhere, so without them the keyframe criterion never trips and the
whole loop tracks against one keyframe.
Ground-truth rig poses are saved alongside as poses_gt.txt (one 4x4
row-major per line).

Usage: python tools/make_synthetic_sequence.py --out /tmp/room_seq
           [--frames 40] [--radius 1.1] [--start 1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def loop_pose(theta: float, radius: float, center=(0.0, 0.6, -0.3)) -> np.ndarray:
    """Rig pose on the circle: position on the ring, yawed about the
    vertical (x) axis so the rig turns with the tangent."""
    cx, cy, cz = center
    pose = np.eye(4)
    c, s = np.cos(theta), np.sin(theta)
    # yaw about x (the sphere convention's vertical: Frame360.h:589-592)
    pose[1, 1], pose[1, 2] = c, -s
    pose[2, 1], pose[2, 2] = s, c
    pose[1, 3] = cy + radius * np.sin(theta)
    pose[2, 3] = cz + radius * (np.cos(theta) - 1.0)
    pose[0, 3] = cx
    return pose


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--loops", type=float, default=1.0,
                    help="total turns around the circle (e.g. 1.4 revisits "
                         "the start with >6 m trajectory gap, triggering the "
                         "loop-closure gates)")
    ap.add_argument("--radius", type=float, default=1.1)
    ap.add_argument("--start", type=int, default=1, help="first frame number")
    ap.add_argument("--calib-root", default=os.environ.get("RGBD360_REFERENCE", "/root/reference"))
    args = ap.parse_args(argv)

    from room_scene import raycast_room_sensor

    # pillars clear of the default radius-1.1 circle around (y,z)=(0.6,-0.3)
    obstacles = (
        (-1.5, 0.5, 2.0, 2.6, -2.2, -1.6),
        (-1.5, 0.5, -1.8, -1.2, -1.4, -0.8),
    )

    from rgbd360_tpu.io.boost_archive import RawFrame360, write_frame360_bin
    from rgbd360_tpu.io.calib import Calib360

    calib = Calib360.load(args.calib_root)
    os.makedirs(args.out, exist_ok=True)

    poses = []
    for i in range(args.frames):
        theta = 2.0 * np.pi * args.loops * i / args.frames
        pose = loop_pose(theta, args.radius)
        poses.append(pose)
        rgbs, depths = [], []
        for s in range(8):
            rt = pose @ np.asarray(calib.Rt[s], np.float64)
            rgb, depth = raycast_room_sensor(rt, obstacles=obstacles)
            rgbs.append(rgb)
            depths.append(depth)
        raw = RawFrame360(
            rgb=np.stack(rgbs), depth=np.stack(depths),
            timestamp=10_000_000 * (i + 1),
        )
        path = os.path.join(args.out, f"sphere_images_{args.start + i}.bin")
        write_frame360_bin(path, raw)
        print(f"{path}  |t|={np.linalg.norm(pose[:3, 3]):.3f}")

    with open(os.path.join(args.out, "poses_gt.txt"), "w") as f:
        for pose in poses:
            f.write(" ".join(f"{v:.9g}" for v in pose.ravel()) + "\n")
    print(f"{args.frames} frames -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
