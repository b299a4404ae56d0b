"""KFsphere_SLAM — keyframe-selection SLAM over a sphere sequence
(reference SLAM/KFsphere_SLAM.cpp:60-793): strong-PbMap frame skipping,
dense avDepthResidual>=0.9 keyframe criterion, nearby-keyframe (<2.5 m)
connection scan with dual dense+PbMap edges, pose-graph optimization on new
loop closures, spectral partitioning every 4 keyframes.

Usage: python -m rgbd360_tpu.apps.kf_sphere_slam <dataset_dir>
       [--first 1] [--sample 1] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys


from rgbd360_tpu.apps.common import default_matcher_config, load_calib, sequence_frames
from rgbd360_tpu.core.kf_slam import KFSphereSLAM
from rgbd360_tpu.utils.viz import save_trajectory


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset")
    ap.add_argument("--first", type=int, default=1)
    ap.add_argument("--sample", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--calib-root", default=None)
    ap.add_argument("--save-map", default=None,
                    help="checkpoint the map (keyframes + state) to this dir")
    ap.add_argument("--live-view", default=None, metavar="DIR",
                    help="serve a live map viewer (reference Map360_Visualizer"
                         " analogue); open the printed URL in a browser")
    ap.add_argument("--live-port", type=int, default=0)
    ap.add_argument("--resume", default=None,
                    help="resume from a map saved with --save-map")
    args = ap.parse_args(argv)

    calib = load_calib(args.calib_root)
    world = optimizer = topo = None
    if args.resume:
        from rgbd360_tpu.core.map_io import load_map_full

        world, optimizer, topo = load_map_full(args.resume, calib)
        print(f"resumed map: {len(world)} keyframes from {args.resume}")
    slam = KFSphereSLAM(
        world=world,
        optimizer=optimizer,
        topo=topo,
        matcher_config=default_matcher_config(args.calib_root),
    )
    slam.aligner.prewarm()  # overlap align compile/load with the first frames
    viewer = None
    if args.live_view:
        from rgbd360_tpu.utils.live_viewer import LiveMapViewer

        viewer = LiveMapViewer(args.live_view, port=args.live_port,
                               title="KF-SLAM live")
        print(f"live viewer: {viewer.url or args.live_view}")

    n_frames = 0
    from rgbd360_tpu.core.plane_extraction import planes_pipeline

    for frame_no, frame in planes_pipeline(
        sequence_frames(calib, args.dataset, args.first, args.sample,
                        defer_device=True),  # fused per-frame device program
        pre_collect=slam.prefetch_align,  # overlap tracking align w/ planes
    ):
        status = slam.process_frame(frame)
        n_frames += 1
        if viewer is not None and status not in ("skip_pbmap", "skip_tracked"):
            viewer.update(slam.world)
        print(f"frame {frame_no}: {status}  (kf={slam.n_keyframes_selected}, "
              f"lc={slam.n_loop_closures}, nearest={slam.nearest_kf})")

    world = slam.world
    if viewer is not None:
        viewer.update(world)
        viewer.close()
    print(f"{n_frames} frames -> {len(world)} keyframes, {len(world.areas)} areas, "
          f"{slam.n_loop_closures} extra connections")
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        save_trajectory(os.path.join(args.out, "trajectory_kf_slam.txt"), world.trajectory_poses)
        if world.optimized_poses:
            save_trajectory(os.path.join(args.out, "trajectory_optimized.txt"), world.optimized_poses)
        slam.optimizer.save_graph(os.path.join(args.out, "pose_graph.g2o"))
        from rgbd360_tpu.utils.map_html import map_to_html

        map_to_html(
            os.path.join(args.out, "map.html"), world, title="KF-SLAM map"
        )
        print(f"artifacts -> {args.out}")
    if args.save_map:
        from rgbd360_tpu.core.map_io import save_map

        save_map(slam.world, args.save_map, slam.optimizer, topo=slam.topo)
        print(f"map checkpoint -> {args.save_map}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
