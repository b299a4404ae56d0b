"""SphereGraphSLAM — full hybrid plane/dense pose-graph SLAM
(reference SLAM/SphereGraphSLAM.cpp:60-302 + SLAM/KFsphere_SLAM.cpp):
PbMap tracking against up to 5 previous keyframes with dense refinement,
topological SSO upkeep, loop-closure search, pose-graph optimization,
spectral partitioning every 4 keyframes. Like the reference app, every
successfully tracked frame becomes a keyframe (the residual-based keyframe
SELECTION lives in kf_sphere_slam/KFSphereSLAM).

Usage: python -m rgbd360_tpu.apps.sphere_graph_slam <dataset_dir>
       [--first 1] [--sample 1] [--out DIR] [--lc-thread]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from rgbd360_tpu.apps.common import (
    default_matcher_config,
    load_calib,
    rot_offset,
    sequence_frames,
)
from rgbd360_tpu.config import default_params
from rgbd360_tpu.core.graph_optimizer import GraphOptimizer
from rgbd360_tpu.core.loop_closure import LoopClosure360
from rgbd360_tpu.core.map360 import Map360
from rgbd360_tpu.core.matcher import PLANAR_ODOMETRY_3DOF
from rgbd360_tpu.core.register_photoicp import PHOTO_DEPTH, RegisterPhotoICP
from rgbd360_tpu.core.register_rgbd360 import RegisterRGBD360
from rgbd360_tpu.core.topological import TopologicalMap360
from rgbd360_tpu.utils.viz import save_trajectory

TRACK_BACK_KFS = 5  # reference SphereGraphSLAM.cpp:175-180
PARTITION_EVERY = 4  # reference KFsphere_SLAM.cpp:710


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset")
    ap.add_argument("--first", type=int, default=1)
    ap.add_argument("--sample", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--calib-root", default=None)
    ap.add_argument("--lc-thread", action="store_true",
                    help="run loop closure on a background thread (reference"
                         " behavior); default is synchronous/deterministic")
    ap.add_argument("--live-view", default=None, metavar="DIR",
                    help="serve a live map viewer (reference Map360_Visualizer"
                         " analogue): writes DIR/live.html + live.json and an"
                         " HTTP server; open the printed URL in a browser")
    ap.add_argument("--live-port", type=int, default=0,
                    help="live viewer port (0 = ephemeral)")
    args = ap.parse_args(argv)

    calib = load_calib(args.calib_root)
    cfg = default_matcher_config(args.calib_root)
    registerer = RegisterRGBD360(cfg)
    aligner = RegisterPhotoICP(n_pyr_levels=5)
    aligner.prewarm()  # overlap align compile/load with the first frames
    off = rot_offset()

    world = Map360()
    topo = TopologicalMap360(world)
    # robust=True: Huber-weighted pose-graph LM — guards against
    # false-positive loop closures the avDepthResidual<2.0 accept gate
    # lets through (an improvement over the reference, whose g2o
    # robustification is disabled)
    optimizer = GraphOptimizer(robust=True)
    loop_closer = LoopClosure360(world, optimizer, cfg)
    if args.lc_thread:
        loop_closer.start()

    current_pose = np.eye(4, dtype=np.float64)
    n_lc = 0
    viewer = None
    if args.live_view:
        from rgbd360_tpu.utils.live_viewer import LiveMapViewer

        viewer = LiveMapViewer(args.live_view, port=args.live_port,
                               title="SphereGraphSLAM live")
        print(f"live viewer: {viewer.url or args.live_view}")

    from rgbd360_tpu.core.plane_extraction import planes_pipeline

    # one-frame-lookahead extraction: frame N+1's plane program runs on the
    # device while the host does frame N's PbMap/graph work
    for frame_no, frame in planes_pipeline(
        sequence_frames(calib, args.dataset, args.first, args.sample,
                        defer_device=True)  # fused per-frame device program
    ):
        if len(world) == 0:
            world.add_keyframe(frame, current_pose)
            world.optimized_poses.append(current_pose.astype(np.float32))
            topo.add_keyframe(world.current_area)
            optimizer.add_vertex(current_pose)
            print(f"frame {frame_no}: first keyframe")
            continue

        # track against up to 5 most recent keyframes (:175-180)
        tracked = False
        for back in range(1, min(TRACK_BACK_KFS, len(world)) + 1):
            ref_id = len(world) - back
            ok = registerer.register_pbmap(
                world.frames[ref_id], frame, 25, PLANAR_ODOMETRY_3DOF
            )
            if not ok:
                continue
            rel_pb = registerer.get_pose().astype(np.float64)
            # dense refinement seeded by the PbMap estimate
            aligner.set_target_frame(
                world.frames[ref_id].sphere_rgb, world.frames[ref_id].sphere_depth_mm
            )
            aligner.set_source_frame(frame.sphere_rgb, frame.sphere_depth_mm)
            guess = off @ rel_pb @ np.linalg.inv(off)
            aligner.align_frames360(guess.astype(np.float32), PHOTO_DEPTH)
            rel = np.linalg.inv(off) @ aligner.get_optimal_pose().astype(np.float64) @ off
            # a diverged dense refinement must not become a keyframe pose /
            # graph edge (every other dense consumer gates its result: LC
            # accepts avDepthResidual < 2, odometry bounds the translation)
            if (
                aligner.av_depth_residual >= 2.0
                or np.linalg.norm(rel[:3, 3]) > default_params.max_translation_odometry
            ):
                print(
                    f"frame {frame_no}: DISCONTINUOUS dense refinement rejected "
                    f"(avDepth={aligner.av_depth_residual:.3f}, "
                    f"|t|={np.linalg.norm(rel[:3, 3]):.3f})"
                )
                continue
            info = aligner.get_hessian()
            sso = registerer.get_area_matched() / max(registerer.area_source, 1e-9)

            current_pose = world.trajectory_poses[ref_id].astype(np.float64) @ rel
            kf_id = world.add_keyframe(frame, current_pose)
            world.optimized_poses.append(current_pose.astype(np.float32))
            topo.add_keyframe(world.current_area)
            topo.add_connection(ref_id, kf_id, float(sso))
            world.add_connection(ref_id, kf_id, rel, info)
            optimizer.add_vertex(current_pose)
            optimizer.add_edge(ref_id, kf_id, rel, info)
            print(
                f"frame {frame_no}: kf {kf_id} tracked vs {ref_id} "
                f"|t|={np.linalg.norm(rel[:3,3]):.3f} avDepth={aligner.av_depth_residual:.3f}"
            )
            tracked = True
            break
        if not tracked:
            # relocalize against the whole map (reference Relocalizer360.h:78,
            # invoked from the tracking-lost path, KFsphere_SLAM.cpp:728+)
            from rgbd360_tpu.core.relocalizer import Relocalizer360

            relocalizer = Relocalizer360(world, cfg)
            reloc = relocalizer.relocalize(frame)
            if reloc is None:
                print(f"frame {frame_no}: TRACKING LOST (no PbMap match, no relocalization)")
                continue
            ref_id, rel_pb, rel_info = reloc
            current_pose = world.trajectory_poses[ref_id].astype(np.float64) @ rel_pb.astype(np.float64)
            kf_id = world.add_keyframe(frame, current_pose)
            world.optimized_poses.append(current_pose.astype(np.float32))
            topo.add_keyframe(world.current_area)
            # SSO entry like the tracked path writes — without it the
            # relocalized keyframe is an all-zero affinity row and the next
            # partition splits it away from the keyframe it registered to
            reloc_reg = relocalizer.registerer
            sso_reloc = reloc_reg.get_area_matched() / max(reloc_reg.area_source, 1e-9)
            topo.add_connection(ref_id, kf_id, float(sso_reloc))
            optimizer.add_vertex(current_pose)
            # the relocalized vertex must be CONSTRAINED: an edge-less vertex
            # has an all-zero Hessian block and wrecks the next optimization
            optimizer.add_edge(ref_id, kf_id, rel_pb.astype(np.float64), rel_info.astype(np.float64))
            world.add_connection(ref_id, kf_id, rel_pb, rel_info)
            print(f"frame {frame_no}: RELOCALIZED against kf {ref_id}")

        kf_id = len(world) - 1
        if args.lc_thread:
            loop_closer.notify_keyframe(kf_id)
        else:
            loop_closer.process_new_keyframe(kf_id)
        # drain the LC handoff (reference :251-271) — authoritative for BOTH
        # modes, so threaded loop closures also trigger optimization and are
        # counted (they previously never optimized the graph); the drain runs
        # under the map mutex so the LC thread's setdefault/write can't race
        # popitem into an orphaned dict
        drained = 0
        with world.mutex:
            while loop_closer.connections_lc:
                kf1, conns = loop_closer.connections_lc.popitem()
                for kf2, sso in conns.items():
                    topo.add_connection(kf1, kf2, float(sso))
                    drained += 1
        if drained:
            n_lc += drained
            with world.mutex:
                optimizer.optimize_graph()
                world.optimized_poses = [
                    p.astype(np.float32) for p in optimizer.get_poses()
                ]
            print(f"  {drained} loop closure(s); graph optimized")

        if len(world) % PARTITION_EVERY == 0:
            if topo.partitioner():
                print(f"  topology re-partitioned: {len(world.areas)} areas")
        if viewer is not None:
            viewer.update(world)

    if args.lc_thread:
        loop_closer.stop()
    if viewer is not None:
        viewer.update(world)
        viewer.close()
    print(f"map: {len(world)} keyframes, {len(world.areas)} areas, {n_lc} loop closures")
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        save_trajectory(os.path.join(args.out, "trajectory_slam.txt"), world.trajectory_poses)
        if world.optimized_poses:
            save_trajectory(os.path.join(args.out, "trajectory_optimized.txt"), world.optimized_poses)
        optimizer.save_graph(os.path.join(args.out, "pose_graph.g2o"))
        from rgbd360_tpu.utils.map_html import map_to_html

        map_to_html(
            os.path.join(args.out, "map.html"), world, title="SphereGraphSLAM map"
        )
        print(f"artifacts -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
