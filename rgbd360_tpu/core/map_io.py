"""Map360 persistence — SLAM state checkpoint/resume.

The reference's checkpoint story is per-keyframe files (sphereCloud_%u.pcd +
spherePlanes_%u.pbmap, reference include/Frame360.h:313-330) plus trajectory
and g2o text dumps; apps restart from files (SURVEY.md §5 checkpoint/resume).
This module rounds that out into a resumable map: save_map writes every
keyframe (via Frame360.save) plus one map_state.npz holding poses,
increments, connections, areas and the pose graph; load_map reconstructs a
Map360 + GraphOptimizer that the SLAM apps can keep appending to.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from rgbd360_tpu.core.frame360 import Frame360
from rgbd360_tpu.core.graph_optimizer import GraphOptimizer
from rgbd360_tpu.core.map360 import Map360


def save_map(world: Map360, out_dir: str, optimizer: GraphOptimizer = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with world.mutex:
        for kf_id, frame in enumerate(world.frames):
            frame.save(out_dir, kf_id)
        conn_rows = []  # (kf1, kf2) -> pose (16) + info (36)
        for kf1, conns in world.connection_kfs.items():
            for kf2, (rel, info) in conns.items():
                conn_rows.append(
                    np.concatenate(
                        [[kf1, kf2], np.asarray(rel, np.float64).ravel(),
                         np.asarray(info, np.float64).ravel()]
                    )
                )
        np.savez_compressed(
            os.path.join(out_dir, "map_state.npz"),
            n_keyframes=len(world.frames),
            trajectory_poses=np.stack(world.trajectory_poses) if world.frames else np.zeros((0, 4, 4)),
            optimized_poses=np.stack(world.optimized_poses) if world.optimized_poses else np.zeros((0, 4, 4)),
            trajectory_increments=np.asarray(world.trajectory_increments),
            connections=np.stack(conn_rows) if conn_rows else np.zeros((0, 54)),
            areas=np.array([sorted(a) for a in world.areas], dtype=object),
            neighbor_areas=np.array([sorted(a) for a in world.neighbor_areas], dtype=object),
            selected_kfs=np.asarray(world.selected_kfs, np.int64),
            current_area=world.current_area,
        )
    if optimizer is not None:
        optimizer.save_graph(os.path.join(out_dir, "pose_graph.g2o"))


def load_map(out_dir: str, calib) -> Tuple[Map360, GraphOptimizer]:
    world = Map360()
    optimizer = GraphOptimizer()
    with np.load(os.path.join(out_dir, "map_state.npz"), allow_pickle=True) as z:
        n = int(z["n_keyframes"])
        areas = [set(int(i) for i in a) for a in z["areas"]]
        neighbor_areas = [set(int(i) for i in a) for a in z["neighbor_areas"]]
        for kf_id in range(n):
            frame = Frame360.load_keyframe(calib, out_dir, kf_id)
            pose = z["trajectory_poses"][kf_id]
            world.current_area = next(
                (a for a, s in enumerate(areas) if kf_id in s), 0
            )
            while len(world.areas) <= world.current_area:
                world.areas.append(set())
                world.neighbor_areas.append(set())
                world.selected_kfs.append(0)
            world.add_keyframe(frame, pose)
            optimizer.add_vertex(pose.astype(np.float64))
        world.trajectory_increments = [float(x) for x in z["trajectory_increments"]]
        world.optimized_poses = [p.astype(np.float32) for p in z["optimized_poses"]]
        world.areas = areas
        world.neighbor_areas = neighbor_areas
        world.selected_kfs = [int(x) for x in z["selected_kfs"]]
        world.current_area = int(z["current_area"])
        for row in z["connections"]:
            kf1, kf2 = int(row[0]), int(row[1])
            rel = row[2:18].reshape(4, 4)
            info = row[18:54].reshape(6, 6)
            world.connection_kfs.setdefault(kf1, {})[kf2] = (
                rel.astype(np.float32),
                info.astype(np.float32),
            )
            optimizer.add_edge(kf2, kf1, rel, info)
    return world, optimizer
