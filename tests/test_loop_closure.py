"""Loop closure + relocalizer end-to-end on real frames: a hand-built map
puts the two bundled frames far apart in trajectory but close in space, so
the candidate scan fires and the full PbMap-gate + dense-refine pipeline
runs (reference LoopClosure360.h:108-378 semantics)."""

import numpy as np
import pytest

from rgbd360_tpu.core.graph_optimizer import GraphOptimizer
from rgbd360_tpu.core.loop_closure import LoopClosure360
from rgbd360_tpu.core.map360 import Map360
from rgbd360_tpu.core.relocalizer import Relocalizer360


@pytest.fixture(scope="module")
def lc_world(sample_frames):
    f1, f2 = sample_frames
    f1.get_planes()
    f2.get_planes()
    world = Map360()
    optimizer = GraphOptimizer()
    # kf0 = frame1 at origin
    world.add_keyframe(f1, np.eye(4, dtype=np.float32))
    optimizer.add_vertex(np.eye(4))
    # kf1 = frame2, pretend the rig wandered >6m of trajectory but returned
    # to within candidate distance of kf0
    pose2 = np.eye(4, dtype=np.float32)
    pose2[1, 3] = 0.26
    world.add_keyframe(f2, pose2)
    world.trajectory_increments[1] = 8.0  # fake the accumulated path length
    optimizer.add_vertex(pose2)
    return world, optimizer, f1, f2


def test_loop_closure_accepts_real_pair(lc_world):
    world, optimizer, f1, f2 = lc_world
    lc = LoopClosure360(world, optimizer)
    # soften the area gate: the sample pair's matched area (~6.3) is below
    # the SLAM-scale 15 threshold used for large maps
    import rgbd360_tpu.core.loop_closure as lc_mod

    old = lc_mod.MIN_AREA_MATCHED, lc_mod.MIN_MATCHES
    lc_mod.MIN_AREA_MATCHED, lc_mod.MIN_MATCHES = 3.0, 3
    try:
        n = lc.process_new_keyframe(1)
    finally:
        lc_mod.MIN_AREA_MATCHED, lc_mod.MIN_MATCHES = old
    assert n == 1
    # the accepted connection is recorded on the map, the optimizer and the
    # SSO handoff
    assert 0 in world.connection_kfs[1]
    rel, info = world.connection_kfs[1][0]
    assert 0.2 < np.linalg.norm(rel[:3, 3]) < 0.45
    assert np.isfinite(info).all()
    assert 1 in lc.connections_lc and 0 in lc.connections_lc[1]
    assert len(optimizer.edges) == 1
    # and the graph optimizes cleanly with it
    chi2 = optimizer.optimize_graph()
    assert np.isfinite(chi2)


def test_loop_closure_respects_trajectory_gap(sample_frames):
    f1, f2 = sample_frames
    world = Map360()
    world.add_keyframe(f1, np.eye(4, dtype=np.float32))
    pose2 = np.eye(4, dtype=np.float32)
    pose2[1, 3] = 0.26
    world.add_keyframe(f2, pose2)  # real increment ~0.26m < 6m gap
    lc = LoopClosure360(world, None)
    assert lc.process_new_keyframe(1) == 0  # nearby-in-trajectory: no LC


def test_relocalizer_finds_frame(lc_world):
    world, _, f1, f2 = lc_world
    # relocalize f2 against a map holding only f1 (a map containing f2
    # itself would trivially self-match at identity)
    solo = Map360()
    solo.add_keyframe(f1, np.eye(4, dtype=np.float32))
    reloc = Relocalizer360(solo)
    import rgbd360_tpu.core.relocalizer as r_mod

    old = r_mod.MIN_MATCHES, r_mod.MIN_AREA
    r_mod.MIN_MATCHES, r_mod.MIN_AREA = 3, 3.0
    try:
        hit = reloc.relocalize(f2)
    finally:
        r_mod.MIN_MATCHES, r_mod.MIN_AREA = old
    assert hit is not None
    kf_id, pose = hit
    assert kf_id == 0
    assert 0.2 < np.linalg.norm(pose[:3, 3]) < 0.45
