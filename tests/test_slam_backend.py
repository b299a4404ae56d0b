"""Pose-graph optimizer, topological partitioning, map bookkeeping."""

import numpy as np
import pytest

from rgbd360_tpu.core.graph_optimizer import GraphOptimizer, _exp_se3, _log_se3
from rgbd360_tpu.core.map360 import Map360
from rgbd360_tpu.core.topological import (
    TopologicalMap360,
    recursive_spectral_partition,
)


class FakeFrame:
    def __init__(self):
        self.id = 0
        self.node = 0
        self.pose = np.eye(4, dtype=np.float32)


def test_se3_log_exp_roundtrip(rng):
    xi = 0.5 * rng.normal(size=6)
    np.testing.assert_allclose(_log_se3(_exp_se3(xi)), xi, atol=1e-9)


def _circle_graph(n=12, radius=3.0, drift=0.02, rng=None):
    """Ground-truth poses on a circle (expressed in vertex-0's frame, since
    the optimizer gauges on vertex 0); odometry edges with injected drift and
    one loop-closure edge with the exact relative pose."""
    gt = []
    for k in range(n):
        th = 2 * np.pi * k / n
        T = np.eye(4)
        c, s = np.cos(th), np.sin(th)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = [radius * np.cos(th), radius * np.sin(th), 0]
        gt.append(T)
    g0_inv = np.linalg.inv(gt[0])
    gt = [g0_inv @ T for T in gt]
    odo = []
    for k in range(n - 1):
        z = np.linalg.inv(gt[k]) @ gt[k + 1]
        noise = _exp = None
        xi = drift * rng.normal(size=6)
        from rgbd360_tpu.core.graph_optimizer import _exp_se3

        odo.append(z @ _exp_se3(xi))
    return gt, odo


def test_graph_optimizer_closes_loop(rng):
    gt, odo = _circle_graph(rng=rng)
    opt = GraphOptimizer()
    # integrate drifty odometry for initial estimates
    pose = np.eye(4)
    opt.add_vertex(pose)
    for z in odo:
        pose = pose @ z
        opt.add_vertex(pose)
    for k, z in enumerate(odo):
        opt.add_edge(k, k + 1, z, np.eye(6))
    # loop closure: exact relative pose between last and first
    z_lc = np.linalg.inv(gt[-1]) @ gt[0]
    opt.add_edge(len(gt) - 1, 0, z_lc, 10 * np.eye(6))

    before = np.linalg.norm(opt.get_poses()[-1][:3, 3] - gt[-1][:3, 3])
    chi2 = opt.optimize_graph(iterations=20)
    after = np.linalg.norm(opt.get_poses()[-1][:3, 3] - gt[-1][:3, 3])
    assert np.isfinite(chi2)
    assert after < before * 0.5  # loop closure pulls the drift back
    # first vertex stays fixed
    np.testing.assert_allclose(opt.get_poses()[0], np.eye(4), atol=1e-12)


def test_graph_save(tmp_path, rng):
    gt, odo = _circle_graph(n=5, rng=rng)
    opt = GraphOptimizer()
    for g in gt[:5]:
        opt.add_vertex(g)
    for k, z in enumerate(odo[:4]):
        opt.add_edge(k, k + 1, z, np.eye(6))
    path = tmp_path / "graph.g2o"
    opt.save_graph(str(path))
    lines = path.read_text().splitlines()
    assert sum(l.startswith("VERTEX_SE3:QUAT") for l in lines) == 5
    assert sum(l.startswith("EDGE_SE3:QUAT") for l in lines) == 4


def test_spectral_partition_two_clusters():
    # two dense 5-cliques weakly connected
    n = 10
    A = np.zeros((n, n))
    A[:5, :5] = 0.9
    A[5:, 5:] = 0.9
    np.fill_diagonal(A, 0)
    A[4, 5] = A[5, 4] = 0.05
    parts = recursive_spectral_partition(A)
    assert len(parts) == 2
    assert sorted(map(sorted, parts)) == [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]


def test_spectral_partition_keeps_tight_cluster():
    A = np.ones((6, 6)) * 0.8
    np.fill_diagonal(A, 0)
    parts = recursive_spectral_partition(A)
    assert len(parts) == 1


def test_map_and_topology_bookkeeping():
    m = Map360()
    topo = TopologicalMap360(m)
    poses = []
    for k in range(10):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.5 * k
        kf = m.add_keyframe(FakeFrame(), T)
        topo.add_keyframe(m.current_area)
        poses.append(T)
        if k > 0:
            topo.add_connection(k - 1, k, 0.8)
    assert len(m) == 10
    assert m.trajectory_increments[-1] == pytest.approx(4.5)
    sso = topo.get_vicinity_sso({0})
    assert sso.shape == (10, 10)
    assert sso[3, 4] == pytest.approx(0.8)

    # two weakly-linked chains should split into two areas
    m2 = Map360()
    topo2 = TopologicalMap360(m2)
    for k in range(12):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 1.0 * k
        m2.add_keyframe(FakeFrame(), T)
        topo2.add_keyframe(m2.current_area)
    for a in range(6):
        for b in range(a + 1, 6):
            topo2.add_connection(a, b, 0.9)
            topo2.add_connection(a + 6, b + 6, 0.9)
    topo2.add_connection(5, 6, 0.05)
    changed = topo2.partitioner()
    assert changed
    nodes = [f.node for f in m2.frames]
    assert len(set(nodes)) == 2
    assert len(set(nodes[:6])) == 1 and len(set(nodes[6:])) == 1
    # representative keyframes elected per area
    for area in set(nodes):
        assert m2.selected_kfs[area] in m2.areas[area]
