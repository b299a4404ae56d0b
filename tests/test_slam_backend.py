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


def test_batched_prefilter_is_a_relaxation(sample_frames):
    """core/batch_match.py must never reject a candidate the exact matcher
    would accept: its count/area upper bounds dominate the tree search's
    matched count and matched (reference-side) area on the real pair."""
    from rgbd360_tpu.core.batch_match import prefilter_candidates
    from rgbd360_tpu.core.matcher import PLANAR_3DOF
    from rgbd360_tpu.core.register_rgbd360 import RegisterRGBD360

    f1, f2 = sample_frames
    f1.get_planes()
    f2.get_planes()
    reg = RegisterRGBD360()
    ok = reg.register_pbmap(f1, f2, 25, PLANAR_3DOF)
    assert ok
    exact_matches = len(reg.get_matched_planes())
    exact_area = reg.get_area_matched()

    counts, areas = prefilter_candidates(
        f2.planes, [f1.planes], reg.matcher.config, PLANAR_3DOF
    )
    assert counts[0] >= exact_matches
    assert areas[0] >= exact_area - 1e-6


def test_relocalizer_prefilter_matches_bruteforce(sample_frames):
    """The batched relocalizer returns the same keyframe as the sequential
    newest-first scan (reference Relocalizer360.h:78-93 semantics)."""
    import rgbd360_tpu.core.relocalizer as reloc_mod
    from rgbd360_tpu.core.map360 import Map360
    from rgbd360_tpu.core.matcher import PLANAR_3DOF
    from rgbd360_tpu.core.relocalizer import Relocalizer360

    f1, f2 = sample_frames
    f1.get_planes()
    f2.get_planes()
    world = Map360()
    world.add_keyframe(f1, np.eye(4, dtype=np.float32))

    old = reloc_mod.MIN_MATCHES, reloc_mod.MIN_AREA
    reloc_mod.MIN_MATCHES, reloc_mod.MIN_AREA = 3, 3.0
    try:
        r = Relocalizer360(world)
        batched = r.relocalize(f2)
        # brute force: sequential scan without the prefilter
        brute = None
        for kf_id in range(len(world.frames) - 1, -1, -1):
            ok = r.registerer.register_pbmap(world.frames[kf_id], f2, 25, PLANAR_3DOF)
            if (
                ok
                and len(r.registerer.get_matched_planes()) >= reloc_mod.MIN_MATCHES
                and r.registerer.get_area_matched() > reloc_mod.MIN_AREA
            ):
                brute = kf_id
                break
    finally:
        reloc_mod.MIN_MATCHES, reloc_mod.MIN_AREA = old

    assert batched is not None and batched[0] == brute


def test_se2_circle_graph_closes():
    """rigidity=3 (SE2) pose graph: a drifting 12-pose circle with a
    loop-closure edge snaps closed (reference GraphOptimizer.h:84-208,
    g2o types_slam2d path)."""
    from rgbd360_tpu.core.graph_optimizer import GraphOptimizer

    rng = np.random.default_rng(3)
    n = 12
    step = 2 * np.pi / n
    opt = GraphOptimizer(rigidity=3)

    def v2t(a, b, th):
        c, s = np.cos(th), np.sin(th)
        T = np.eye(4)
        T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
        T[0, 3], T[1, 3] = a, b
        return T

    # ground truth: unit-radius circle
    truth = [v2t(np.cos(k * step), np.sin(k * step), k * step + np.pi / 2) for k in range(n)]
    # odometry with drift noise
    info = np.eye(6) * 100.0
    poses = [truth[0]]
    for k in range(1, n):
        rel = np.linalg.inv(truth[k - 1]) @ truth[k]
        noisy = rel.copy()
        noisy[0, 3] += rng.normal(scale=0.03)
        noisy[1, 3] += rng.normal(scale=0.03)
        poses.append(poses[-1] @ noisy)
    for p in poses:
        opt.add_vertex(p)
    for k in range(1, n):
        rel = np.linalg.inv(truth[k - 1]) @ truth[k]
        opt.add_edge(k - 1, k, rel, info)
    # loop closure: last -> first
    rel_lc = np.linalg.inv(truth[n - 1]) @ truth[0]
    opt.add_edge(n - 1, 0, rel_lc, info)

    drift_before = np.linalg.norm(poses[-1][:2, 3] - truth[-1][:2, 3])
    chi2 = opt.optimize_graph(iterations=30)
    out = opt.get_poses()
    drift_after = max(
        np.linalg.norm(out[k][:2, 3] - truth[k][:2, 3]) for k in range(n)
    )
    assert np.isfinite(chi2)
    assert drift_after < drift_before * 0.5
    assert drift_after < 0.08
    # poses remain planar 4x4 (z untouched, rotation about z)
    for p in out:
        assert abs(p[2, 3]) < 1e-12 and abs(p[2, 2] - 1) < 1e-12


def test_se2_planar_axis_x():
    """planar_axis='x' — the panorama up axis the PLANAR_3DoF modes use."""
    from rgbd360_tpu.core.graph_optimizer import GraphOptimizer

    opt = GraphOptimizer(rigidity=3, planar_axis="x")

    def v2t_x(a, b, th):
        c, s = np.cos(th), np.sin(th)
        T = np.eye(4)
        T[1, 1], T[1, 2], T[2, 1], T[2, 2] = c, -s, s, c
        T[1, 3], T[2, 3] = a, b
        return T

    truth = [np.eye(4), v2t_x(1.0, 0.0, 0.4), v2t_x(1.5, 0.8, 0.9)]
    info = np.eye(6) * 50
    bad = truth[2].copy()
    bad[1, 3] += 0.2
    for p in (truth[0], truth[1], bad):
        opt.add_vertex(p)
    opt.add_edge(0, 1, np.linalg.inv(truth[0]) @ truth[1], info)
    opt.add_edge(1, 2, np.linalg.inv(truth[1]) @ truth[2], info)
    opt.add_edge(0, 2, np.linalg.inv(truth[0]) @ truth[2], info)
    opt.optimize_graph(iterations=20)
    out = opt.get_poses()
    np.testing.assert_allclose(out[2], truth[2], atol=1e-6)


def _linked_topology(n_kf=18):
    """Map of 18 KFs forming three 6-cliques chained weakly."""
    m = Map360()
    topo = TopologicalMap360(m)
    for k in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 1.0 * k
        m.add_keyframe(FakeFrame(), T)
        topo.add_keyframe(m.current_area)
    for g in range(3):
        lo = 6 * g
        for a in range(lo, lo + 6):
            for b in range(a + 1, lo + 6):
                topo.add_connection(a, b, 0.9)
    topo.add_connection(5, 6, 0.05)
    topo.add_connection(11, 12, 0.05)
    return m, topo


def test_partitioner_with_vicinity_subset_of_map():
    """Regression: repartitioning a vicinity that is a strict subset of the
    map's areas must not index past m.areas (it crashed with IndexError)."""
    m, topo = _linked_topology()
    assert topo.partitioner()  # first split: 18 kfs -> 3 areas
    assert len({f.node for f in m.frames}) == 3

    # grow one area with new weakly-coupled keyframes so only ITS vicinity
    # repartitions while the other areas sit outside
    area_last = m.frames[17].node
    m.current_area = area_last
    new_ids = []
    for k in range(6):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 100.0 + k
        kf = m.add_keyframe(FakeFrame(), T)
        m.frames[kf].node = area_last
        m.areas[area_last].add(kf)
        topo.add_keyframe(area_last)
        new_ids.append(kf)
    for a in new_ids:
        for b in new_ids:
            if a < b:
                topo.add_connection(a, b, 0.9)
    topo.add_connection(17, new_ids[0], 0.05)
    assert topo.partitioner()  # must not raise
    # the split created a fresh area beyond the old list length
    assert len(m.areas) >= 4
    for kf in new_ids:
        assert kf in m.areas[m.frames[kf].node]


def test_partitioner_sso_rows_follow_local_index():
    """Regression: after a repartition, each area's SSO rows must be ordered
    by sorted keyframe id (Map360.local_index), so later add_connection
    writes land on the right pair even with interleaved keyframe ids."""
    m, topo = _linked_topology()
    assert topo.partitioner()
    # write a fresh connection inside each area and read it back through the
    # same local_index bookkeeping
    for area in sorted({f.node for f in m.frames}):
        kfs = sorted(m.areas[area])
        k1, k2 = kfs[0], kfs[-1]
        topo.add_connection(k1, k2, 0.4321)
        i1, i2 = m.local_index(k1), m.local_index(k2)
        assert topo.v_sso[area][i1, i2] == pytest.approx(0.4321)
        # and the pre-partition affinities moved with their keyframes
        for a, b in ((kfs[0], kfs[1]), (kfs[1], kfs[2])):
            ia, ib = m.local_index(a), m.local_index(b)
            assert topo.v_sso[area][ia, ib] == pytest.approx(0.9, abs=1e-6)


def test_robust_kernel_rejects_false_loop_closure(rng):
    """robust=True (self-scaling Huber IRLS) must keep one grossly wrong
    loop-closure edge from dragging its vertex, while the reference-parity
    plain optimizer is measurably corrupted by it. Scenario from the
    synthetic 56-KF loop run: 145 good edges + 1 false LC accepted by the
    loose avDepthResidual<2.0 gate pulled its vertex 1.1 m off."""
    gt, odo = _circle_graph(rng=rng)
    n = len(gt)

    def build(robust, with_outlier):
        opt = GraphOptimizer(robust=robust)
        pose = np.eye(4)
        opt.add_vertex(pose)
        for z in odo:
            pose = pose @ z
            opt.add_vertex(pose)
        # realistic information scales: odometry edges carry dense-align
        # Hessians an order stronger than LC edges (deforming the chain to
        # satisfy one outlier must be expensive, as in the real graphs —
        # with weaker-than-LC odometry a flexible chain lets the outlier
        # ratchet itself back to full weight)
        for k, z in enumerate(odo):
            opt.add_edge(k, k + 1, z, 100 * np.eye(6))
        # good loop closure last->first
        opt.add_edge(n - 1, 0, np.linalg.inv(gt[-1]) @ gt[0], 10 * np.eye(6))
        if with_outlier:
            # FALSE loop closure: claims vertex n//2 sits 1.5 m off
            bad = np.linalg.inv(gt[0]) @ gt[n // 2]
            bad[:3, 3] += np.array([1.5, -0.8, 0.4])
            opt.add_edge(0, n // 2, bad, 10 * np.eye(6))
        opt.optimize_graph(iterations=25)
        return max(
            np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(opt.get_poses(), gt)
        )

    err_clean = build(robust=False, with_outlier=False)  # intrinsic drift floor
    err_plain = build(robust=False, with_outlier=True)
    err_robust = build(robust=True, with_outlier=True)
    # the plain solve is visibly dragged; the robust one recovers the
    # outlier-free solution (measured: clean 0.252, plain 1.344, robust 0.240)
    assert err_plain > 2 * err_clean, (err_plain, err_clean)
    assert err_robust < 1.1 * err_clean, (err_robust, err_clean)


def test_partitioner_inter_part_blocks_survive_interleaved_split():
    """Regression: the inter-area SSO block between a REUSED vicinity area id
    and a NEW area id is created by the partition itself and already indexed
    by the new memberships — the outside-block re-homing loop must not grab
    it (new ids are never in `vicinity`, so the one-side-in-vicinity test
    alone matches it), which scrambled rows through old_members, wrote bogus
    self-keyed blocks, and could drop the neighbor link. Interleaved parts
    expose it (a contiguous split is re-homed correctly by coincidence)."""
    m = Map360()
    topo = TopologicalMap360(m)
    for k in range(12):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 1.0 * k
        m.add_keyframe(FakeFrame(), T)
        topo.add_keyframe(m.current_area)
    evens = [0, 2, 4, 6, 8, 10]
    odds = [1, 3, 5, 7, 9, 11]
    for grp in (evens, odds):
        for a in grp:
            for b in grp:
                if a < b:
                    topo.add_connection(a, b, 0.9)
    # weak cross links at INTERIOR pairs: under the bug, kf 4's row was
    # re-homed from kf 2's slot (old_members enumeration vs part-local
    # indexing) and kf 6's row was written into a bogus (new,new) self-key
    topo.add_connection(4, 9, 0.05)
    topo.add_connection(6, 11, 0.07)
    assert topo.partitioner()
    a_e, a_o = m.frames[0].node, m.frames[1].node
    assert a_e != a_o
    assert {m.frames[k].node for k in evens} == {a_e}
    assert {m.frames[k].node for k in odds} == {a_o}
    # the neighbor link between the two fresh parts must survive
    assert a_o in m.neighbor_areas[a_e] and a_e in m.neighbor_areas[a_o]
    key = (min(a_e, a_o), max(a_e, a_o))
    blk = topo.neig_sso[key]
    assert blk.shape == (6, 6)
    # the weak cross connections sit exactly at their (local_index) cells
    expect = np.zeros((6, 6), np.float32)
    for (ke, ko, v) in ((4, 9, 0.05), (6, 11, 0.07)):
        ie, io = m.local_index(ke), m.local_index(ko)
        if a_e < a_o:
            expect[ie, io] = v
        else:
            expect[io, ie] = v
    np.testing.assert_allclose(blk, expect)
    # and no bogus self-keyed blocks were created
    assert all(k1 != k2 for k1, k2 in topo.neig_sso)


def test_graph_optimizer_reaches_first_order_optimality(rng):
    """Solver-independent optimality property: at the returned solution the
    numerical gradient of chi2 = sum e^T info e (e = log(Z^-1 Xi^-1 Xj),
    right-multiplicative perturbation) must vanish along every free-vertex
    axis — a transcription error in the Jacobians/adjoint would leave a
    descent direction that this detects without trusting the solver's own
    math."""
    from rgbd360_tpu.core.graph_optimizer import GraphOptimizer, _exp_se3, _log_se3

    n = 6
    gt = [np.eye(4)]
    for k in range(1, n):
        xi = 0.4 * rng.standard_normal(6)
        gt.append(gt[-1] @ _exp_se3(xi))
    opt = GraphOptimizer()
    for k in range(n):
        noise = _exp_se3(0.05 * rng.standard_normal(6)) if k else np.eye(4)
        opt.add_vertex(gt[k] @ noise)
    edges = [(k, k + 1) for k in range(n - 1)] + [(0, n - 1), (1, 4)]
    for i, j in edges:
        z = np.linalg.inv(gt[i]) @ gt[j]
        info = np.eye(6) * float(rng.uniform(0.5, 5.0))
        opt.add_edge(i, j, z, info)

    def chi2_of(X):
        tot = 0.0
        for e in opt.edges:
            err = _log_se3(np.linalg.inv(e.z) @ np.linalg.inv(X[e.i]) @ X[e.j])
            tot += float(err @ e.info @ err)
        return tot

    chi2_init = chi2_of(opt.vertices)
    chi2_final = opt.optimize_graph(iterations=50)
    assert chi2_final <= chi2_init + 1e-12
    X = opt.get_poses()
    assert chi2_final == pytest.approx(chi2_of(X), rel=1e-9)

    eps = 1e-5
    gmax = 0.0
    for v in range(1, n):
        for a in range(6):
            d = np.zeros(6)
            d[a] = eps
            Xp = list(X); Xm = list(X)
            Xp[v] = X[v] @ _exp_se3(d)
            Xm[v] = X[v] @ _exp_se3(-d)
            gmax = max(gmax, abs(chi2_of(Xp) - chi2_of(Xm)) / (2 * eps))
    # curvature scale ~ info * n_edges; the solver's own stop tolerance is
    # 1e-12 on chi2, so the gradient at the fixed point is solver-noise level
    assert gmax < 1e-4, f"residual gradient {gmax} — descent direction left"


def test_se2_optimizer_reaches_first_order_optimality():
    """SE2 twin of the SE3 optimality gate: zero numerical chi2 gradient
    along every free vertex's (x, y, theta) chart at the solution."""
    from rgbd360_tpu.core.graph_optimizer import GraphOptimizer

    rng = np.random.default_rng(7)

    def v2t(a, b, th):
        c, s = np.cos(th), np.sin(th)
        T = np.eye(4)
        T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
        T[0, 3], T[1, 3] = a, b
        return T

    n = 6
    gt = [v2t(0, 0, 0)]
    for k in range(1, n):
        gt.append(gt[-1] @ v2t(*rng.normal(scale=0.5, size=2), rng.normal(scale=0.4)))
    opt = GraphOptimizer(rigidity=3)
    for k in range(n):
        noise = v2t(*rng.normal(scale=0.05, size=2), rng.normal(scale=0.05)) if k else np.eye(4)
        opt.add_vertex(gt[k] @ noise)
    for i, j in [(k, k + 1) for k in range(n - 1)] + [(0, n - 1), (1, 4)]:
        z = np.linalg.inv(gt[i]) @ gt[j]
        opt.add_edge(i, j, z, np.eye(6) * float(rng.uniform(1.0, 4.0)))

    def t2v(T):
        return np.array([T[0, 3], T[1, 3], np.arctan2(T[1, 0], T[0, 0])])

    def chi2_of(X):
        tot = 0.0
        for e in opt.edges:
            r = t2v(np.linalg.inv(e.z) @ np.linalg.inv(X[e.i]) @ X[e.j])
            r[2] = (r[2] + np.pi) % (2 * np.pi) - np.pi
            info3 = opt._info3(e.info)
            tot += float(r @ info3 @ r)
        return tot

    chi2_init = chi2_of(opt.vertices)
    chi2_final = opt.optimize_graph(iterations=50)
    assert chi2_final <= chi2_init + 1e-12
    X = opt.get_poses()
    assert chi2_final == pytest.approx(chi2_of(X), rel=1e-6, abs=1e-9)

    eps = 1e-6
    gmax = 0.0
    for v in range(1, n):
        for d in (np.array([eps, 0, 0]), np.array([0, eps, 0]), np.array([0, 0, eps])):
            Xp = list(X); Xm = list(X)
            Xp[v] = X[v] @ v2t(*d)
            Xm[v] = X[v] @ v2t(*(-d))
            gmax = max(gmax, abs(chi2_of(Xp) - chi2_of(Xm)) / (2 * eps))
    assert gmax < 1e-4, f"residual SE2 gradient {gmax}"
