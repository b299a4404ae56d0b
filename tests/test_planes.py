"""Plane layer: normals, segmentation, plane params, matcher, pose-from-planes."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.core.matcher import (
    DEFAULT_6DOF,
    PLANAR_3DOF,
    PLANAR_ODOMETRY_3DOF,
    MatcherConfig,
    SubgraphMatcher,
    estimate_pose_from_planes,
)
from rgbd360_tpu.core.pbmap import (
    PbMap,
    Plane,
    bhattacharyya,
    convex_hull_2d,
    polygon_area_centroid,
    rgb_to_hue_hist,
)
from rgbd360_tpu.ops.normals import organized_normals
from rgbd360_tpu.ops.pinhole import backproject_organized, downsample_median2
from rgbd360_tpu.ops.planes_seg import segment_planes


def _two_plane_cloud(h=120, w=160):
    """Organized cloud: left half a wall at z=2, right half a wall at z=3."""
    focal = 525.0 * w / 640.0
    ox, oy = w / 2 - 0.5, h / 2 - 0.5
    xs = (np.arange(w) - ox) / focal
    ys = (np.arange(h) - oy) / focal
    z = np.where(np.arange(w)[None, :] < w // 2, 2.0, 3.0).astype(np.float32)
    z = np.broadcast_to(z, (h, w)).copy()
    xyz = np.stack(
        [xs[None, :] * z, ys[:, None] * z, z], axis=-1
    ).astype(np.float32)
    return xyz


def test_backproject_matches_depth():
    depth = jnp.full((120, 160), 2.5, jnp.float32)
    xyz = np.asarray(backproject_organized(depth))
    assert np.allclose(xyz[..., 2], 2.5)
    # center pixel maps close to the optical axis
    assert abs(xyz[60, 80, 0]) < 0.02 and abs(xyz[60, 80, 1]) < 0.02


def test_downsample_median_prefers_valid():
    xyz = np.full((4, 4, 3), np.nan, np.float32)
    xyz[0, 0] = [0.1, 0.2, 2.0]  # only valid point of block (0,0)
    rgb = np.zeros((4, 4, 3), np.uint8)
    out, _ = downsample_median2(jnp.asarray(xyz), jnp.asarray(rgb))
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0], [0.1, 0.2, 2.0], atol=1e-6)
    assert np.isnan(out[1, 1]).all()  # empty block copies (NaN) center


def test_normals_on_flat_wall():
    xyz = _two_plane_cloud()
    normals = np.asarray(organized_normals(jnp.asarray(xyz)))
    # interior of the left wall: normal is -z (toward the sensor)
    n = normals[40:80, 20:60]
    assert np.isfinite(n).all()
    np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-3)
    assert (n[..., 2] < 0).all()


def test_segmentation_splits_depth_step():
    xyz = _two_plane_cloud()
    normals = organized_normals(jnp.asarray(xyz))
    labels = np.asarray(segment_planes(jnp.asarray(xyz), normals))
    interior = labels[30:-30]
    left = interior[:, 20:60]
    right = interior[:, 100:140]
    assert (left >= 0).all() and (right >= 0).all()
    assert len(np.unique(left)) == 1 and len(np.unique(right)) == 1
    assert np.unique(left)[0] != np.unique(right)[0]


def test_hull_area():
    square = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]])
    hull = convex_hull_2d(square)
    assert len(hull) == 4
    area, c = polygon_area_centroid(square[hull])
    assert area == pytest.approx(1.0)
    np.testing.assert_allclose(c, [0.5, 0.5], atol=1e-9)


def test_hue_hist_properties(rng):
    rgb = rng.integers(0, 255, (500, 3), dtype=np.uint8)
    h = rgb_to_hue_hist(rgb)
    assert h.shape == (74,)
    assert h.sum() == pytest.approx(1.0)
    assert bhattacharyya(h, h) == pytest.approx(1.0, abs=1e-9)


def _make_plane(normal, center, area, colors_seed=0):
    rng = np.random.default_rng(colors_seed)
    normal = np.asarray(normal, float)
    normal = normal / np.linalg.norm(normal)
    p = Plane(normal=normal, center=np.asarray(center, float), area_hull=area)
    p.d = float(-p.normal @ p.center)
    p.elongation = 1.5
    p.hist_h = rgb_to_hue_hist(rng.integers(100, 130, (50, 3), dtype=np.uint8))
    u, v = p.plane_basis()
    half = np.sqrt(area) / 2
    p.hull = np.stack(
        [p.center + su * half * u + sv * half * v for su, sv in
         [(-1, -1), (1, -1), (1, 1), (-1, 1)]]
    )
    p.points = p.hull.copy()
    p.inliers = np.arange(4)
    return p


def _transform_plane(p, R, t):
    q = Plane(
        normal=R @ p.normal, center=R @ p.center + t, area_hull=p.area_hull,
    )
    q.d = float(-q.normal @ q.center)
    q.elongation = p.elongation
    q.hist_h = p.hist_h.copy()
    q.hull = p.hull @ R.T + t
    q.points = q.hull.copy()
    q.inliers = p.inliers.copy()
    return q


def test_matcher_recovers_known_pose():
    # a room with distinct pairwise normal angles (matching is pose-free, so
    # a fully rectangular scene is genuinely ambiguous — also for the
    # reference's matcher, whose constraints are the same invariants)
    planes = [
        _make_plane([0.05, 0.1, -1], [0, 0, 3], 4.0, 1),
        _make_plane([0.1, -1, 0.2], [0.2, 2.5, 1], 1.5, 2),
        _make_plane([-0.1, 1, 0.3], [-0.3, -2.0, 1.5], 2.5, 3),
        _make_plane([-1, 0.2, 0.05], [1.4, 0.4, 1.2], 6.0, 4),
    ]
    theta = 0.1
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    t = np.array([0.0, 0.25, -0.15])
    # ref plane params relate to trg by the pose (trg seen from ref):
    Rinv, tinv = R.T, -R.T @ t
    trg_planes = [_transform_plane(p, Rinv, tinv) for p in planes]
    ref, trg = PbMap(list(planes)), PbMap(list(trg_planes))
    for i, p in enumerate(ref.planes):
        p.id = i
    for j, p in enumerate(trg.planes):
        p.id = j

    m = SubgraphMatcher(MatcherConfig())
    match = m.compare_subgraphs(ref, trg, [0, 1, 2, 3], [0, 1, 2, 3], DEFAULT_6DOF)
    assert match == {0: 0, 1: 1, 2: 2, 3: 3}
    ok, pose, info = estimate_pose_from_planes(ref, trg, match, DEFAULT_6DOF)
    assert ok
    np.testing.assert_allclose(pose[:3, :3], R, atol=1e-5)
    np.testing.assert_allclose(pose[:3, 3], t, atol=1e-5)
    assert np.all(np.linalg.eigvalsh(info.astype(np.float64)) > -1e-6)

    ok, pose_p, _ = estimate_pose_from_planes(ref, trg, match, PLANAR_3DOF)
    assert ok
    np.testing.assert_allclose(pose_p[:3, 3], t, atol=1e-5)


def _brute_force_best_area(matcher, ref, trg, ref_idx, trg_idx, mode):
    """Exhaustive search over every injective constraint-satisfying partial
    assignment — the ground truth for SubgraphMatcher's branch-and-bound
    (whose suffix-area pruning bound this fuzz exists to falsify)."""
    ref_planes = [ref.planes[i] for i in ref_idx]
    trg_planes = [trg.planes[j] for j in trg_idx]
    nr, nt = len(ref_planes), len(trg_planes)
    best_area = 0.0

    def rec(k, assigned, used_t, area):
        nonlocal best_area
        if k == nr:
            best_area = max(best_area, area)
            return
        pi = ref_planes[k]
        for j in range(nt):
            if j in used_t or not matcher._unary(pi, trg_planes[j], mode):
                continue
            if all(
                matcher._binary(pi, ref_planes[i2], trg_planes[j], trg_planes[j2], mode)
                for i2, j2 in assigned
            ):
                rec(k + 1, assigned + [(k, j)], used_t | {j}, area + pi.area_hull)
        rec(k + 1, assigned, used_t, area)  # leave ref plane k unmatched

    rec(0, [], set(), 0.0)
    return best_area


def test_matcher_brute_force_optimality_fuzz():
    """The interpretation-tree search must return a constraint-satisfying
    assignment whose matched reference area equals the exhaustive optimum
    (assignments may differ under area ties)."""
    rng = np.random.default_rng(20260818)
    m = SubgraphMatcher(MatcherConfig())
    checked_nonempty = 0
    for trial in range(40):
        nr = int(rng.integers(2, 6))
        nt = int(rng.integers(2, 6))
        ref_planes = []
        for i in range(nr):
            n = rng.normal(size=3)
            p = _make_plane(
                n, rng.uniform(-3, 3, 3), float(rng.uniform(0.5, 6.0)),
                colors_seed=int(rng.integers(0, 4)),
            )
            p.elongation = float(rng.uniform(1.0, 3.0))
            p.id = i
            ref_planes.append(p)
        # trg mixes transformed copies (true candidates), perturbed copies
        # (near-misses that stress individual constraints), and fresh planes
        theta = float(rng.uniform(-0.3, 0.3))
        c, s = np.cos(theta), np.sin(theta)
        R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        t = rng.uniform(-0.3, 0.3, 3)
        trg_planes = []
        for j in range(nt):
            kind = rng.uniform()
            if kind < 0.5 and nr > 0:
                src = ref_planes[int(rng.integers(0, nr))]
                q = _transform_plane(src, R, t)
            elif kind < 0.8 and nr > 0:
                src = ref_planes[int(rng.integers(0, nr))]
                q = _transform_plane(src, R, t)
                q.normal = q.normal + rng.normal(size=3) * 0.3
                q.normal /= np.linalg.norm(q.normal)
                q.center = q.center + rng.normal(size=3) * 0.8
                q.d = float(-q.normal @ q.center)
                q.area_hull = float(q.area_hull * rng.uniform(0.3, 3.0))
            else:
                q = _make_plane(
                    rng.normal(size=3), rng.uniform(-3, 3, 3),
                    float(rng.uniform(0.5, 6.0)),
                    colors_seed=int(rng.integers(0, 4)),
                )
            q.elongation = float(rng.uniform(1.0, 3.0))
            q.id = j
            trg_planes.append(q)
        ref, trg = PbMap(ref_planes), PbMap(trg_planes)
        ref_idx, trg_idx = list(range(nr)), list(range(nt))
        for mode in (DEFAULT_6DOF, PLANAR_ODOMETRY_3DOF):
            match = m.compare_subgraphs(ref, trg, ref_idx, trg_idx, mode)
            # 1. every returned pair satisfies the constraint set
            items = list(match.items())
            assert len(set(match.values())) == len(items), "non-injective match"
            for i, j in items:
                assert m._unary(ref.planes[i], trg.planes[j], mode)
            for a in range(len(items)):
                for b in range(a + 1, len(items)):
                    i1, j1 = items[a]
                    i2, j2 = items[b]
                    assert m._binary(
                        ref.planes[i1], ref.planes[i2],
                        trg.planes[j1], trg.planes[j2], mode,
                    )
            # 2. matched area equals the exhaustive optimum
            got = m.calc_area_matched(ref, match)
            want = _brute_force_best_area(m, ref, trg, ref_idx, trg_idx, mode)
            assert got == pytest.approx(want, rel=1e-9), (trial, mode, got, want)
            if want > 0:
                checked_nonempty += 1
    assert checked_nonempty >= 20  # the fuzz must exercise real matches


def test_matcher_rejects_underdetermined():
    # two parallel walls only: translation along them is unobservable
    planes = [
        _make_plane([0, 0, -1], [0, 0, 3], 4.0, 1),
        _make_plane([0, 0, -1], [0, 1, 5], 4.0, 2),
        _make_plane([0, 0, -1], [1, 0, 7], 4.0, 3),
    ]
    for i, p in enumerate(planes):
        p.id = i
    ref = PbMap(list(planes))
    ok, _, _ = estimate_pose_from_planes(ref, ref, {0: 0, 1: 1, 2: 2}, DEFAULT_6DOF)
    assert not ok


def test_sample_frame_planes(sample_frames):
    f1, _ = sample_frames
    pbmap = f1.get_planes()
    assert len(pbmap) >= 5
    areas = [p.area_hull for p in pbmap.planes]
    assert max(areas) > 1.0
    for p in pbmap.planes:
        assert abs(np.linalg.norm(p.normal) - 1) < 1e-5
        assert p.d == pytest.approx(-float(p.normal @ p.center), abs=1e-4)
        assert len(p.inliers) >= 80


def test_extract_planes_need_inliers_false_parity(sample_frames):
    """need_inliers=False (the SLAM-loop transfer configuration) must yield
    the same plane set as the default — only Plane.inliers becomes None."""
    from rgbd360_tpu.core.plane_extraction import extract_frame_planes

    frame, _ = sample_frames
    frame.undistort()
    pb_full, local_full = extract_frame_planes(frame, need_inliers=True)
    pb_fast, local_fast = extract_frame_planes(frame, need_inliers=False)
    assert len(pb_fast.planes) == len(pb_full.planes)
    for a, b in zip(pb_full.planes, pb_fast.planes):
        np.testing.assert_allclose(a.normal, b.normal, atol=1e-6)
        np.testing.assert_allclose(a.center, b.center, atol=1e-6)
        assert abs(a.area_hull - b.area_hull) < 1e-6
        assert a.n_pts == b.n_pts
        assert b.inliers is None and a.inliers is not None
    # fast mode skips the pristine per-sensor copies entirely
    assert local_fast is None and local_full is not None


def test_planes_pipeline_matches_sequential(sample_frames):
    """planes_pipeline (one-frame-lookahead overlap) must produce the same
    plane sets as sequential get_planes(need_inliers=False)."""
    from rgbd360_tpu.core.plane_extraction import extract_frame_planes, planes_pipeline

    f1, f2 = sample_frames
    f1.undistort()
    f2.undistort()
    expected = []
    for f in (f1, f2):
        pb, _ = extract_frame_planes(f, need_inliers=False)
        expected.append(pb)

    out = list(planes_pipeline(iter([(1, f1), (10, f2)])))
    assert [no for no, _ in out] == [1, 10]
    for (_, frame), exp in zip(out, expected):
        assert frame.local_planes is None
        assert len(frame.planes.planes) == len(exp.planes)
        for a, b in zip(frame.planes.planes, exp.planes):
            np.testing.assert_allclose(a.normal, b.normal, atol=1e-6)
            assert a.n_pts == b.n_pts


def test_planes_pipeline_threaded_is_outcome_identical(sample_frames):
    """The worker-thread collector (threaded=True, the default) must yield
    bit-identical plane sets to the sequential schedule, call the
    pre_collect hook in the same per-frame order (hooks dispatch device
    programs and MUST stay on the caller's thread), and propagate worker
    exceptions to the consumer."""
    import threading

    from rgbd360_tpu.core.plane_extraction import planes_pipeline

    f1, f2 = sample_frames
    f1.undistort()
    f2.undistort()

    def run(threaded):
        hooks = []
        main_thread = threading.get_ident()

        def hook(frame):
            assert threading.get_ident() == main_thread
            hooks.append(id(frame))

        out = list(
            planes_pipeline(
                iter([(1, f1), (10, f2)]), pre_collect=hook, threaded=threaded
            )
        )
        return out, hooks

    out_seq, hooks_seq = run(False)
    out_thr, hooks_thr = run(True)
    assert hooks_seq == hooks_thr == [id(f1), id(f2)]
    assert [no for no, _ in out_thr] == [no for no, _ in out_seq] == [1, 10]
    for (_, fa), (_, fb) in zip(out_thr, out_seq):
        assert fa is fb  # same frame objects, fitted in place
        assert len(fa.planes.planes) > 0
    # identical plane sets across schedules (second run refits in place, so
    # compare against a sequential refit of the same frames)
    planes_thr = [[(p.normal.copy(), p.n_pts) for p in f.planes.planes] for _, f in out_thr]
    out_seq2, _ = run(False)
    for got, (_, f) in zip(planes_thr, out_seq2):
        assert len(got) == len(f.planes.planes)
        for (n, npts), p in zip(got, f.planes.planes):
            np.testing.assert_array_equal(n, p.normal)
            assert npts == p.n_pts

    # a worker exception must surface at the consumer, not hang
    class Boom(RuntimeError):
        pass

    def bad_frames():
        yield 1, f1
        raise Boom("source failed")

    import pytest as _pytest

    with _pytest.raises(Boom):
        list(planes_pipeline(bad_frames(), threaded=True))


def test_get_vertical_planes_segments():
    """getVerticalPlanes parity (Miscellaneous.h:208-257): near-x-normal
    large planes yield a (y_r, z_r, y_l, z_l) wall segment from the hull
    extremes; tilted or small planes are skipped."""
    from rgbd360_tpu.core.pbmap import PbMap, Plane, get_vertical_planes

    wall = Plane(
        id=0,
        normal=np.array([1.0, 0.0, 0.0]),
        center=np.array([0.0, 1.0, 2.0]),
        area_hull=4.0,
        hull=np.array(
            [[0.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 2.0, 4.0], [0.0, 0.0, 4.0]]
        ),
    )
    small = Plane(
        id=1,
        normal=np.array([1.0, 0.0, 0.0]),
        center=np.array([0.0, 0.0, 0.0]),
        area_hull=0.5,
        hull=wall.hull,
    )
    tilted = Plane(
        id=2,
        normal=np.array([0.0, 1.0, 0.0]),
        center=np.array([0.0, 0.0, 0.0]),
        area_hull=9.0,
        hull=wall.hull,
    )
    segs = get_vertical_planes(PbMap(planes=[wall, small, tilted]))
    assert len(segs) == 1
    (seg,) = segs
    # right extreme: z > 2 side, farthest from (1,2) -> (0,4); left -> (2,0)
    # ((0,4) and (2,4) tie in distance on the right side; argmax picks the
    # first hull vertex with z>2, which is (2,4))
    assert seg.shape == (4,)
    r, l = seg[:2], seg[2:]
    assert r[1] > 2.0 and l[1] < 2.0  # opposite z sides of the centroid
    np.testing.assert_allclose(np.linalg.norm(r - [1, 2]), np.sqrt(5))
    np.testing.assert_allclose(np.linalg.norm(l - [1, 2]), np.sqrt(5))
