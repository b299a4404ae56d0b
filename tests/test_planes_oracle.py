"""Plane-layer parity vs the independent C++ oracle (VERDICT r3 #4).

The metric path earned a compiled C++ oracle in round 3; the plane layer was
still gated only against the author's own transcriptions. These tests
execute tools/cpp_oracle/planes_oracle.cpp — an independent statement-by-
statement C++ implementation of getPlanesSensor's per-region statistics,
groupPlanes and mergePlanes (reference include/Frame360.h:657-832,
:979-1075) — on synthetic 8-sensor scenes engineered to exercise every
branch, and pin the production Python chain
(_planes_from_labels -> transform -> group_planes -> merge_planes) to it:

  * per-region stats: centroid / covariance eigendecomposition / toward-
    sensor flip / curvature / hull area / elongation / hue histogram
  * the min-inlier, min-area and max-elongation discards
  * the local isSamePlane(0.99, 0.05, 0.2) merge
  * cross-sensor grouping incl. the sensor 7->0 wraparound and the
    areaHull/curvature gates
  * the global mergePlanes erase/reindex/restart loop at 0.3 m / 0.06 m

The oracle uses its own Jacobi eigensolver, its own hull/basis construction
and the reference's literal closed-contour loop pairing, so agreement here
is evidence about semantics, not shared code.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import planes_oracle  # noqa: E402

from rgbd360_tpu.core.plane_extraction import (  # noqa: E402
    MAX_CURVATURE, MAX_ELONGATION, MIN_AREA, _planes_from_labels,
    group_planes, merge_planes,
)
from rgbd360_tpu.ops.planes_seg import MIN_INLIERS  # noqa: E402

H, W = 48, 64
N_SENSORS = 8


def _ring_pose(s):
    """45-degree ring like the rig (Calibrator.h:763-776 construction)."""
    a = np.deg2rad(45.0 * s)
    Rt = np.eye(4)
    Rt[:3, :3] = np.array(
        [[np.cos(a), -np.sin(a), 0.0], [np.sin(a), np.cos(a), 0.0], [0.0, 0.0, 1.0]]
    )
    Rt[:3, 3] = [0.1 * np.cos(a), 0.1 * np.sin(a), 0.0]
    return Rt


class SceneBuilder:
    """Per-sensor (xyz, rgb, labels) images from rig-frame plane patches."""

    def __init__(self, rng):
        self.rng = rng
        self.sensors = []
        for s in range(N_SENSORS):
            self.sensors.append(
                {
                    "H": H, "W": W, "Rt": _ring_pose(s),
                    "xyz": np.zeros((H, W, 3)),
                    "rgb": np.zeros((H, W, 3), np.uint8),
                    "labels": np.full((H, W), -1, np.int32),
                    "next_label": 0,
                    "next_block": 0,
                }
            )

    def add_patch(self, s, points_rig, base_rgb, block_h=12, block_w=12):
        """Place a rig-frame point set as the next labeled block of sensor
        s's image (points are expressed in the sensor frame, like the
        reference's per-sensor clouds)."""
        sen = self.sensors[s]
        n = len(points_rig)
        assert n <= block_h * block_w
        bi = sen["next_block"]
        r0 = (bi // (W // block_w)) * block_h
        c0 = (bi % (W // block_w)) * block_w
        assert r0 + block_h <= H, "image out of blocks"
        sen["next_block"] += 1
        lab = sen["next_label"]
        sen["next_label"] += 1
        Rt_inv = np.linalg.inv(sen["Rt"])
        pts_sensor = points_rig @ Rt_inv[:3, :3].T + Rt_inv[:3, 3]
        rows = np.arange(n) // block_w + r0
        cols = np.arange(n) % block_w + c0
        sen["xyz"][rows, cols] = pts_sensor
        sen["rgb"][rows, cols] = np.clip(
            np.asarray(base_rgb, float)
            + self.rng.integers(-20, 21, size=(n, 3)),
            0, 255,
        ).astype(np.uint8)
        sen["labels"][rows, cols] = lab
        return lab

    def grid_patch(self, origin, a1, a2, e1, e2, n1=12, n2=12, noise=2e-3):
        """Noisy rig-frame grid on the plane spanned by (a1, a2) at origin."""
        t1 = np.linspace(-e1, e1, n1)
        t2 = np.linspace(-e2, e2, n2)
        g1, g2 = np.meshgrid(t1, t2, indexing="ij")
        pts = (
            np.asarray(origin)
            + g1.reshape(-1, 1) * np.asarray(a1)
            + g2.reshape(-1, 1) * np.asarray(a2)
        )
        return pts + self.rng.normal(0.0, noise, size=pts.shape)


def _wall(w):
    """Inward-facing wall w of an octagon room of radius 2."""
    a = np.deg2rad(45.0 * w)
    n_dir = np.array([np.cos(a), np.sin(a), 0.0])
    origin = 2.0 * n_dir
    a1 = np.array([-np.sin(a), np.cos(a), 0.0])
    a2 = np.array([0.0, 0.0, 1.0])
    return origin, a1, a2


def _build_scene(rng):
    sb = SceneBuilder(rng)
    # every wall w seen by sensors w and (w+1)%8 with overlapping patches:
    # 8 groupPlanes merges, including the 7->0 wraparound at wall 7
    for w in range(N_SENSORS):
        origin, a1, a2 = _wall(w)
        for s, off in ((w, -0.2), ((w + 1) % N_SENSORS, 0.2)):
            pts = sb.grid_patch(origin + off * a1, a1, a2, 0.45, 0.45)
            sb.add_patch(s, pts, base_rgb=(40 + 25 * w, 200 - 20 * w, 90))
    # floor patches seen by NON-adjacent sensors 0 and 3: groupPlanes cannot
    # merge them (prev_planes bookkeeping), mergePlanes must
    floor_o = np.array([1.2, 0.6, -1.2])
    fa1, fa2 = np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0])
    sb.add_patch(0, sb.grid_patch(floor_o, fa1, fa2, 0.4, 0.4), (200, 60, 60))
    sb.add_patch(3, sb.grid_patch(floor_o + 0.15 * fa1, fa1, fa2, 0.4, 0.4), (60, 60, 200))
    # same-sensor coplanar overlapping pair: the LOCAL isSamePlane merge
    ceil_o = np.array([-1.0, 0.8, 1.4])
    sb.add_patch(5, sb.grid_patch(ceil_o, fa1, fa2, 0.3, 0.3), (230, 230, 40))
    sb.add_patch(5, sb.grid_patch(ceil_o + 0.1 * fa2, fa1, fa2, 0.3, 0.3), (230, 230, 40))
    # filters: too few inliers (sensor 1), too small area (sensor 2),
    # too elongated (sensor 4)
    o, a1, a2 = _wall(2)
    few = sb.grid_patch(o + np.array([0, 0, 1.0]), a1, a2, 0.3, 0.3, n1=8, n2=8)
    sb.add_patch(1, few, (120, 120, 120))
    assert len(few) < MIN_INLIERS
    tiny = sb.grid_patch(o + np.array([0, 0, -1.2]), a1, a2, 0.12, 0.12)
    sb.add_patch(2, tiny, (120, 200, 120))
    assert (2 * 0.12) ** 2 < MIN_AREA
    strip = sb.grid_patch(o + np.array([0, 0, 1.2]), a1, a2, 1.5, 0.02, n1=48, n2=3, noise=5e-4)
    sb.add_patch(4, strip, (20, 120, 220), block_h=12, block_w=12)
    # high curvature: a paraboloid cap — extracted (no curvature filter at
    # extraction) but excluded from every merge by the curvature gates
    t = sb.grid_patch(np.array([0.5, -1.3, 0.6]), fa1, fa2, 0.35, 0.35, noise=1e-4)
    bump = t + np.array([0, 0, 1.0]) * (0.8 * ((t[:, 0] - 0.5) ** 2 + (t[:, 1] + 1.3) ** 2))[:, None]
    sb.add_patch(6, bump, (200, 120, 200))
    return sb


@pytest.fixture(scope="module")
def scene_and_results(tmp_path_factory):
    rng = np.random.default_rng(42)
    sb = _build_scene(rng)

    # ---- production Python chain ----
    local = []
    for s in range(N_SENSORS):
        sen = sb.sensors[s]
        pl = _planes_from_labels(sen["xyz"], sen["rgb"], sen["labels"], s)
        for p in pl:
            p.transform(sen["Rt"])
        local.append(pl)
    py_local = [[_snapshot(p) for p in pl] for pl in local]
    pb = merge_planes(group_planes(local))

    # ---- oracle ----
    path = tmp_path_factory.mktemp("planes_oracle") / "scene.bin"
    planes_oracle.pack(
        str(path), sb.sensors, int(MIN_INLIERS), float(MIN_AREA),
        float(MAX_ELONGATION), float(MAX_CURVATURE),
    )
    cpp = planes_oracle.run(str(path))
    return sb, py_local, pb, cpp


def _snapshot(p):
    return {
        "n": int(p.n_pts) if p.n_pts else len(p.points),
        "center": p.center.copy(),
        "normal": p.normal.copy(),
        "d": float(p.d),
        "curvature": float(p.curvature),
        "area": float(p.area_hull),
        "elongation": float(p.elongation),
        "hist": None if p.hist_h is None else np.asarray(p.hist_h, float).copy(),
    }


def _assert_plane_close(py, cp, tag):
    assert py["n"] == cp["n"], f"{tag}: inlier count {py['n']} vs {cp['n']}"
    np.testing.assert_allclose(py["center"], cp["center"], atol=1e-7, err_msg=tag)
    np.testing.assert_allclose(py["normal"], cp["normal"], atol=1e-7, err_msg=tag)
    assert abs(py["d"] - cp["d"]) < 1e-7, tag
    assert abs(py["curvature"] - cp["curvature"]) < 1e-9, tag
    np.testing.assert_allclose(py["area"], cp["area"], rtol=1e-7, err_msg=tag)
    np.testing.assert_allclose(py["elongation"], cp["elongation"], rtol=1e-6, err_msg=tag)


def test_scene_exercises_every_branch(scene_and_results):
    """The gate is only as strong as the scene: filters must have dropped
    regions, the local merge / group merges / wraparound / global merge must
    all have fired."""
    sb, py_local, pb, cpp = scene_and_results
    # filters: sensor 1 lost its too-few patch, 2 its tiny patch, 4 its strip
    assert len(py_local[1]) == 2  # walls only (w=0 off +0.2, w=1 off -0.2)
    assert len(py_local[2]) == 2
    assert len(py_local[4]) == 2
    # local merge on sensor 5: 2 ceiling patches + 2 walls -> 3 planes
    assert len(py_local[5]) == 3
    # high-curvature bump extracted on sensor 6
    assert any(p["curvature"] > MAX_CURVATURE for p in py_local[6])
    # grouping: 16 wall patches -> 8 walls; +2 floors +1 ceiling +1 bump = 12
    assert len(cpp["group"]) == 12
    # final: mergePlanes fuses the two floor patches -> 11
    assert len(cpp["final"]) == 11


def test_local_planes_match_oracle(scene_and_results):
    sb, py_local, pb, cpp = scene_and_results
    for s in range(N_SENSORS):
        cp = cpp["local"].get(s, [])
        assert len(py_local[s]) == len(cp), f"sensor {s} local plane count"
        for i, (a, b) in enumerate(zip(py_local[s], cp)):
            _assert_plane_close(a, b, f"local s{s} p{i}")


def test_final_pbmap_matches_oracle(scene_and_results):
    sb, py_local, pb, cpp = scene_and_results
    assert len(pb.planes) == len(cpp["final"]), "final plane count"
    for i, (p, cp) in enumerate(zip(pb.planes, cpp["final"])):
        _assert_plane_close(_snapshot(p), cp, f"final p{i}")
        np.testing.assert_allclose(
            np.asarray(p.hist_h, float), cp["hist"], atol=1e-12,
            err_msg=f"final p{i} hue histogram",
        )


def test_randomized_scenes_match_oracle(tmp_path):
    """Fuzz: random wall subsets / offsets / colors, three seeds — the
    merge DECISIONS (which patches fuse) must agree, not just the params on
    one hand-built scene."""
    for seed in (7, 19, 31):
        rng = np.random.default_rng(seed)
        sb = SceneBuilder(rng)
        for w in range(N_SENSORS):
            if rng.random() < 0.25:
                continue
            origin, a1, a2 = _wall(w)
            viewers = [(w, -0.2)]
            if rng.random() < 0.7:
                viewers.append(((w + 1) % N_SENSORS, rng.uniform(0.1, 0.35)))
            for s, off in viewers:
                z_off = rng.uniform(-0.3, 0.3)
                pts = sb.grid_patch(
                    origin + off * a1 + z_off * a2, a1, a2,
                    rng.uniform(0.3, 0.5), rng.uniform(0.3, 0.5),
                )
                sb.add_patch(s, pts, rng.integers(30, 220, size=3))
        local = []
        for s in range(N_SENSORS):
            sen = sb.sensors[s]
            pl = _planes_from_labels(sen["xyz"], sen["rgb"], sen["labels"], s)
            for p in pl:
                p.transform(sen["Rt"])
            local.append(pl)
        pb = merge_planes(group_planes(local))

        path = tmp_path / f"rand_{seed}.bin"
        planes_oracle.pack(
            str(path), sb.sensors, int(MIN_INLIERS), float(MIN_AREA),
            float(MAX_ELONGATION), float(MAX_CURVATURE),
        )
        cpp = planes_oracle.run(str(path))
        assert len(pb.planes) == len(cpp["final"]), f"seed {seed} final count"
        for i, (p, cp) in enumerate(zip(pb.planes, cpp["final"])):
            _assert_plane_close(_snapshot(p), cp, f"seed {seed} p{i}")


def test_edge_only_contact_exercises_branch_c(tmp_path):
    """Two coplanar CROSS-arranged strips whose hull VERTICES are all far
    apart (>0.5 m) but whose edges intersect: only the reference's edge-edge
    branch c) (Frame360.h:694-710, :798-811) can fuse them — this pins the
    segment-distance + literal loop-pairing semantics on both the group
    (adjacent sensors) and the global merge (non-adjacent) paths."""
    rng = np.random.default_rng(3)
    sb = SceneBuilder(rng)
    fa1, fa2 = np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0])
    # zero noise: each strip's hull is exactly its 4 corners, so the
    # closest VERTICES of the crossing strips stay ~1.2 m apart while the
    # crossing edges touch — only branch c) can fire
    # group phase: sensors 0 and 1 (adjacent)
    c1 = np.array([1.5, 0.5, -1.0])
    sb.add_patch(0, sb.grid_patch(c1, fa1, fa2, 1.1, 0.25, n1=36, n2=4, noise=0.0), (200, 80, 80))
    sb.add_patch(1, sb.grid_patch(c1, fa2, fa1, 1.1, 0.25, n1=36, n2=4, noise=0.0), (80, 200, 80))
    # merge phase: sensors 2 and 6 (non-adjacent)
    c2 = np.array([-1.2, -0.8, 1.1])
    sb.add_patch(2, sb.grid_patch(c2, fa1, fa2, 1.1, 0.25, n1=36, n2=4, noise=0.0), (80, 80, 200))
    sb.add_patch(6, sb.grid_patch(c2, fa2, fa1, 1.1, 0.25, n1=36, n2=4, noise=0.0), (200, 200, 80))

    local = []
    for s in range(N_SENSORS):
        sen = sb.sensors[s]
        pl = _planes_from_labels(sen["xyz"], sen["rgb"], sen["labels"], s)
        for p in pl:
            p.transform(sen["Rt"])
        local.append(pl)
    # the scene is what it claims: min vertex-vertex distance is far above
    # every vertex threshold, so only edge-edge can fuse
    for pair in ((local[0][0], local[1][0]), (local[2][0], local[6][0])):
        dd = np.linalg.norm(
            pair[0].hull[:, None, :] - pair[1].hull[None, :, :], axis=-1
        ).min()
        assert dd > 0.5, f"vertices too close ({dd:.2f}): branch c not isolated"
    pb = merge_planes(group_planes(local))

    path = tmp_path / "cross.bin"
    planes_oracle.pack(
        str(path), sb.sensors, int(MIN_INLIERS), float(MIN_AREA),
        float(MAX_ELONGATION), float(MAX_CURVATURE),
    )
    cpp = planes_oracle.run(str(path))
    assert len(cpp["final"]) == 2, "edge-edge contact did not fuse the crosses"
    assert len(pb.planes) == len(cpp["final"])
    for i, (p, cp) in enumerate(zip(pb.planes, cpp["final"])):
        _assert_plane_close(_snapshot(p), cp, f"cross p{i}")


def _plane_both_reprs(rng, origin, a1, a2, n=120):
    """One planar patch as (points-repr, moments-repr) Plane twins."""
    from rgbd360_tpu.core.pbmap import HIST_H_BINS, Plane, rgb_to_hue_hist

    t = rng.uniform(-0.4, 0.4, size=(n, 2))
    pts = np.asarray(origin) + t[:, :1] * np.asarray(a1) + t[:, 1:] * np.asarray(a2)
    pts = pts + rng.normal(0, 2e-3, size=pts.shape)
    cols = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    center = pts.mean(axis=0)
    cov = (pts - center).T @ (pts - center) / n
    w, v = np.linalg.eigh(cov)
    normal = v[:, 0] if v[:, 0] @ center <= 0 else -v[:, 0]
    curv = float(w[0] / w.sum())

    def mk(points_repr):
        p = Plane(
            id=0, normal=normal.copy(), center=center.copy(),
            d=float(-normal @ center), curvature=curv,
        )
        if points_repr:
            p.points = pts.copy()
            p.colors = cols.copy()
            p.compute_colors()
        else:
            p.n_pts = n
            p.cov = cov.copy()
            hist = rgb_to_hue_hist(cols)
            p.hist_counts = hist * n  # raw counts
            p.hist_h = hist
            p.main_color = cols.mean(axis=0) / 255.0
        p.compute_hull_area(pts)
        return p

    return mk(True), mk(False)


def test_merge_plane_moments_equals_points():
    """Plane.merge_plane's sufficient-statistics branch (the device
    extraction path) must equal the point-union re-estimation branch — the
    branch the C++ oracle executes. This closes the chain: oracle gates the
    points semantics, this gates moments == points."""
    rng = np.random.default_rng(11)
    fa1, fa2 = np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0])
    a_pts, a_mom = _plane_both_reprs(rng, np.array([0.5, 0.2, -1.3]), fa1, fa2)
    b_pts, b_mom = _plane_both_reprs(rng, np.array([0.9, 0.3, -1.31]), fa1, fa2)

    a_pts.merge_plane(b_pts)
    a_mom.merge_plane(b_mom)

    np.testing.assert_allclose(a_mom.center, a_pts.center, atol=1e-12)
    np.testing.assert_allclose(a_mom.normal, a_pts.normal, atol=1e-9)
    assert abs(a_mom.d - a_pts.d) < 1e-9
    assert abs(a_mom.curvature - a_pts.curvature) < 1e-12
    np.testing.assert_allclose(a_mom.area_hull, a_pts.area_hull, rtol=1e-12)
    np.testing.assert_allclose(a_mom.elongation, a_pts.elongation, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(a_mom.hist_h), np.asarray(a_pts.hist_h), atol=1e-12
    )
    assert a_mom.n_pts == 240
