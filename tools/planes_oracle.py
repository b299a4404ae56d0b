"""Build/pack/run helpers for the standalone C++ plane-layer oracle.

The oracle (tools/cpp_oracle/planes_oracle.cpp) is an independently written
C++ implementation of the plane-extraction host layer — getPlanesSensor's
per-region statistics/filters/local-merge, groupPlanes and mergePlanes
(reference include/Frame360.h:657-832, :979-1075) — used to gate
core/plane_extraction.py and core/pbmap.py against real, compiled C++
(PARITY_AUDIT.md: breaking the plane layer's parity self-reference,
VERDICT r3 #4).
"""

from __future__ import annotations

import os
import struct
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "cpp_oracle", "planes_oracle.cpp")
BIN = os.path.join(_HERE, "cpp_oracle", "planes_oracle")

MAGIC = 0x504C4E53  # "PLNS": labels provided as input
MAGIC_SEG = 0x504C4E54  # "PLNT": oracle runs its own scalar region growing


def build(force: bool = False) -> str:
    """Compile the oracle with g++ -O2; returns the binary path."""
    if force or not os.path.exists(BIN) or os.path.getmtime(BIN) < os.path.getmtime(SRC):
        subprocess.run(
            ["g++", "-O2", "-std=c++14", "-o", BIN, SRC],
            check=True,
            capture_output=True,
        )
    return BIN


def pack(
    path: str,
    sensors: list,  # dicts: H, W, Rt (4,4), xyz (H,W,3), rgb (H,W,3) u8, labels (H,W) i32
    min_inliers: int,
    min_area: float,
    max_elongation: float,
    max_curvature: float,
) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<3i", MAGIC, len(sensors), min_inliers))
        f.write(struct.pack("<3d", min_area, max_elongation, max_curvature))
        for s in sensors:
            h, w = int(s["H"]), int(s["W"])
            f.write(struct.pack("<2i", h, w))
            f.write(np.ascontiguousarray(s["Rt"], np.float64).reshape(16).tobytes())
            f.write(np.ascontiguousarray(s["xyz"], np.float64).reshape(-1).tobytes())
            f.write(np.ascontiguousarray(s["rgb"], np.uint8).reshape(-1).tobytes())
            f.write(np.ascontiguousarray(s["labels"], np.int32).reshape(-1).tobytes())


def pack_seg(
    path: str,
    sensors: list,  # dicts: H, W, Rt (4,4), xyz f32 (H,W,3) NaN-invalid,
    #                        rgb (H,W,3) u8, normals f32 (H,W,3) NaN-invalid
    min_inliers: int,
    min_area: float,
    max_elongation: float,
    max_curvature: float,
    angular_threshold: float,
    distance_threshold: float,
    seg_max_curvature: float = 1e9,  # +inf-like default mirrors the in-repo
    # pipeline (no segment-stage curvature drop); pass 0.001 to evaluate the
    # believed-PCL-default gate (see planes_oracle.cpp header note)
) -> None:
    """Segment-mode input: the oracle computes labels itself (sequential
    scalar union-find CCL + model-gated refine), then runs the same
    downstream as pack()."""
    with open(path, "wb") as f:
        f.write(struct.pack("<3i", MAGIC_SEG, len(sensors), min_inliers))
        f.write(struct.pack("<3d", min_area, max_elongation, max_curvature))
        f.write(
            struct.pack(
                "<3d", angular_threshold, distance_threshold, seg_max_curvature
            )
        )
        for s in sensors:
            h, w = int(s["H"]), int(s["W"])
            f.write(struct.pack("<2i", h, w))
            f.write(np.ascontiguousarray(s["Rt"], np.float64).reshape(16).tobytes())
            f.write(np.ascontiguousarray(s["xyz"], np.float32).reshape(-1).tobytes())
            f.write(np.ascontiguousarray(s["rgb"], np.uint8).reshape(-1).tobytes())
            f.write(
                np.ascontiguousarray(s["normals"], np.float32).reshape(-1).tobytes()
            )


def read_labels_sidecar(path: str, shapes: list) -> list:
    """Parse the seg-mode label sidecar: per sensor, pre- then post-refine
    (H, W) i32 blocks, in input order. Returns [(pre, post), ...]."""
    out = []
    with open(path, "rb") as f:
        for h, w in shapes:
            pre = np.frombuffer(f.read(h * w * 4), np.int32).reshape(h, w)
            post = np.frombuffer(f.read(h * w * 4), np.int32).reshape(h, w)
            out.append((pre, post))
        assert not f.read(1), "trailing bytes in label sidecar"
    return out


def _parse_plane(fields):
    vals = [float(x) for x in fields]
    return {
        "n": int(vals[0]),
        "center": np.array(vals[1:4]),
        "normal": np.array(vals[4:7]),
        "d": vals[7],
        "curvature": vals[8],
        "area": vals[9],
        "elongation": vals[10],
    }


def run(input_path: str, labels_path: str = None) -> dict:
    """Execute the oracle; returns {'local': {sensor: [plane...]},
    'group': [plane...], 'final': [plane...]} with per-plane param dicts
    ('final' planes carry a 74-bin 'hist'). labels_path (seg-mode inputs
    only) receives the computed pre/post-refine label images."""
    cmd = [build(), input_path]
    if labels_path is not None:
        cmd.append(labels_path)
    out = subprocess.run(cmd, check=True, capture_output=True, text=True).stdout
    res = {"local": {}, "group": [], "final": []}
    for line in out.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "L":
            s, idx = int(parts[1]), int(parts[2])
            res["local"].setdefault(s, []).append(_parse_plane(parts[3:]))
            assert idx == len(res["local"][s]) - 1
        elif parts[0] == "G":
            res["group"].append(_parse_plane(parts[2:]))
        elif parts[0] == "F":
            res["final"].append(_parse_plane(parts[2:]))
        elif parts[0] == "H":
            idx = int(parts[1])
            res["final"][idx]["hist"] = np.array([float(x) for x in parts[2:]])
    return res
