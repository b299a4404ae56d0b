"""Extrinsic calibration of the 8-sensor rig from matched planes
(reference include/Calibrator.h: ControlPlanes :42-171, PairCalibrator
:373-760, Calibrator :763-1199).

Correspondence rows follow the reference layout: [n1(3), d1, n2(3), d2]
for a plane observed by two sensors. The decoupled closed form:
  rotation:     Kabsch on sum n2 n1^T with a conditioning gate
                (max/min singular value, reference :419-436)
  translation:  least squares on n1 . t = d2 - d1 (reference :644-699)
Construction-spec initialization: each sensor pose is a 45 deg turn of the
previous about the rig axis (reference :763-776).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from rgbd360_tpu.config import default_params

CONDITIONING_GATE = 100.0  # reference Calibrator.h:422
NUM_SENSORS = 8


def construction_specs() -> np.ndarray:
    """Ideal rig: sensor s is a 45 deg rotation (about the panorama's up/x
    axis) of sensor s-1 with alternating vertical offsets — mirroring the
    shipped Rt files (Calibration/Extrinsics) and Calibrator.h:763-776."""
    rts = np.tile(np.eye(4, dtype=np.float64), (NUM_SENSORS, 1, 1))
    for s in range(NUM_SENSORS):
        a = np.deg2rad(45.0 * s)
        c, si = np.cos(a), np.sin(a)
        rts[s, :3, :3] = np.array([[1, 0, 0], [0, c, -si], [0, si, c]])
        rts[s, 2, 3] = 0.052 if s % 2 == 0 else -0.052
    return rts


@dataclasses.dataclass
class PlaneCorrespondences:
    """ControlPlanes: plane matches between sensor pairs
    (reference Calibrator.h:42-171)."""

    rows: Dict[tuple, List[np.ndarray]] = dataclasses.field(default_factory=dict)

    def add(self, s1: int, s2: int, n1, d1, n2, d2) -> None:
        key = (min(s1, s2), max(s1, s2))
        if s1 > s2:
            n1, d1, n2, d2 = n2, d2, n1, d1
        self.rows.setdefault(key, []).append(
            np.concatenate([np.asarray(n1, float), [float(d1)], np.asarray(n2, float), [float(d2)]])
        )

    def matrix(self, s1: int, s2: int) -> np.ndarray:
        key = (min(s1, s2), max(s1, s2))
        rows = self.rows.get(key, [])
        return np.stack(rows) if rows else np.zeros((0, 8))

    def conditioning(self, s1: int, s2: int) -> float:
        """max/min singular value of the normal covariance
        (reference calcConditioning, Calibrator.h:1190-1199)."""
        m = self.matrix(s1, s2)
        if len(m) < 3:
            return np.inf
        cov = m[:, :3].T @ m[:, :3]
        sv = np.linalg.svd(cov, compute_uv=False)
        return float(sv[0] / max(sv[-1], 1e-12))


class PairCalibrator:
    """Relative pose of sensor 2 wrt sensor 1 from plane matches."""

    def __init__(self):
        self.rt_estimated = np.eye(4)
        self.correspondences = np.zeros((0, 8))

    def set_init_rt(self, rt: np.ndarray) -> None:
        self.rt_estimated = np.asarray(rt, np.float64).copy()

    def calibrate_rotation(self) -> Optional[np.ndarray]:
        """Closed-form SVD rotation (reference Calibrator.h:373-439)."""
        c = self.correspondences
        if len(c) < 3:
            return None
        cov = np.zeros((3, 3))
        for row in c:
            cov += np.outer(row[4:7], row[:3])  # n2 n1^T
        U, S, Vt = np.linalg.svd(cov)
        if S[0] / max(S[-1], 1e-12) > CONDITIONING_GATE:
            return None
        R = Vt.T @ U.T
        if np.linalg.det(R) < 0:
            R = Vt.T @ np.diag([1.0, 1.0, -1.0]) @ U.T
        self.rt_estimated[:3, :3] = R
        return R

    def calibrate_translation(self) -> Optional[np.ndarray]:
        """LS translation from plane offsets (reference Calibrator.h:644-699)."""
        c = self.correspondences
        if len(c) < 3:
            return None
        H = np.zeros((3, 3))
        g = np.zeros(3)
        for row in c:
            n1 = row[:3]
            H += np.outer(n1, n1)
            g += n1 * (row[7] - row[3])  # d2 - d1
        sv = np.linalg.svd(H, compute_uv=False)
        if sv[0] / max(sv[-1], 1e-12) > default_params.threshold_conditioning:
            return None
        t = np.linalg.solve(H, g)
        self.rt_estimated[:3, 3] = t
        return t

    def calibrate_pair(self) -> Optional[np.ndarray]:
        """CalibratePair = rotation then translation (reference :701-760)."""
        if self.calibrate_rotation() is None:
            return None
        if self.calibrate_translation() is None:
            return None
        return self.rt_estimated


class Calibrator:
    """8-sensor rig calibration chaining adjacent pair calibrations from the
    construction-spec initialization (reference Calibrator.h:871-1186)."""

    def __init__(self, correspondences: PlaneCorrespondences):
        self.corresp = correspondences
        self.rt = construction_specs()

    def calibrate(self) -> np.ndarray:
        """Sensor 0 is the reference; each consecutive pair that is
        well-conditioned refines the chained extrinsics."""
        rel = [np.eye(4) for _ in range(NUM_SENSORS)]
        for s in range(1, NUM_SENSORS):
            pair = PairCalibrator()
            pair.correspondences = self.corresp.matrix(s - 1, s)
            init = np.linalg.inv(self.rt[s - 1]) @ self.rt[s]
            pair.set_init_rt(init)
            est = pair.calibrate_pair()
            rel[s] = est if est is not None else init
        for s in range(1, NUM_SENSORS):
            self.rt[s] = self.rt[s - 1] @ rel[s]
        return self.rt
