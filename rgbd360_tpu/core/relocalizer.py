"""Relocalizer360 — brute-force relocalization against the map's keyframes
(reference include/Relocalizer360.h:78-93): PbMap-register the current frame
against all keyframes newest-first, accept at >=5 matched planes with
matched area > 10.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from rgbd360_tpu.core.map360 import Map360
from rgbd360_tpu.core.matcher import PLANAR_3DOF
from rgbd360_tpu.core.register_rgbd360 import RegisterRGBD360

MIN_MATCHES = 5
MIN_AREA = 10.0


class Relocalizer360:
    def __init__(self, map360: Map360, config_file: Optional[str] = None):
        self.map = map360
        self.registerer = RegisterRGBD360(config_file)
        self.reloc_kf: int = -1

    def relocalize(self, frame) -> Optional[Tuple[int, np.ndarray]]:
        """Returns (keyframe_id, relative_pose) or None."""
        for kf_id in range(len(self.map.frames) - 1, -1, -1):
            ok = self.registerer.register_pbmap(
                self.map.frames[kf_id], frame, 25, PLANAR_3DOF
            )
            if (
                ok
                and len(self.registerer.get_matched_planes()) >= MIN_MATCHES
                and self.registerer.get_area_matched() > MIN_AREA
            ):
                self.reloc_kf = kf_id
                return kf_id, self.registerer.get_pose()
        return None
