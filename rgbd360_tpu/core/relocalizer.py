"""Relocalizer360 — relocalization against the map's keyframes
(reference include/Relocalizer360.h:78-93): accept at >=5 matched planes with
matched area > 10, scanning newest-first.

The reference brute-forces a sequential PbMap registration per keyframe; the
rebuild evaluates every keyframe's unary plane-compatibility upper bound in
one batched device call (core/batch_match.py — a strict relaxation, so the
accepted keyframe is identical) and runs the exact interpretation-tree
registration only on survivors, newest-first.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from rgbd360_tpu.core.batch_match import prefilter_candidates
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

    def _survivors(self, frame):
        """Newest-first keyframe ids whose batched compatibility upper bound
        clears the acceptance gates."""
        kf_ids = list(range(len(self.map.frames)))
        pbmaps = [self.map.frames[k].planes for k in kf_ids]
        if any(p is None for p in pbmaps) or frame.planes is None:
            return list(reversed(kf_ids))  # no plane data to prefilter on
        counts, areas = prefilter_candidates(
            frame.planes, pbmaps, self.registerer.matcher.config, PLANAR_3DOF
        )
        return [
            k for k in reversed(kf_ids) if counts[k] >= MIN_MATCHES and areas[k] > MIN_AREA
        ]

    def relocalize(self, frame) -> Optional[Tuple[int, np.ndarray]]:
        """Returns (keyframe_id, relative_pose) or None."""
        for kf_id in self._survivors(frame):
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
