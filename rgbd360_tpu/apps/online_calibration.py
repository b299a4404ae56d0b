"""OnlineCalibration — streaming whole-rig extrinsic calibration
(reference Calibration/OnlineCalibration.cpp: accumulates control planes
from the live 8-sensor stream and re-runs the joint Calibrate() as data
arrives, reporting error/conditioning convergence; here the stream is a
recorded sphere sequence, since deployment has no sensor hardware —
SURVEY.md L0 note).

Usage: python -m rgbd360_tpu.apps.online_calibration <dataset_dir>
       [--first 1] [--sample 1] [--max-frames 10] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from rgbd360_tpu.apps.calibrate_rig import gather_control_planes
from rgbd360_tpu.apps.common import load_calib, sequence_files
from rgbd360_tpu.core.calibrator import Calibrator, PlaneCorrespondences
from rgbd360_tpu.core.frame360 import Frame360


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset")
    ap.add_argument("--first", type=int, default=1)
    ap.add_argument("--sample", type=int, default=1)
    ap.add_argument("--max-frames", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--calib-root", default=None)
    args = ap.parse_args(argv)

    calib = load_calib(args.calib_root)
    init_rt = calib.Rt.astype(np.float64)
    corresp = PlaneCorrespondences()
    cal = None

    n = 0
    for frame_no, path in sequence_files(args.dataset, args.first, args.sample):
        frame = Frame360(calib, frame_no).build(path)
        frame.get_planes()
        added = gather_control_planes(frame, corresp, init_rt)
        # re-solve with everything seen so far (the reference recalibrates
        # per spin of its online loop)
        cal = Calibrator(corresp)
        cal.calibrate()
        rot_err = cal.rotation_error2()
        trans_err = cal.translation_error2()
        total = sum(len(r) for r in corresp.rows.values())
        print(
            f"frame {frame_no}: +{added} planes (total {total}, "
            f"{len(corresp.rows)} pairs)  rotErr2={rot_err:.5f}  "
            f"transErr2={trans_err:.5f}  cond={cal.conditioning:.1f}"
        )
        n += 1
        if n >= args.max_frames:
            break

    if cal is None:
        print("no frames")
        return 1
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        for s in range(8):
            np.savetxt(os.path.join(args.out, f"Rt_0{s+1}.txt"), cal.rt[s], fmt="%10.6f")
        print(f"calibration -> {args.out}/Rt_0*.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
