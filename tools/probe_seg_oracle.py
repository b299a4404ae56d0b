"""Exploratory device-vs-oracle comparison for the region-growing segmenter
(run before pinning the gates in tests/test_seg_oracle.py).

Per bundled frame and per sensor:
  1. pre-refine partition: segment_planes vs the oracle's sequential
     union-find CCL — expected EXACT (same predicate arithmetic, both label
     by component-minimum pixel index, connected components of a symmetric
     predicate are schedule-independent);
  2. post-refine labels: pixel diff count (scheduling/model differences);
  3. local plane sets (_planes_from_labels + transform + local merge vs the
     oracle's L stage): matched-pair parameter deltas;
  4. what a segment-stage curvature<0.001 gate (the believed PCL default)
     would change on the bundled frames.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tools import planes_oracle  # noqa: E402

REF = "/root/reference"


def main():
    import jax.numpy as jnp

    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.core.plane_extraction import (
        MAX_ELONGATION, MIN_AREA, _planes_from_labels, local_same_plane_merge,
    )
    from rgbd360_tpu.core.plane_extraction import build_sensor_clouds
    from rgbd360_tpu.io.calib import Calib360
    from rgbd360_tpu.ops.planes_seg import (
        ANGULAR_THRESHOLD, DISTANCE_THRESHOLD, MIN_INLIERS, segment_planes,
    )

    calib = Calib360.load(REF)
    for fname in ("sphere_images_1.bin", "sphere_images_10.bin"):
        frame = Frame360(calib, 0).build(os.path.join(REF, "samples", fname))
        xyz2, rgb2, normals, labels_ref = build_sensor_clouds(
            frame.depth_undistorted_m, jnp.asarray(frame.rgb)
        )
        xyz2 = np.asarray(xyz2, np.float32)
        rgb2 = np.asarray(rgb2, np.uint8)
        normals = np.asarray(normals, np.float32)
        labels_refined = np.asarray(labels_ref)

        sensors = []
        for s in range(8):
            sensors.append(
                dict(
                    H=xyz2.shape[1], W=xyz2.shape[2],
                    Rt=np.asarray(calib.Rt[s], np.float64),
                    xyz=xyz2[s], rgb=rgb2[s], normals=normals[s],
                )
            )
        inp = "/tmp/seg_oracle_in.bin"
        side = "/tmp/seg_oracle_labels.bin"
        planes_oracle.pack_seg(
            inp, sensors, MIN_INLIERS, MIN_AREA, MAX_ELONGATION,
            0.0013, ANGULAR_THRESHOLD, DISTANCE_THRESHOLD,
        )
        res = planes_oracle.run(inp, labels_path=side)
        sides = planes_oracle.read_labels_sidecar(
            side, [(xyz2.shape[1], xyz2.shape[2])] * 8
        )
        from rgbd360_tpu.core.plane_extraction import extract_frame_planes

        _pbmap, local_dev = extract_frame_planes(frame)

        print(f"== {fname}")
        for s in range(8):
            pre_dev = np.asarray(segment_planes(jnp.asarray(xyz2[s]), jnp.asarray(normals[s])))
            pre_orc, post_orc = sides[s]
            pre_diff = int((pre_dev != pre_orc).sum())
            post_diff = int((labels_refined[s] != post_orc).sum())
            # local planes, PRODUCTION device path (stats buffer -> host fit:
            # reported params are the segment-stage pre-refine fits, like the
            # oracle's L stage)
            dev_planes = local_dev[s]
            orc_planes = res["local"].get(s, [])
            print(
                f"  s{s}: pre diff {pre_diff:6d}px  post diff {post_diff:6d}px  "
                f"planes dev {len(dev_planes)} vs orc {len(orc_planes)}"
            )
            for k, (dp, op) in enumerate(zip(dev_planes, orc_planes)):
                dn = float(np.dot(dp.normal, op["normal"]))
                dc = float(np.linalg.norm(dp.center - op["center"]))
                da = abs(dp.area_hull - op["area"]) / max(op["area"], 1e-9)
                dN = abs(dp.n_pts - op["n"])
                print(
                    f"     p{k}: ndot {dn:+.6f} dc {dc * 1000:7.2f}mm "
                    f"darea {da * 100:5.2f}% dN {dN:5d} "
                    f"curv dev {dp.curvature:.2e} orc {op['curvature']:.2e}"
                )

        # what would PCL's believed-default segment curvature gate change?
        planes_oracle.pack_seg(
            inp, sensors, MIN_INLIERS, MIN_AREA, MAX_ELONGATION,
            0.0013, ANGULAR_THRESHOLD, DISTANCE_THRESHOLD,
            seg_max_curvature=0.001,
        )
        res_gate = planes_oracle.run(inp)
        n_now = sum(len(v) for v in res["local"].values())
        n_gate = sum(len(v) for v in res_gate["local"].values())
        print(f"  local planes without/with curvature<0.001 gate: {n_now} / {n_gate}")


def _pl_transformed(p, rt):
    p.transform(rt)
    return p


if __name__ == "__main__":
    main()
