"""Tile-occupancy probe for the salient-compaction headroom question
(VERDICT r4 #3): what fraction of the warp kernel's (8,128) source tiles
could be skipped at all?

The kernel prices every tile; the reference's scalar loops skip pixels.
A tile is PRE-GATHER skippable only if no pixel in it is visible (valid
source depth AND in-bounds projection) — saliency is evaluated on the
TARGET gradients gathered AT the warped position
(ops/photoicp.py::_warp_terms, reference RegisterPhotoICP.h:2690-2692
reads the warped gradient before its `continue`), so a saliency-based
skip cannot be known before the gather even in the reference.

Prints, per kernel-routed level (L0-L2) and per pose along the bundled
pair's GN trajectory: the all-invisible tile fraction (the hard ceiling
on any tile-compaction win) and the pixel-level visible fraction.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from rgbd360_tpu.ops import photoicp  # noqa: E402
from rgbd360_tpu.ops.sphere import sphere_project, sphere_xyz_lut  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "pair_1_10.npz")
BR, BC = 8, 128


def tile_stats(depth_src, pose, h, w):
    xyz, valid = sphere_xyz_lut(depth_src, photoicp.MIN_DEPTH, photoicp.MAX_DEPTH)
    p = xyz @ jnp.asarray(pose[:3, :3].T, jnp.float32) + jnp.asarray(
        pose[:3, 3], jnp.float32
    )
    _, _, _, inb = sphere_project(p, h, w)
    vis = np.asarray(valid & inb).reshape(h, w)
    hp, wp = -(-h // BR) * BR, -(-w // BC) * BC
    visp = np.zeros((hp, wp), bool)
    visp[:h, :w] = vis
    t = visp.reshape(hp // BR, BR, wp // BC, BC).any(axis=(1, 3))
    return 1.0 - t.mean(), vis.mean()


def main():
    d = np.load(GOLDEN)
    gray_s = jnp.asarray(d["gray_src_u8"].astype(np.float32) / 255.0)
    depth_s = jnp.asarray(d["depth_src_mm"].astype(np.float32) * 0.001)
    gray_t = jnp.asarray(d["gray_trg_u8"].astype(np.float32) / 255.0)
    depth_t = jnp.asarray(d["depth_trg_mm"].astype(np.float32) * 0.001)

    res = photoicp.align_spheres_jit(
        gray_s, depth_s, gray_t, depth_t, jnp.eye(4),
        method=photoicp.PHOTO_DEPTH, n_levels=5,
    )
    pose_conv = np.asarray(res.pose, np.float64)
    print("converged |t| =", np.linalg.norm(pose_conv[:3, 3]),
          "iters", np.asarray(res.num_iterations))

    h0, w0 = depth_s.shape
    # kernel-routed levels at full res: L0-L2 (>= 30k px)
    for lvl in range(3):
        h, w = h0 >> lvl, w0 >> lvl
        if h * w < photoicp.WARP_KERNEL_MIN_PIXELS:
            break
        dl = depth_s if lvl == 0 else jnp.asarray(
            np.asarray(depth_s)[:: 1 << lvl, :: 1 << lvl]
        )  # nearest decimation is a fine occupancy proxy for this probe
        for name, pose in (("identity", np.eye(4)), ("converged", pose_conv)):
            empty, visfrac = tile_stats(dl, pose, h, w)
            print(
                f"L{lvl} ({h}x{w}) pose={name:9s}: "
                f"all-invisible tiles {empty * 100:5.1f}%   "
                f"visible pixels {visfrac * 100:5.1f}%"
            )


if __name__ == "__main__":
    main()
