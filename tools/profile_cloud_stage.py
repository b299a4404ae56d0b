"""Sub-bisect the cloud stage of the plane-extraction device program:
backproject -> median downsample -> fast bilateral. Chained probes.

Usage: python tools/profile_cloud_stage.py [--k 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.io.calib import Calib360
    from rgbd360_tpu.ops.bilateral import fast_bilateral_z
    from rgbd360_tpu.ops.pinhole import backproject_organized, downsample_median2

    ref = os.environ.get("RGBD360_REFERENCE", "/root/reference")
    calib = Calib360.load(ref)
    frame = Frame360(calib)
    frame.load_frame(os.path.join(ref, "samples/sphere_images_1.bin"))
    frame.undistort()

    depth = jnp.asarray(frame.depth_undistorted_m)
    rgb = jnp.asarray(frame.rgb)

    def sync():
        np.asarray(jnp.zeros(()) + 1.0)

    def upto(stage):
        def one(d, rgb_s):
            xyz = backproject_organized(d)
            out = jnp.nansum(xyz)
            if stage >= 1:
                xyz2, rgb2 = downsample_median2(xyz, rgb_s)
                out = out + jnp.nansum(xyz2) + jnp.sum(rgb2)
            if stage >= 2:
                zf = fast_bilateral_z(xyz2[..., 2])
                out = out + jnp.nansum(zf)
            return out.astype(jnp.float32)

        @jax.jit
        def chain(d, k):
            def body(_, carry):
                v, acc = carry
                out = jnp.sum(jax.vmap(one)(v, rgb)) * 1e-9
                return depth + (out * 1e-12).astype(jnp.float32), acc + out

            _, acc = jax.lax.fori_loop(0, k, body, (d, jnp.float32(0)))
            return acc

        return chain

    prev = 0.0
    for stage, name in enumerate(["backproject", "+downsample", "+bilateral"]):
        chain = upto(stage)
        np.asarray(chain(depth, args.k))
        sync()
        t0 = time.perf_counter()
        np.asarray(chain(depth, args.k))
        ms = (time.perf_counter() - t0) / args.k * 1e3
        print(f"{name:12s}: {ms:7.1f} ms cumulative ({ms - prev:+6.1f} ms stage)")
        prev = ms


if __name__ == "__main__":
    main()
