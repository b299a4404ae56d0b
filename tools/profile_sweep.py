"""Per-stage timing of the L0 fused sweep on the real TPU (PERF.md
methodology: k-chained iterations inside one jit with a value-bearing
dependency, host transfer to synchronize, RPC floor subtracted).

Usage: python tools/profile_sweep.py [--batch 4] [--k 200]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # the persistent compile cache (host-feature-keyed dir + min-compile-time)
    # is configured by the package import below — a literal dir here would
    # bypass the keying and reintroduce the cross-host AOT SIGILL hazard

    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.io.calib import Calib360
    from rgbd360_tpu.ops import photoicp
    from rgbd360_tpu.ops.sphere import sphere_project, sphere_xyz_lut

    ref = os.environ.get("RGBD360_REFERENCE", "/root/reference")
    calib = Calib360.load(ref)
    f_trg = Frame360(calib, 0).build(os.path.join(ref, "samples/sphere_images_1.bin"))
    f_src = Frame360(calib, 1).build(os.path.join(ref, "samples/sphere_images_10.bin"))

    B = args.batch
    gs = jnp.broadcast_to(f_src.sphere_gray, (B,) + f_src.sphere_gray.shape).copy()
    ds = jnp.broadcast_to(
        f_src.sphere_depth_mm.astype(jnp.float32) * 1e-3, (B, 320, 1920)
    ).copy()
    gt = jnp.broadcast_to(f_trg.sphere_gray, (B, 320, 1920)).copy()
    dt = jnp.broadcast_to(
        f_trg.sphere_depth_mm.astype(jnp.float32) * 1e-3, (B, 320, 1920)
    ).copy()

    # L0 level data per batch element (vmap-compatible closures below take
    # per-pair leaves; we vmap like parallel/batch.align_batch does)
    def level0(gsl, dsl, gtl, dtl):
        src = photoicp.build_pyramid_set(gsl, dsl, 1, is_target=False, sphere_seam_mask=True)
        trg = photoicp.build_pyramid_set(gtl, dtl, 1, is_target=True, sphere_seam_mask=True)
        lvl = photoicp.make_level_data(src, trg, 0)
        xyz, valid = sphere_xyz_lut(lvl.depth_src, 0.3, 6.0)
        planes = photoicp.pack_target_planes8(lvl)
        return lvl, xyz, valid, planes

    lvls, xyzs, valids, planes = jax.vmap(level0)(gs, ds, gt, dt)
    pose0 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

    eps = np.zeros((4, 4), np.float32)
    eps[:3, 3] = 1e-7
    eps = jnp.asarray(eps)

    def chain(fn, k):
        """fn(pose) -> scalar per batch; chained k times."""

        @jax.jit
        def run(p0):
            def body(_, carry):
                p, acc = carry
                e = fn(p)
                return p0 + e[:, None, None] * eps, acc + e

            _, acc = jax.lax.fori_loop(0, k, body, (p0, jnp.zeros(B)))
            return acc

        np.asarray(run(pose0))  # compile+warm
        np.asarray(jnp.zeros(B) + 1.0)
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(B) + 1.0)
        floor = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(pose0))
        return (time.perf_counter() - t0 - floor) / k * 1e3  # ms per iter

    h, w = 320, 1920

    def full_sweep(p):
        def one(lvl, xyz, valid, pl8, pose):
            err, H, g, sso, *_ = photoicp.fused_sweep_sphere(
                lvl.gray_src.reshape(-1), pl8, (h, w), xyz, valid, pose,
                photoicp.PHOTO_DEPTH,
            )
            return err + jnp.sum(H) * 0.0 + jnp.sum(g) * 0.0

        return jax.vmap(one)(lvls, xyzs, valids, planes, p)

    def project_only(p):
        def one(xyz, valid, pose):
            pp = xyz @ pose[:3, :3].T + pose[:3, 3]
            dist, r_i, c_i, inb = sphere_project(pp, h, w)
            return jnp.sum(dist * inb) * 1e-9 + jnp.sum(r_i + c_i) * 1e-12

        return jax.vmap(one)(xyzs, valids, p)

    def gather_only(p):
        from rgbd360_tpu.ops.warp_gather import warp_gather

        def one(xyz, valid, pl8, pose):
            pp = xyz @ pose[:3, :3].T + pose[:3, 3]
            dist, r_i, c_i, inb = sphere_project(pp, h, w)
            vis = valid & inb
            sr = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            sc = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            r2 = jnp.where(vis.reshape(h, w), jnp.clip(r_i, 0, h - 1).reshape(h, w), sr)
            c2 = jnp.where(vis.reshape(h, w), jnp.clip(c_i, 0, w - 1).reshape(h, w), sc)
            out, m = warp_gather(pl8, r2, c2)
            return jnp.sum(out[0]) * 1e-9 + jnp.sum(m) * 1e-12

        return jax.vmap(one)(xyzs, valids, planes, p)

    for name, fn in [
        ("project_only", project_only),
        ("project+gather", gather_only),
        ("full_sweep", full_sweep),
    ]:
        ms = chain(fn, args.k)
        print(f"{name:>16}: {ms:8.3f} ms / L0 sweep (batch {B})")


if __name__ == "__main__":
    main()
