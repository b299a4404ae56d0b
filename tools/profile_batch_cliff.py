"""Diagnose the batch-6/8 throughput cliff (VERDICT r3 next-round #1a).

Measured history (PERF.md): per-PAIR align cost roughly doubles from batch 4
to batch 8 (91.9 -> 51.8 pairs/s at VR=2) — recorded as a fact, never
diagnosed. Hypotheses this script separates, per batch size:

  * the Mosaic kernel itself (its batch axis is a SEQUENTIAL grid dimension,
    so per-pair kernel cost should be flat — if gather_only scales
    superlinearly, Mosaic/XLA is doing something per-batch-shape)
  * the XLA glue around it (project/pack/reduction fusions changing layout
    or spilling at larger live sets: full_sweep vs gather_only)
  * whole-align HBM pressure (compiled.memory_analysis() temp/argument
    bytes for the real align_batch executable at each batch)
  * the coarse XLA-path levels (sub-30k px sweeps at each batch)

Usage: python tools/profile_batch_cliff.py [--batches 2,4,5,6,8] [--k 100]
(real TPU; ~1-2 min per batch size, dominated by compiles on first run)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,5,6,8")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--align-iters", type=int, default=4)
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
    from rgbd360_tpu.parallel.batch import align_batch

    ref = os.environ.get("RGBD360_REFERENCE", "/root/reference")
    calib = Calib360.load(ref)
    f_trg = Frame360(calib, 0).build(os.path.join(ref, "samples/sphere_images_1.bin"))
    f_src = Frame360(calib, 1).build(os.path.join(ref, "samples/sphere_images_10.bin"))
    h, w = 320, 1920

    gray_src = np.asarray(f_src.sphere_gray)
    depth_src = np.asarray(f_src.sphere_depth_mm, np.float32) * 1e-3
    gray_trg = np.asarray(f_trg.sphere_gray)
    depth_trg = np.asarray(f_trg.sphere_depth_mm, np.float32) * 1e-3

    eps = np.zeros((4, 4), np.float32)
    eps[:3, 3] = 1e-7

    def rep(x, B):
        return jnp.asarray(np.broadcast_to(x, (B,) + x.shape).copy())

    def chain_ms(fn, B, pose0, k):
        epsj = jnp.asarray(eps)

        @jax.jit
        def run(p0):
            def body(_, carry):
                p, acc = carry
                e = fn(p)
                return p0 + e[:, None, None] * epsj, acc + e

            _, acc = jax.lax.fori_loop(0, k, body, (p0, jnp.zeros(B)))
            return acc

        np.asarray(run(pose0))
        np.asarray(jnp.zeros(B) + 1.0)
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(B) + 1.0)
        floor = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(pose0))
        return (time.perf_counter() - t0 - floor) / k * 1e3

    for B in [int(x) for x in args.batches.split(",")]:
        gs, ds = rep(gray_src, B), rep(depth_src, B)
        gt, dt = rep(gray_trg, B), rep(depth_trg, B)
        pose0 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

        def level0(gsl, dsl, gtl, dtl):
            src = photoicp.build_pyramid_set(gsl, dsl, 1, is_target=False, sphere_seam_mask=True)
            trg = photoicp.build_pyramid_set(gtl, dtl, 1, is_target=True, sphere_seam_mask=True)
            lvl = photoicp.make_level_data(src, trg, 0)
            xyz, valid = sphere_xyz_lut(lvl.depth_src, 0.3, 6.0)
            return lvl, xyz, valid, photoicp.pack_target_planes8(lvl)

        lvls, xyzs, valids, planes = jax.vmap(level0)(gs, ds, gt, dt)

        # coarse (XLA-path) level: L3-sized, 40x240
        def level3(gsl, dsl, gtl, dtl):
            src = photoicp.build_pyramid_set(gsl, dsl, 4, is_target=False, sphere_seam_mask=True)
            trg = photoicp.build_pyramid_set(gtl, dtl, 4, is_target=True, sphere_seam_mask=True)
            lvl = photoicp.make_level_data(src, trg, 3)
            xyz, valid = sphere_xyz_lut(lvl.depth_src, 0.3, 6.0)
            return lvl, xyz, valid, photoicp.pack_target_channels(lvl)

        lvls3, xyzs3, valids3, chans3 = jax.vmap(level3)(gs, ds, gt, dt)
        h3, w3 = lvls3.gray_src.shape[-2:]

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

        def full_sweep(p):
            def one(lvl, xyz, valid, pl8, pose):
                err, H, g, *_ = photoicp.fused_sweep_sphere(
                    lvl.gray_src.reshape(-1), pl8, (h, w), xyz, valid, pose,
                    photoicp.PHOTO_DEPTH,
                )
                return err + jnp.sum(H) * 0.0 + jnp.sum(g) * 0.0

            return jax.vmap(one)(lvls, xyzs, valids, planes, p)

        def coarse_sweep(p):
            def one(lvl, xyz, valid, ch, pose):
                err, H, g, *_ = photoicp.fused_sweep_sphere(
                    lvl.gray_src.reshape(-1), ch, (h3, w3), xyz, valid, pose,
                    photoicp.PHOTO_DEPTH,
                )
                return err + jnp.sum(H) * 0.0 + jnp.sum(g) * 0.0

            return jax.vmap(one)(lvls3, xyzs3, valids3, chans3, p)

        rows = []
        for name, fn, k in [
            ("project_only", project_only, args.k),
            ("project+gather", gather_only, args.k),
            ("L0 full_sweep", full_sweep, args.k),
            ("L3 xla_sweep", coarse_sweep, args.k),
        ]:
            ms = chain_ms(fn, B, pose0, k)
            rows.append((name, ms))

        # end-to-end align, chained
        epsj = jnp.asarray(eps)

        @jax.jit
        def align_chain(p0):
            def body(_, carry):
                p, acc = carry
                res = align_batch(gs, ds, gt, dt, p)
                return p0 + res.error[:, None, None] * epsj, acc + res.error

            _, acc = jax.lax.fori_loop(0, args.align_iters, body, (p0, jnp.zeros(B)))
            return acc

        np.asarray(align_chain(pose0))
        t0 = time.perf_counter()
        np.asarray(align_chain(pose0))
        dt_s = time.perf_counter() - t0
        pairs_s = B * args.align_iters / dt_s

        print(f"\n== batch {B} ==")
        for name, ms in rows:
            print(f"  {name:>16}: {ms:8.3f} ms/call  ({ms / B:7.3f} ms/pair)")
        print(f"  full align: {pairs_s:6.2f} pairs/s")

        # compiled memory analysis of the align executable
        try:
            lowered = align_batch.lower(gs, ds, gt, dt, pose0)
            mem = lowered.compile().memory_analysis()
            if mem is not None:
                gb = 1024.0**3
                print(
                    f"  memory_analysis: args {mem.argument_size_in_bytes / gb:.3f} GiB, "
                    f"out {mem.output_size_in_bytes / gb:.3f} GiB, "
                    f"temp {mem.temp_size_in_bytes / gb:.3f} GiB, "
                    f"peak(gen) {getattr(mem, 'generated_code_size_in_bytes', 0) / 1e6:.1f} MB code"
                )
        except Exception as exc:  # memory_analysis availability varies by backend
            print(f"  memory_analysis unavailable: {exc}")


if __name__ == "__main__":
    main()
