"""Bisect the exact-final stats cost on the real TPU (PERF.md methodology).

The with-stats headline trails the no-stats ceiling by ~10% (89.5 vs 101 at
the round-3 loop-state formulation). This script prices the three suspects
separately at the accepted pose of the bundled pair so the next optimization
is chosen from data, not guesses:

  A. window_mask_reference (pure-XLA recomputation of the kernel's window
     mask — candidate to replace with a kernel-emitted flag)
  B. one masked banded kernel pass (min-anchored)
  C. the full _exact_final_missed_stats (mask + both passes + reduction)
  D. a plain optimization sweep, for scale

Chained k-iteration timing inside one jit with a live value dependency;
np.asarray forces completion (block_until_ready does not, over axon).

Usage: python tools/profile_stats_cost.py [k]
"""

import os
import sys
import time
from functools import partial

import numpy as np

# script-mode execution (`python tools/profile_stats_cost.py`) puts tools/
# on sys.path, not the repo root — same shim as every other tool here
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = os.environ.get("RGBD360_REFERENCE", "/root/reference")


def chain_time(fn, *args, k=20, label=""):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=())
    def chained(*a):
        def body(_, carry):
            acc, args2 = carry
            out = fn(*args2)
            # live scalar dependency: fold the output into a perturbation of
            # the first float arg (values ~1e-7 — workload-neutral)
            s = out
            first = args2[0] + s * 1e-12
            return acc + s, (first,) + args2[1:]

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), args))
        return acc

    np.asarray(chained(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chained(*args))
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{label:44s} {dt:8.3f} ms/iter")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    # the persistent compile cache (host-feature-keyed dir + min-compile-time)
    # is configured by the package import below — a literal dir here would
    # bypass the keying and reintroduce the cross-host AOT SIGILL hazard

    from rgbd360_tpu.io.calib import Calib360
    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.ops import photoicp
    from rgbd360_tpu.ops.photoicp import (
        PHOTO_DEPTH, _exact_final_missed_stats, _mm, pack_target_planes8,
        fused_sweep_sphere,
    )
    from rgbd360_tpu.ops.sphere import sphere_project, sphere_xyz_lut
    from rgbd360_tpu.ops.warp_gather import (
        warp_gather_masked, window_mask_reference,
    )

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    calib = Calib360.load(REFERENCE_ROOT)
    f1 = Frame360(calib, 0).build(os.path.join(REFERENCE_ROOT, "samples/sphere_images_1.bin"))
    f2 = Frame360(calib, 1).build(os.path.join(REFERENCE_ROOT, "samples/sphere_images_10.bin"))

    gray_src = f2.sphere_gray
    depth_src = f2.sphere_depth_mm.astype(jnp.float32) * 0.001
    gray_trg = f1.sphere_gray
    depth_trg = f1.sphere_depth_mm.astype(jnp.float32) * 0.001

    res = photoicp.align_spheres_jit(
        gray_src, depth_src, gray_trg, depth_trg, jnp.eye(4),
        method=PHOTO_DEPTH, n_levels=5,
    )
    pose = jnp.asarray(np.asarray(res.pose))  # accepted pose, device-resident
    print("accepted |t| =", np.linalg.norm(np.asarray(pose)[:3, 3]))

    from rgbd360_tpu.ops.photoicp import build_pyramid_set, make_level_data

    src = build_pyramid_set(gray_src, depth_src, 5, is_target=False, sphere_seam_mask=True)
    trg = build_pyramid_set(gray_trg, depth_trg, 5, is_target=True, sphere_seam_mask=True)
    level = make_level_data(
        jax.tree.map(lambda x: x[None], src), jax.tree.map(lambda x: x[None], trg), 0
    )
    level = jax.tree.map(lambda x: x[0], level)
    h, w = level.gray_src.shape
    xyz, valid = sphere_xyz_lut(level.depth_src, 0.3, 6.0)
    gray_flat = level.gray_src.reshape(-1)
    packed = pack_target_planes8(level)

    # shared projection pieces (host-precomputed inputs for A/B)
    def proj(pose_):
        p = _mm(xyz, pose_[:3, :3].T) + pose_[:3, 3]
        dist, r_int, c_int, inb = sphere_project(p, h, w)
        vis2d = (valid & inb).reshape(h, w)
        rsrc = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        csrc = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        r2d = jnp.where(vis2d, jnp.clip(r_int, 0, h - 1).reshape(h, w), rsrc)
        c2d = jnp.where(vis2d, jnp.clip(c_int, 0, w - 1).reshape(h, w), csrc)
        return r2d, c2d, vis2d

    r2d, c2d, vis2d = jax.jit(proj)(pose)
    np.asarray(r2d)

    # A: window mask recompute
    chain_time(
        lambda r, c: window_mask_reference(r, c).astype(jnp.float32).sum(),
        r2d.astype(jnp.float32), c2d,  # first arg float for the perturbation
        k=k, label="A window_mask_reference",
    )

    if jax.default_backend() == "cpu":
        print("B/C/D need the Mosaic kernel — TPU only; smoke stops here.")
        return 0

    # B: one masked kernel pass over the full miss set
    mask0 = jax.jit(lambda r, c, v: v & ~window_mask_reference(r, c))(r2d, c2d, vis2d)

    def one_masked(pk_f, r, c, m):
        out, hit = warp_gather_masked(packed, r, c, m)
        return out[0].astype(jnp.float32).sum() + hit.astype(jnp.float32).sum() + pk_f * 0

    chain_time(
        one_masked, jnp.float32(0.0), r2d, c2d, mask0, k=k,
        label="B one masked banded kernel pass",
    )

    # C: the full missed-stats path
    def full_stats(g, pose_):
        pe2, n_p, de2, n_d, n_x = _exact_final_missed_stats(
            g, packed, (h, w), xyz, valid, pose_, PHOTO_DEPTH
        )
        return pe2 + de2 + n_x

    # C prices the SEQUENTIAL min+max composition (the arm retired in round
    # 5) by substituting it for the dual gather, so C-vs-F stays a real A/B
    # of the compositions rather than timing the dual graph twice.
    from rgbd360_tpu.ops import warp_gather as _wg
    from tools.retired_ab import sequential_dual as _seq_dual

    _dual_orig = _wg.warp_gather_masked_dual

    def _sequential_dual(packed_in, r, c, miss):
        # ONE shared definition (tools/retired_ab.py) with the interpret-mode
        # parity test, so test and profiler always measure the same arm
        return _seq_dual(_wg, packed_in, r, c, miss)

    _wg.warp_gather_masked_dual = _sequential_dual
    try:
        chain_time(full_stats, gray_flat, pose, k=k, label="C _exact_final_missed_stats (sequential)")
    finally:
        _wg.warp_gather_masked_dual = _dual_orig

    # D: a plain L0 optimization sweep for scale
    def plain_sweep(g, pose_):
        out = fused_sweep_sphere(g, packed, (h, w), xyz, valid, pose_, PHOTO_DEPTH, 0)
        return out[0]

    chain_time(plain_sweep, gray_flat, pose, k=k, label="D plain L0 fused sweep")

    # E: the dual-anchored single-pass candidate (one traversal, two windows
    # per tile — candidate replacement for the sequential min+max passes)
    from rgbd360_tpu.ops.warp_gather import warp_gather_masked_dual

    def dual_masked(pk_f, r, c, m):
        out, hit = warp_gather_masked_dual(packed, r, c, m)
        return out[0].astype(jnp.float32).sum() + hit.astype(jnp.float32).sum() + pk_f * 0

    chain_time(
        dual_masked, jnp.float32(0.0), r2d, c2d, mask0, k=k,
        label="E dual-anchored single kernel pass",
    )

    # F: the shipped missed-stats path (dual-anchored single pass)
    chain_time(
        full_stats, gray_flat, pose, k=k,
        label="F _exact_final_missed_stats (dual)",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
