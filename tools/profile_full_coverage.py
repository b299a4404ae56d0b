"""On-chip throughput check for full-coverage sweeps (LC refinement /
relocalization verify): one triple-anchored kernel traversal per GN sweep,
the sole path since the sequential default-plus-two-re-gathers composition
lost its final on-chip A/B in round 5 (29.52 vs 37.67 aligns/s at HEAD —
TPU_TESTS.md round 5). Times k chained full-coverage batch-4 alignments on
the bundled pair, same methodology as bench.py (value-carrying fori_loop +
host-transfer sync).

Usage: python tools/profile_full_coverage.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from rgbd360_tpu.io.calib import Calib360
    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.ops import photoicp
    from rgbd360_tpu.parallel.batch import align_batch

    ref = os.environ.get("RGBD360_REFERENCE", "/root/reference")
    calib = Calib360.load(ref)
    f_trg = Frame360(calib, 0).build(os.path.join(ref, "samples/sphere_images_1.bin"))
    f_src = Frame360(calib, 1).build(os.path.join(ref, "samples/sphere_images_10.bin"))
    batch, iters = 4, 6

    def rep(x):
        return jnp.broadcast_to(x, (batch,) + x.shape).copy()

    gs = rep(f_src.sphere_gray)
    ds = rep(f_src.sphere_depth_mm.astype(jnp.float32) * 0.001)
    gt = rep(f_trg.sphere_gray)
    dt = rep(f_trg.sphere_depth_mm.astype(jnp.float32) * 0.001)
    poses = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
    eps = np.zeros((4, 4), np.float32)
    eps[:3, 3] = 1e-7

    from functools import partial

    # operands are jit ARGUMENTS, not closure captures: captured device
    # arrays become jaxpr constants whose values lowering fetches back over
    # the axon tunnel (the 40-270 s stall class, CLAUDE.md) — bench.py
    # passes them the same way
    @partial(jax.jit, static_argnames=("k",))
    def chain(gs_, ds_, gt_, dt_, p0, k):
        def body(_, carry):
            p, acc = carry
            res = align_batch(gs_, ds_, gt_, dt_, p, full_coverage=True)
            return p0 + res.error[:, None, None] * eps, acc + res.error

        _, acc = jax.lax.fori_loop(0, k, body, (p0, jnp.zeros(gs_.shape[0])))
        return acc

    last = align_batch(gs, ds, gt, dt, poses, full_coverage=True)
    np.asarray(chain(gs, ds, gt, dt, poses, iters))  # warmup/compile
    t0 = time.perf_counter()
    np.asarray(chain(gs, ds, gt, dt, poses, iters))
    dt_s = time.perf_counter() - t0
    pose = np.asarray(last.pose[0])
    print(
        f"full-coverage (fused triple-anchored): "
        f"{batch * iters / dt_s:.2f} full-coverage aligns/s  "
        f"|t|={np.linalg.norm(pose[:3, 3]):.4f} "
        f"iters={np.asarray(last.num_iterations[0]).tolist()}"
    )


if __name__ == "__main__":
    main()
