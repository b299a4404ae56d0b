"""Generate the committed golden parity gate (tests/golden/pair_1_10.npz).

Runs the float64 NumPy golden transcription (tests/golden_ref.py) of
alignFrames360 (reference include/RegisterPhotoICP.h:4519-4784) at full
1920x320 resolution on the bundled sample pair, and records:

  * the input panoramas (u8 gray / u16 depth-mm, exactly reconstructible),
  * per-level incoming poses, initial residuals, H/g at the incoming pose,
  * the free-running final pose + iteration counts (the reference policy),
  * a forced-2-iterations-per-level run (the deterministic-schedule pose the
    f32 pipeline is gated against at <1e-3 — the stopping rule itself is
    chaotic at last-ulp level, see PERF.md "Accuracy note"),
  * the CPU wall-clock datum BASELINE.md calls for.

Run on the CPU backend:  python tools/make_golden.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import golden_ref

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "pair_1_10.npz")
N_LEVELS = 5
FORCED_ITERS = 2


def main():
    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.io.calib import Calib360

    calib = Calib360.load(REF)
    f1 = Frame360(calib, 0).build(os.path.join(REF, "samples/sphere_images_1.bin"))
    f2 = Frame360(calib, 1).build(os.path.join(REF, "samples/sphere_images_10.bin"))

    gray_src_u8 = np.asarray(jax_round_u8(f2.sphere_gray))
    gray_trg_u8 = np.asarray(jax_round_u8(f1.sphere_gray))
    depth_src_mm = np.asarray(f2.sphere_depth_mm)
    depth_trg_mm = np.asarray(f1.sphere_depth_mm)

    gray_src = gray_src_u8.astype(np.float64) / 255.0
    gray_trg = gray_trg_u8.astype(np.float64) / 255.0
    depth_src = depth_src_mm.astype(np.float64) * 0.001
    depth_trg = depth_trg_mm.astype(np.float64) * 0.001

    print("running golden free-run alignment (f64, full res)...")
    t0 = time.perf_counter()
    free = golden_ref.align_frames360(
        gray_src, depth_src, gray_trg, depth_trg, n_levels=N_LEVELS,
        method=golden_ref.PHOTO_DEPTH,
    )
    cpu_seconds = time.perf_counter() - t0
    print(f"  free-run: {cpu_seconds:.2f}s  |t|={np.linalg.norm(free['pose'][:3,3]):.4f}  "
          f"iters={free['level_iters']}  err={free['error']:.4f}")

    print("running golden forced-schedule alignment...")
    forced = golden_ref.align_frames360(
        gray_src, depth_src, gray_trg, depth_trg, n_levels=N_LEVELS,
        method=golden_ref.PHOTO_DEPTH, forced_iters=FORCED_ITERS,
    )
    print(f"  forced: |t|={np.linalg.norm(forced['pose'][:3,3]):.4f}")

    np.savez_compressed(
        OUT,
        gray_src_u8=gray_src_u8,
        gray_trg_u8=gray_trg_u8,
        depth_src_mm=depth_src_mm,
        depth_trg_mm=depth_trg_mm,
        n_levels=N_LEVELS,
        forced_iters=FORCED_ITERS,
        # free run (reference accept/reject policy)
        free_pose=free["pose"],
        free_error=free["error"],
        free_av_photo=free["av_photo_residual"],
        free_av_depth=free["av_depth_residual"],
        free_iters=np.array(free["level_iters"]),
        free_level_pose_in=np.array(free["level_pose_in"]),
        free_level_err_in=np.array(free["level_err_in"]),
        free_level_H_in=np.array(free["level_H_in"]),
        free_level_g_in=np.array(free["level_g_in"]),
        free_level_sso_in=np.array(free["level_sso_in"]),
        free_level_n_photo_in=np.array(free["level_n_photo_in"]),
        free_level_n_depth_in=np.array(free["level_n_depth_in"]),
        # forced schedule (deterministic pose gate)
        forced_pose=forced["pose"],
        forced_level_pose_out=np.array(forced["level_pose_out"]),
        forced_error=forced["error"],
        # CPU wall-clock datum (BASELINE.md "first measurement task")
        cpu_seconds=cpu_seconds,
    )
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB)")


def jax_round_u8(gray_f32):
    import jax.numpy as jnp

    return jnp.round(gray_f32 * 255.0).astype(jnp.uint8)


if __name__ == "__main__":
    main()
