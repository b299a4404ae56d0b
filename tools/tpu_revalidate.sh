#!/bin/bash
# One-shot revalidation after a tunnel outage (CLAUDE.md):
#   1. trivial-op probe (fail fast if the tunnel is still down)
#   2. bench.py — the headline number + sanity gate
#   3. profile_stats_cost.py — exact-final stats cost bisection
#   4. Occ2 alignment smoke on the chip (this round changed the occ path)
set -e -o pipefail
cd "$(dirname "$0")/.."
echo "== probe =="
timeout 120 python -c "
import numpy as np, jax.numpy as jnp
print('tunnel ok', np.asarray(jnp.zeros(4)+1.0))" 2>&1 | grep -v WARNING
echo "== bench =="
timeout 1200 python bench.py
echo "== stats cost =="
timeout 1200 python tools/profile_stats_cost.py 20 2>&1 | grep -v WARNING
# (The EXACT_FINAL_DUAL and FULL_COVERAGE_FUSED A/B legs were removed in
# round 5 with the arms themselves: both losers were deleted after their
# final on-chip re-confirmation — sequential exact-final 53.87 vs 55.37
# pairs/s, sequential full-coverage 29.52 vs 37.67 aligns/s, TPU_TESTS.md
# round 5. Sequential-composition parity stays pinned on CPU by
# tests/test_warp_kernel_interpret.py.)
echo "== frame-assembly stage costs =="
timeout 1200 python tools/profile_frame.py 2>&1 | grep -v WARNING | tail -8
echo "== plane-extraction cost =="
timeout 1800 python tools/profile_planes.py 2>&1 | grep -v WARNING | tail -8
echo "== occ smoke =="
timeout 900 python - <<'EOF' 2>&1 | grep -v WARNING
import numpy as np, jax.numpy as jnp
from rgbd360_tpu.io.calib import Calib360
from rgbd360_tpu.core.frame360 import Frame360
from rgbd360_tpu.ops import photoicp
calib = Calib360.load('/root/reference')
f1 = Frame360(calib).build('/root/reference/samples/sphere_images_1.bin')
f2 = Frame360(calib,1).build('/root/reference/samples/sphere_images_10.bin')
for occ in (0, 2):
    res = photoicp.align_spheres_jit(
        f2.sphere_gray, f2.sphere_depth_mm.astype(jnp.float32)*0.001,
        f1.sphere_gray, f1.sphere_depth_mm.astype(jnp.float32)*0.001,
        jnp.eye(4), method=photoicp.PHOTO_DEPTH, n_levels=5, occlusion=occ)
    p = np.asarray(res.pose)
    print(f"occ={occ} |t|={np.linalg.norm(p[:3,3]):.4f} iters={np.asarray(res.num_iterations)} ill={bool(np.asarray(res.ill_posed))}")
EOF
echo "== done =="
