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
echo "== bench A/B: EXACT_FINAL_DUAL=0 (sequential leg; dual is the default) =="
timeout 1200 env RGBD360_EXACT_FINAL_DUAL=0 python bench.py
# (EXACT_FINAL_FULLPASS A/B removed: retired round 4 after losing the
# deduped-DMA rerun — 52.41 vs 53.68 b4, 52.27 vs 55.21 b8, PERF.md)
echo "== dual-flag stats parity on chip =="
# The flag only engages on the kernel (TPU) path — pytest runs on CPU, so
# compare the flagged vs sequential exact-final stats on the chip directly.
timeout 900 python - <<'EOF' 2>&1 | grep -v WARNING
import numpy as np, jax.numpy as jnp
from rgbd360_tpu.io.calib import Calib360
from rgbd360_tpu.core.frame360 import Frame360
from rgbd360_tpu.ops import photoicp
calib = Calib360.load('/root/reference')
f1 = Frame360(calib).build('/root/reference/samples/sphere_images_1.bin')
f2 = Frame360(calib,1).build('/root/reference/samples/sphere_images_10.bin')
args = (f2.sphere_gray, f2.sphere_depth_mm.astype(jnp.float32)*0.001,
        f1.sphere_gray, f1.sphere_depth_mm.astype(jnp.float32)*0.001)
outs = {}
for flag in (False, True):
    photoicp.EXACT_FINAL_DUAL = flag
    photoicp.align_spheres_jit.clear_cache()
    res = photoicp.align_spheres_jit(*args, jnp.eye(4),
        method=photoicp.PHOTO_DEPTH, n_levels=5)
    outs[flag] = (float(np.asarray(res.av_depth_residual)),
                  float(np.asarray(res.sso)),
                  np.asarray(res.pose))
photoicp.EXACT_FINAL_DUAL = False
(ad0, s0, p0), (ad1, s1, p1) = outs[False], outs[True]
print(f"sequential avDepth={ad0:.5f} sso={s0:.5f}")
print(f"dual       avDepth={ad1:.5f} sso={s1:.5f}")
assert np.allclose(p0, p1, atol=1e-6), "pose must not depend on the stats pass"
assert abs(ad0-ad1) < 0.02 and abs(s0-s1) < 0.01, "dual stats drifted"
print("dual-flag stats parity OK")
EOF
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
