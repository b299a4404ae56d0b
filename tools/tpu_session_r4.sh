#!/bin/bash
# Round-4 one-shot TPU session: run every chip-dependent task of VERDICT r3
# in sequence while the axon tunnel is up, logging everything. Designed to
# run unattended in the background (the tunnel can drop at any time; each
# step is timeout-bounded and failures don't abort the rest).
#
#   1. real-TPU kernel + golden-parity test suites at HEAD  (VERDICT #6)
#   2. batch-cliff bisection                                 (VERDICT #1a)
#   3. revalidate: bench + DUAL/FULLPASS A/B + stats parity  (VERDICT #1b)
#   4. window-constant sweep under VR=2 + dual               (VERDICT #1c)
#   5. SLAM app steady-state frame timing on the chip        (VERDICT #5)
cd "$(dirname "$0")/.."
stamp() { echo; echo "===== $1 ($(date +%H:%M:%S)) ====="; }

stamp "git head"
git rev-parse HEAD

stamp "1. TPU kernel tests at HEAD"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_warp_kernel.py -q 2>&1 | tail -6 || true
stamp "1b. golden parity on chip"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_golden_parity.py -q 2>&1 | tail -4 || true

stamp "2. batch cliff bisection"
timeout 3000 python tools/profile_batch_cliff.py --batches 2,4,6,8 2>&1 | grep -v WARNING || true

stamp "3. revalidate (bench + A/Bs + parity + stage costs)"
timeout 7200 bash tools/tpu_revalidate.sh 2>&1 | grep -v WARNING || true

stamp "4. window-constant sweep"
timeout 7200 python tools/sweep_window_constants.py 2>&1 | grep -v WARNING || true

stamp "5. SLAM steady-state frame timing (synthetic 40-frame loop)"
if [ -d /tmp/room_seq ]; then
  timeout 3600 python - <<'EOF' 2>&1 | grep -v WARNING | tail -30 || true
import time, numpy as np
from rgbd360_tpu.apps.common import load_calib, default_matcher_config, sequence_frames
from rgbd360_tpu.core.kf_slam import KFSphereSLAM
calib = load_calib(None)
slam = KFSphereSLAM(matcher_config=default_matcher_config(None))
slam.aligner.prewarm()
times, kinds = [], []
from rgbd360_tpu.core.plane_extraction import planes_pipeline
t_prev = time.perf_counter()
for frame_no, frame in planes_pipeline(sequence_frames(calib, "/tmp/room_seq", 1, 1)):
    kind = slam.process_frame(frame)
    t_now = time.perf_counter()
    times.append((t_now - t_prev) * 1e3); kinds.append(kind)
    t_prev = t_now
    print(f"frame {frame_no}: {kind} {times[-1]:.1f} ms")
arr = np.array(times[5:]); ks = kinds[5:]
for k in sorted(set(ks)):
    sel = arr[[i for i, x in enumerate(ks) if x == k]]
    print(f"{k}: n={len(sel)} median={np.median(sel):.1f} ms p90={np.percentile(sel, 90):.1f} ms")
print(f"ALL steady-state: median={np.median(arr):.1f} ms")
EOF
else
  echo "no /tmp/room_seq — generate with tools/make_synthetic_sequence.py"
fi

stamp "done"
