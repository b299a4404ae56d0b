#!/bin/bash
# Round-4 final on-chip session (relaunch of r4c after the 09:56 tunnel
# drop, at the post-fix HEAD). Critical items first so a tunnel flap can't
# cost the headline: bench, kernel re-stamp, FUSED A/B, SLAM bisect,
# golden-parity confirmation.
cd "$(dirname "$0")/.."
stamp() { echo; echo "===== $1 ($(date +%H:%M:%S)) ====="; }

stamp "git head"; git rev-parse HEAD

stamp "1. bench at defaults (K=4, batch 8)"
timeout 1500 python bench.py 2>&1 | grep -E "^\{" || echo FAILED

stamp "2. TPU kernel tests at HEAD"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_warp_kernel.py -q 2>&1 | tail -4 || true

stamp "3. FULL_COVERAGE_FUSED A/B"
timeout 1800 env RGBD360_FULL_COVERAGE_FUSED=0 python tools/profile_full_coverage.py 2>&1 | grep -v WARNING | tail -2 || true
timeout 1800 env RGBD360_FULL_COVERAGE_FUSED=1 python tools/profile_full_coverage.py 2>&1 | grep -v WARNING | tail -2 || true

stamp "4. SLAM per-stage bisect (async stats fetch + RPC cuts)"
if [ -d /tmp/room_seq ]; then
  timeout 3600 python tools/profile_slam_frame.py /tmp/room_seq 2>&1 | grep -v WARNING | tail -16 || true
else
  echo "no /tmp/room_seq"
fi

stamp "5. golden parity on chip (confirmation at final HEAD)"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_golden_parity.py -q 2>&1 | tail -4 || true

stamp "done"
