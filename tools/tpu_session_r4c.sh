#!/bin/bash
# Round-4 third on-chip session: re-validate at the NEW defaults (K=4,
# batch 8, flags retired) and measure the copy_to_host_async SLAM fix.
#   1. TPU kernel + golden-parity suites at HEAD (re-stamp TPU_TESTS.md)
#   2. bench.py at defaults (the driver's configuration)
#   3. FULL_COVERAGE_FUSED A/B on its real workload (last remaining flag)
#   4. SLAM per-stage bisect with the async stats fetch
cd "$(dirname "$0")/.."
stamp() { echo; echo "===== $1 ($(date +%H:%M:%S)) ====="; }

stamp "git head"; git rev-parse HEAD

stamp "1. TPU kernel tests at HEAD (K=4 defaults)"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_warp_kernel.py -q 2>&1 | tail -4 || true
stamp "1b. golden parity on chip"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_golden_parity.py -q 2>&1 | tail -4 || true

stamp "2. bench at defaults"
timeout 1500 python bench.py 2>&1 | grep -E "^\{" || echo FAILED

stamp "3. FULL_COVERAGE_FUSED A/B"
timeout 1800 env RGBD360_FULL_COVERAGE_FUSED=0 python tools/profile_full_coverage.py 2>&1 | grep -v WARNING | tail -2 || true
timeout 1800 env RGBD360_FULL_COVERAGE_FUSED=1 python tools/profile_full_coverage.py 2>&1 | grep -v WARNING | tail -2 || true

stamp "4. SLAM per-stage bisect (async stats fetch)"
if [ -d /tmp/room_seq ]; then
  timeout 3600 python tools/profile_slam_frame.py /tmp/room_seq 2>&1 | grep -v WARNING | tail -16 || true
else
  echo "no /tmp/room_seq"
fi

stamp "done"
