#!/bin/bash
# Round-5 session A (VERDICT r4 #1/#4/#6): re-stamp HEAD on hardware.
# Run when the axon tunnel is up (probe first: a trivial-op script under
# timeout 100). Order puts the headline captures before the long A/Bs so a
# mid-session tunnel drop still leaves the stamps.
cd "$(dirname "$0")/.."
stamp() { echo; echo "===== $1 ($(date +%H:%M:%S)) ====="; }

stamp "git head"; git rev-parse HEAD

stamp "1. bench at defaults (K=4, batch 8)"
timeout 1500 python bench.py 2>&1 | grep -E "^\{" || echo FAILED

stamp "2. golden parity at HEAD"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_golden_parity.py -q 2>&1 | tail -3 || true

stamp "3. kernel suite at HEAD"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_warp_kernel.py -q 2>&1 | tail -3 || true

stamp "4. SLAM loop: fused frame program A/B (spec ON both arms)"
if [ ! -d /tmp/room_seq ]; then
  timeout 900 python tools/make_synthetic_sequence.py --out /tmp/room_seq 2>&1 | tail -1 || true
fi
if [ -d /tmp/room_seq ]; then
  echo "--- fused (default; the --stepwise/--no-spec arms and the"
  echo "    EXACT_FINAL_DUAL / FULL_COVERAGE_FUSED env flags were retired in"
  echo "    3317af9 after this session's transcribed A/Bs — re-running them"
  echo "    here would silently measure the shipped path under a stale label"
  timeout 3600 python tools/profile_slam_frame.py /tmp/room_seq 2>&1 | grep -v WARNING | tail -16 || true
else
  echo "no /tmp/room_seq and generator failed"
fi

stamp "done — transcribe into TPU_TESTS.md + PERF.md with the commit hash"
