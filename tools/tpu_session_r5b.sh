#!/bin/bash
# Round-5 session B (VERDICT r4 #4 loop-level re-stamp): measure the
# planes-program + host-fit shavings (29e360f + 34d7a60) at the SLAM-loop
# level with INTERLEAVED controls — CLAUDE.md: same-session control runs
# varied 100 -> 138 ms on identical code, so a cross-session delta claim
# is noise; the only valid comparison alternates HEAD with the
# pre-shavings tree (3317af9) inside one session.
# Headline captures come first so a mid-session drop still leaves stamps.
cd "$(dirname "$0")/.."
stamp() { echo; echo "===== $1 ($(date +%H:%M:%S)) ====="; }

stamp "git head"; git rev-parse HEAD

CTRL=/tmp/r5b_ctrl
if [ ! -d "$CTRL" ]; then
  git worktree add -f "$CTRL" 3317af9 2>&1 | tail -1 || true
fi

if [ ! -d /tmp/room_seq ]; then
  timeout 900 python tools/make_synthetic_sequence.py --out /tmp/room_seq 2>&1 | tail -1 || true
fi

stamp "1. bench at HEAD defaults (K=4, batch 8)"
timeout 1500 python bench.py 2>&1 | grep -E "^\{" || echo FAILED

stamp "2. interleaved SLAM loops: HEAD thr=1 vs HEAD thr=0 vs CTRL 3317af9"
for i in 1 2 3; do
  stamp "2.$i HEAD slam loop (PIPELINE_THREAD=1, shipped default)"
  RGBD360_PIPELINE_THREAD=1 timeout 1800 python tools/profile_slam_frame.py /tmp/room_seq 2>&1 \
    | grep -v WARNING | tail -14 || true
  stamp "2.$i HEAD slam loop (PIPELINE_THREAD=0)"
  RGBD360_PIPELINE_THREAD=0 timeout 1800 python tools/profile_slam_frame.py /tmp/room_seq 2>&1 \
    | grep -v WARNING | tail -14 || true
  stamp "2.$i CTRL slam loop (3317af9, pre-shavings)"
  (cd "$CTRL" && timeout 1800 python tools/profile_slam_frame.py /tmp/room_seq 2>&1 \
    | grep -v WARNING | tail -14) || true
done

stamp "3. golden parity at HEAD (align path re-stamp past the A/B retirement)"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_golden_parity.py -q 2>&1 | tail -3 || true

stamp "4. kernel suite at HEAD"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_warp_kernel.py -q 2>&1 | tail -3 || true

stamp "done — transcribe into TPU_TESTS.md + PERF.md with the commit hash"
