#!/bin/bash
# Round-4 session E (auto-launched when the tunnel returns after the
# 2026-08-19 afternoon outage). The fused per-frame device program (52bf9b4)
# and the session-E review fixes landed AFTER session D's stamps, so this
# session (1) re-confirms the headline at HEAD, (2) A/Bs the fused frame
# program against the stepwise dispatch schedule on the 40-frame loop,
# (3) re-confirms golden parity (the align path itself is unchanged —
# kernel tests skipped unless ops/ changed since the D stamp).
cd "$(dirname "$0")/.."
stamp() { echo; echo "===== $1 ($(date +%H:%M:%S)) ====="; }

stamp "git head"; git rev-parse HEAD

stamp "1. bench at defaults (K=4, batch 8)"
timeout 1500 python bench.py 2>&1 | grep -E "^\{" || echo FAILED

stamp "2. SLAM loop: fused frame program A/B (spec ON both arms)"
if [ ! -d /tmp/room_seq ]; then
  timeout 900 python tools/make_synthetic_sequence.py --out /tmp/room_seq 2>&1 | tail -1 || true
fi
if [ -d /tmp/room_seq ]; then
  echo "--- fused (default)"
  timeout 3600 python tools/profile_slam_frame.py /tmp/room_seq 2>&1 | grep -v WARNING | tail -16 || true
  echo "--- stepwise (pre-52bf9b4 schedule)"
  timeout 3600 python tools/profile_slam_frame.py /tmp/room_seq --stepwise 2>&1 | grep -v WARNING | tail -16 || true
else
  echo "no /tmp/room_seq and generator failed"
fi

stamp "3. golden parity on chip at HEAD"
RGBD360_TEST_TPU=1 timeout 2400 python -m pytest tests/test_golden_parity.py -q 2>&1 | tail -4 || true

stamp "done"
