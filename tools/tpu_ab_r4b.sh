#!/bin/bash
# Round-4 second on-chip session: the two live perf levers from the first
# session (tools/tpu_session_r4.sh results in PERF.md) plus the stale
# FULLPASS A/B (VERDICT r3 #1b) and the SLAM per-stage bisect (VERDICT #5).
#
# First-session facts this builds on:
#   - window sweep: K=4 PR=14 -> 53.71 pairs/s vs K=6 52.79 (same session)
#   - batch-cliff bisect: batch 8 full align 52.75 pairs/s vs b4 45.26 in
#     the bisect harness — the round-2/3 b8 cliff is gone at VR=2 + dual
#   - PC=192 is an invalid config (Mosaic needs 128-multiple windows)
cd "$(dirname "$0")/.."
stamp() { echo; echo "===== $1 ($(date +%H:%M:%S)) ====="; }
bench1() { # bench1 <label> [ENV=V ...]
  local label="$1"; shift
  stamp "bench $label"
  env "$@" timeout 1500 python bench.py 2>&1 | grep -E "^\{" || echo "FAILED/TIMEOUT"
}

stamp "git head"; git rev-parse HEAD

bench1 "K4 b4 (confirm sweep best)"        RGBD360_WARP_K=4 BENCH_BATCH=4
bench1 "K4 b8"                             RGBD360_WARP_K=4 BENCH_BATCH=8
bench1 "K6 b8"                             RGBD360_WARP_K=6 BENCH_BATCH=8
# HISTORICAL: the two FULLPASS legs below were measured BEFORE the flag was
# retired (52.41/52.27 vs 53.68/55.21 — PERF.md round-4 session). The env
# var no longer exists; re-running them now would just measure the default
# path twice under a misleading label.
# bench1 "K4 b4 FULLPASS (deduped DMA)"    RGBD360_WARP_K=4 BENCH_BATCH=4 RGBD360_EXACT_FINAL_FULLPASS=1
# bench1 "K4 b8 FULLPASS (deduped DMA)"    RGBD360_WARP_K=4 BENCH_BATCH=8 RGBD360_EXACT_FINAL_FULLPASS=1
bench1 "K4 b6 (cliff shape probe)"         RGBD360_WARP_K=4 BENCH_BATCH=6

stamp "SLAM per-stage bisect (synthetic 40-frame loop)"
if [ -d /tmp/room_seq ]; then
  timeout 3600 python tools/profile_slam_frame.py /tmp/room_seq 2>&1 | grep -v WARNING | tail -45 || true
else
  echo "no /tmp/room_seq"
fi

stamp "done"
