"""On-chip window-constant sweep (VERDICT r3 next-round #1c).

Runs bench.py in a subprocess per (K, PR, VR, PC) configuration — the
constants are baked in at module import, so each point needs a fresh
process — and prints one result line per point. The bench's sanity gate
runs on every point, so a "win" that moves the iteration signature or the
basin is reported insane rather than recorded.

Usage: python tools/sweep_window_constants.py [--points "6,14,2,256;4,14,2,256;..."]
"""

import argparse
import json
import os
import subprocess
import sys

DEFAULT_POINTS = [
    (6, 14, 2, 256),  # current default
    (4, 14, 2, 256),
    (8, 14, 2, 256),
    (6, 12, 2, 256),
    (6, 16, 2, 256),
    (4, 12, 2, 256),
    # PC=192 removed: Mosaic dynamic_gather is native only at 128 lanes, so
    # window widths must be 128-multiples (ops/warp_gather.py validates);
    # the footprint probe at PC=128 would change coverage semantics and is
    # not a drop-in point for this sweep
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default=None)
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()
    points = (
        [tuple(int(x) for x in p.split(",")) for p in args.points.split(";")]
        if args.points
        else DEFAULT_POINTS
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for k, pr, vr, pc in points:
        env = dict(os.environ)
        env.update(
            RGBD360_WARP_K=str(k), RGBD360_WARP_PR=str(pr),
            RGBD360_WARP_VR=str(vr), RGBD360_WARP_PC=str(pc),
        )
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(repo, "bench.py")],
                env=env, capture_output=True, text=True, timeout=args.timeout,
            ).stdout
            line = next(
                (l for l in out.splitlines() if l.startswith("{")), "{}"
            )
            d = json.loads(line)
            results.append((k, pr, vr, pc, d.get("value"), d.get("sane")))
            print(
                f"K={k} PR={pr} VR={vr} PC={pc}: {d.get('value')} pairs/s "
                f"sane={d.get('sane')}"
                + (f" failures={d.get('sanity_failures')}" if d.get("sanity_failures") else ""),
                flush=True,
            )
        except subprocess.TimeoutExpired:
            print(f"K={k} PR={pr} VR={vr} PC={pc}: TIMEOUT", flush=True)
            results.append((k, pr, vr, pc, None, False))
    sane = [r for r in results if r[5] and r[4]]
    if sane:
        best = max(sane, key=lambda r: r[4])
        print(f"\nbest sane point: K={best[0]} PR={best[1]} VR={best[2]} PC={best[3]} -> {best[4]} pairs/s")


if __name__ == "__main__":
    main()
