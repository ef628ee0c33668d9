#!/usr/bin/env python3
"""Noise-aware per-query bench regression check.

Compares a fresh bench_latest.json against one or more reference bench
files (typically the committed close plus any earlier runs) and flags a
query only when it is slower than the BEST reference reading by more
than `factor` AND by more than `floor_sec` absolute — the double gate
keeps the VM's documented 5-10s stall class (which lands on different
queries per run) from drowning the signal while still catching real
plan regressions.

Usage:
  python3 tools/bench_regress.py current.json ref1.json [ref2.json ...]
  python3 tools/bench_regress.py --factor 2.0 --floor 1.0 cur.json ref.json

Exit code 1 when any regression is flagged.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("current")
    ap.add_argument("refs", nargs="+")
    ap.add_argument("--factor", type=float, default=2.0,
                    help="flag when current > factor * best-ref")
    ap.add_argument("--floor", type=float, default=1.0,
                    help="and current - best-ref exceeds this many seconds")
    args = ap.parse_args()

    cur = load(args.current)
    best = {}
    for p in args.refs:
        for q, t in load(p).items():
            if q not in best or t < best[q]:
                best[q] = t

    flagged, new = [], []
    for q, t in sorted(cur.items()):
        if q not in best:
            new.append((q, t))
            continue
        b = best[q]
        if t > args.factor * b and t - b > args.floor:
            flagged.append((q, t, b))

    for q, t in new:
        print(f"NEW        {q:32s} {t:7.2f}s (no reference)")
    for q, t, b in flagged:
        print(f"REGRESSION {q:32s} {t:7.2f}s vs best {b:7.2f}s "
              f"({t / b:.1f}x)")
    if not flagged:
        print(f"-- no regressions vs best-of-{len(args.refs)} refs "
              f"(factor {args.factor}, floor {args.floor}s); "
              f"{len(new)} new, {len(cur) - len(new)} compared")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
