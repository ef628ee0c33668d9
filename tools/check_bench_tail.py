#!/usr/bin/env python3
"""Emulate the driver's bench capture: keep the last 2000 chars of a
captured `sbt runMain graft.Bench` stdout, JSON-parse the LAST non-empty
line. r4/r6/r7 all shipped `parsed: null` because sbt's logger wrapped the
summary in an `[info] ` prefix and appended a `[success]` trailer; build.sbt
now sets `run / outputStrategy := StdoutOutput` and `showSuccess := false`.
This script is the regression gate for that fix.

Usage: check_bench_tail.py <stdout-capture-file>
Exit 0 and print the parsed summary if the tail parse succeeds.
"""
import json
import sys


def tail_parse(text: str):
    tail = text[-2000:]
    lines = [l for l in tail.splitlines() if l.strip()]
    if not lines:
        raise SystemExit("FAIL: no non-empty lines in tail")
    last = lines[-1]
    try:
        return json.loads(last)
    except json.JSONDecodeError as e:
        raise SystemExit(
            f"FAIL: last tail line is not JSON ({e}):\n{last!r}")


def main():
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    with open(sys.argv[1], "r", errors="replace") as f:
        parsed = tail_parse(f.read())
    for key in ("metric", "value", "n_queries", "reps"):
        if key not in parsed:
            raise SystemExit(f"FAIL: parsed JSON missing key {key!r}")
    print("OK parsed:", json.dumps(parsed)[:300])


if __name__ == "__main__":
    main()
