"""Diff two bench snapshots and flag per-query drift.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Prints queries whose NEW/OLD ratio exceeds the threshold (default 2.0)
or dropped below 1/threshold, sorted by ratio — the round-over-round
regression check the VERDICT grades (machine noise at this box is ~±50%
per query, median ~1.1; flag only sustained multiples).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        return json.loads(fh.read().strip().splitlines()[-1])["queries"]


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    common = [k for k in new if k in old and old[k] >= 0.3]
    flagged = []
    for k in common:
        r = new[k] / old[k]
        if r >= thr or r <= 1 / thr:
            flagged.append((r, k))
    for r, k in sorted(flagged, reverse=True):
        print(f"{r:6.2f}x  {old[k]:6.2f}s -> {new[k]:6.2f}s  {k}")
    tot_o = sum(old[k] for k in common)
    tot_n = sum(new[k] for k in common)
    print(
        f"-- {len(flagged)} flagged / {len(common)} common; "
        f"suite {tot_o:.1f}s -> {tot_n:.1f}s ({tot_n / tot_o:.2f}x)"
    )


if __name__ == "__main__":
    main()
