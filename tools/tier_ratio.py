#!/usr/bin/env python
"""Scale-ratio report between two bench artifacts (e.g. sf0.1 vs sf1).

Usage:
    python tools/tier_ratio.py bench_results/bench_full_sf0.1.json \\
        bench_results/bench_full_sf1.json [threshold]

Prints per-query wall ratios (tier2/tier1) sorted descending, flagging
everything above ``threshold`` (default 10.0 = the row-growth factor
between sf0.1 and sf1 — anything above it is superlinear).  Ratios are
only meaningful when both runs came from the SAME quiet window: check
``uptime`` before benching (round-8 lesson: co-tenant load inflates
single queries up to 10x).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    a, b = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa = json.load(open(a))["queries"]
    qb = json.load(open(b))["queries"]
    common = sorted(set(qa) & set(qb))
    rows = sorted(
        ((qb[q] / qa[q] if qa[q] > 0 else float("inf"), q) for q in common),
        reverse=True,
    )
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"common queries: {len(common)}   total {ta:.1f}s -> {tb:.1f}s "
          f"({tb / ta:.2f}x)   flag threshold {threshold}x")
    n_flag = 0
    for r, q in rows:
        flag = " <-- SUPERLINEAR" if r > threshold else ""
        n_flag += bool(flag)
        print(f"{r:8.2f}x  {qa[q]:8.3f}s -> {qb[q]:8.3f}s  {q}{flag}")
    print(f"flagged: {n_flag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
