"""Compare per-query bench timings across two scale factors and report the
scaling slope (VERDICT r2 item 7: 'no query >2x its expected linear
scale-up'). For a 10x data ratio, linear scaling predicts time_big <= 10x
time_small; queries with fixed constants land well under that, so the flag
threshold is ratio > 2 * data_ratio.

Usage: python tools/bench_slope.py BENCH_RESULT.json BENCH_RESULT_sf1.json [data_ratio=10]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    limit = 2 * ratio
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(set(qs) & set(qb)):
        s, b = qs[name], qb[name]
        # Sub-100ms sf-small timings are scheduler noise; slope on them is
        # meaningless, so floor the denominator.
        slope = b / max(s, 0.1)
        rows.append((slope, name, s, b))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > limit]
    print(f"{len(rows)} shared queries; data ratio {ratio}x; "
          f"flag threshold {limit}x")
    print(f"total: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value'] / small['value']:.1f}x)")
    print("\nslowest-scaling 15:")
    for slope, name, s, b in rows[:15]:
        mark = " <-- OVER" if slope > limit else ""
        print(f"  {slope:6.1f}x  {name}: {s:.2f}s -> {b:.2f}s{mark}")
    print(f"\n{len(flagged)} queries over {limit}x linear-scale flag")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
