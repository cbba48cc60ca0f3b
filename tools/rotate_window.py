"""Round-N window rotation helper: staleness report over the driver's
CORRECTNESS_r*.json record — per-query last-checked round, grouped into
tiers (oldest first), plus the never-checked list, SQL-oracled first.
Window slots must be oracled (tests/test_integrity.py), so rows-only
queries are listed separately and never rotated in: each is the
hash-seeded/sketch-library tier of an operator whose portable twin IS
oracled and windowed.

Usage: python tools/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from crz_scraper_spark.plans.registry import _FIRST_WINDOW, REGISTRY  # noqa: E402


def main() -> None:
    checked: set = set()
    last: dict[str, int] = {}
    for p in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p).group(1))
        names = set(json.load(open(p)))
        checked |= names
        for q in names:
            last[q] = max(last.get(q, 0), rnd)
        print(f"{p}: {len(names)} queries")
    # staleness tiers: oldest-first, registry order inside a tier — the
    # refresh slots of the next window take these top-down (oracled only)
    tiers: dict[int, list[str]] = {}
    for q in REGISTRY:
        if q in last:
            tiers.setdefault(last[q], []).append(q)
    print("\nstaleness tiers (oldest first; * = rows-only, not rotatable):")
    for rnd in sorted(tiers):
        qs = [
            q + ("*" if REGISTRY[q][1] is None else "")
            for q in tiers[rnd]
        ]
        print(f"  last checked r{rnd} ({len(qs)}): {', '.join(qs)}")
    never = [q for q in REGISTRY if q not in checked]
    oracled = [q for q in never if REGISTRY[q][1] is not None]
    rows_only = [q for q in never if REGISTRY[q][1] is None]
    in_window = [q for q in never if q in _FIRST_WINDOW]
    print(
        f"\n{len(REGISTRY)} registry, {len(checked)} ever checked, "
        f"{len(never)} never ({len(in_window)} already in current window)"
    )
    print(f"\nnever-checked, SQL-oracled ({len(oracled)}):")
    for q in oracled:
        mark = " [in current window]" if q in _FIRST_WINDOW else ""
        print(f"  {q}{mark}")
    print(f"\nnever-checked, rows-only ({len(rows_only)}):")
    for q in rows_only:
        print(f"  {q}")


if __name__ == "__main__":
    main()
