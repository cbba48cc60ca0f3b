"""Round-N window rotation helper: list registry queries never checked by
any CORRECTNESS_r*.json on disk, SQL-oracled first (window slots should be
oracled — see tests/test_integrity.py).

Usage: python tools/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

from crz_scraper_spark.plans.registry import _FIRST_WINDOW, REGISTRY  # noqa: E402


def main() -> None:
    checked: set = set()
    for p in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        checked |= set(json.load(open(p)))
        print(f"{p}: {len(json.load(open(p)))} queries")
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
