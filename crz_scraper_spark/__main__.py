"""CLI: run named registry queries from a shell.

    python -m crz_scraper_spark list                 # all query names
    python -m crz_scraper_spark run <query> [...]    # execute + show
    python -m crz_scraper_spark explain <query>      # formatted plan

Options:
    --sf-dir PATH   testdata directory (default $SPARK_GRAFT_SF_DIR or sf0.1)
    --limit N       rows to show (default 20)
    --cpus N        local[N] (default $SPARK_GRAFT_CPUS or 32)

The reference's entry points are interactive scripts (stdin prompts,
`00_download_CRZ_DB.py:47-117`); this CLI is the batch-friendly equivalent:
every stage/operator is an addressable named query over a table directory.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    from crz_scraper_spark.plans.registry import REGISTRY

    ap = argparse.ArgumentParser(prog="crz_scraper_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    for cmd in ("run", "explain"):
        p = sub.add_parser(cmd)
        p.add_argument("queries", nargs="+", metavar="query")
        p.add_argument("--sf-dir", default=None)
        p.add_argument("--limit", type=int, default=20)
        p.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if args.cmd == "list":
        for name in sorted(REGISTRY):
            print(name)
        return 0

    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        return 2

    import os

    from crz_scraper_spark.session import get_spark

    sf_dir = args.sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("crz_cli", cpus=args.cpus)
    for name in args.queries:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        print(f"== {name} ==")
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
