"""DuckDB-oracle comparison harness (mirrors the driver's correctness gate:
row count + column names + order-insensitive value hash with columns sorted
by name). Used by tools/check_correctness.py and the test suite."""

from __future__ import annotations

import hashlib
import math

import duckdb

from crz_scraper_spark.catalog import TABLES


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_rows(rows: list[tuple], cols: list[str]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    h = hashlib.sha256()
    for line in canonical_rows(rows, cols):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of problems (empty = match)."""
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems: list[str] = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not problems and value_hash(srows, scols) != value_hash(orows, ocols):
        so = canonical_rows(srows, scols)
        oo = canonical_rows(orows, ocols)
        diff = next(
            (f"spark={a!r} oracle={b!r}" for a, b in zip(so, oo) if a != b),
            "tail rows differ",
        )
        problems.append(f"value hash mismatch; first diff: {diff}")
    return problems
