"""DuckDB-oracle comparison harness (mirrors the driver's correctness gate:
row count + column names + order-insensitive value hash with columns sorted
by name). Used by tools/check_correctness.py and the test suite.

Driver-faithfulness notes (calibrated against CORRECTNESS_r01.json):

* The driver materializes the DuckDB side through pandas/Arrow, where a
  HUGEINT (the result type of ``sum(BIGINT)``) degrades to float64 — so an
  oracle whose output column is an uncast integer ``sum()`` hashes as
  ``3.0`` against Spark's ``3`` and fails even though the values agree.
  We therefore fetch the oracle via ``fetchdf()`` here too, and the
  normalizer below deliberately does NOT integerize whole floats: an
  int-typed column and a float-typed column never hash equal. The repo
  rule is "every oracle integer aggregate is CAST(... AS BIGINT)".
* Floats are hashed by exact ``repr`` (no rounding): any query whose two
  sides differ in the last ulp must be reformulated with exact types
  (decimal sums, integer ppm ratios), not hidden by a loose comparator.
* Decimal columns are normalized through ``float`` on both sides, matching
  the pandas path (DuckDB DECIMAL -> float64) that the round-1 driver
  demonstrably applied (decimal money sums were green).
* Temporal values are normalized to ISO text; a DATE and a
  midnight TIMESTAMP compare equal (date_sequence was green in round 1
  although pandas renders DATE as a midnight Timestamp).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import hashlib
import math

import duckdb

from crz_scraper_spark.catalog import TABLES


def _norm_cell(v) -> str:
    # pandas/numpy scalars first (the oracle side arrives via fetchdf()).
    try:
        import numpy as _np
        import pandas as _pd

        if v is None or v is _pd.NaT or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, (_np.bool_,)):
            return str(int(bool(v)))
        if isinstance(v, _np.integer):
            return str(int(v))
        if isinstance(v, _np.floating):
            v = float(v)
            if math.isnan(v):
                return "NULL"
            return repr(v)
        if isinstance(v, _pd.Timestamp):
            if v is _pd.NaT:
                return "NULL"
            return v.isoformat(sep="T")
    except ImportError:  # pragma: no cover
        if v is None:
            return "NULL"
    if v is None:
        return "NULL"
    # Array columns: fetchdf() yields numpy arrays on the oracle side while
    # Spark collect() yields Python lists — normalize both element-wise so
    # a value-identical array column can't hash-mismatch on str() rendering
    # ('[1 2 3]' vs '[1, 2, 3]').
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        # pandas renders DuckDB DECIMAL as float64; mirror that on both
        # sides so Decimal('12345.6700') == float 12345.67.
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, _dt.date):
        # DATE == midnight TIMESTAMP under the driver's pandas rendering.
        return _dt.datetime(v.year, v.month, v.day).isoformat(sep="T")
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


def _oracle_rows(con: duckdb.DuckDBPyConnection, sql: str):
    """Fetch oracle rows through pandas, the driver's materialization path
    (HUGEINT/DECIMAL -> float64, DATE -> midnight Timestamp)."""
    df = con.execute(sql).fetchdf()
    cols = list(df.columns)
    rows = [tuple(rec) for rec in df.itertuples(index=False, name=None)]
    return rows, cols


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of problems (empty = match)."""
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    orows, ocols = _oracle_rows(con, sql)
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
