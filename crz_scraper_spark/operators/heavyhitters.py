"""Exact heavy hitters with bounded shuffle — two-pass Misra–Gries.

The frequent-token / frequent-value question ("which tokens exceed 1% of
a 100 TB corpus?") hits Spark's one weak spot when asked naively: a plain
`groupBy(token).count()` shuffles every distinct (token, partition)
partial — for web-scale token vocabularies that is the dominant cost, and
99.99% of the shuffled keys are then discarded by the HAVING threshold.

Misra–Gries (1982) bounds the candidate set instead:

- Pass 1 (shuffle-FREE, `mapInPandas`): every partition keeps at most
  `m` counters with the classic decrement rule, vectorized — per Arrow
  batch a C-speed `value_counts`, merged into the counter dict; when the
  dict exceeds `m`, subtract the (m+1)-th largest count from all and drop
  the non-positive (the batch form of the one-at-a-time decrement; total
  decrement mass per partition ≤ N_p/(m+1), the textbook bound). Any item
  with global frequency > N/(m+1) must exceed the local bound on at least
  one partition (pigeonhole over Σ N_p), so the UNION of per-partition
  survivor sets is a guaranteed superset of the true heavy hitters —
  at most m × n_partitions candidates leave the executors.
- Pass 2 (bounded shuffle): an exact recount restricted to the candidate
  set — broadcast hash semi-join (candidates are KBs), map-side partial
  aggregation, and a shuffle whose key space is the candidate set, not
  the vocabulary. The final `count*denominator > N` filter is integer
  arithmetic, so the result is EXACTLY the items with freq > N·phi —
  the approximation lives only in pass 1's pruning, which by the bound
  above never prunes a true heavy hitter.

Pass 1 pays one Arrow transfer of the column to Python (map-only, memory
O(m) per task) — the deliberate trade: at scale, shuffle volume is the
scarce resource, not executor CPU.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: dict, counts, m: int) -> dict:
    """One Misra–Gries merge step: add a batch's (item -> count) partials,
    then if over budget apply the batch decrement — subtract the (m+1)-th
    largest count from all and drop the non-positive (every removed unit
    of count is matched across ≥ m+1 items, preserving the MG bound)."""
    for item, c in counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > m:
        cut = sorted(counters.values(), reverse=True)[m]
        counters = {k: v - cut for k, v in counters.items() if v > cut}
    return counters


def _mg_candidates_with_n(df: DataFrame, col: str, m: int) -> DataFrame:
    """Pass 1 with the partition-size sentinel: candidate rows
    (`col`, __pn NULL) plus ONE (NULL, n_values) row per partition — the
    same scan that prunes candidates also measures N, so callers never
    need a separate count() pass over the corpus."""
    if m < 1:
        raise ValueError(f"mg_candidates: m must be >= 1, got {m}")
    dtype = df.schema[col].dataType.simpleString()

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            vc = pdf[col].value_counts()
            n_part += int(vc.sum())
            counters = _mg_fold(counters, vc, m)
        # object dtype: appending None to an int64 list would otherwise
        # coerce the column to float64, corrupting keys above 2^53 (e.g.
        # xxhash64-derived ids) before the Arrow cast back to bigint —
        # object arrays of Python ints convert to Arrow int64 losslessly.
        yield pd.DataFrame(
            {
                col: pd.Series(
                    list(counters.keys()) + [None], dtype=object
                ),
                "__pn": pd.Series(
                    [None] * len(counters) + [n_part], dtype=object
                ),
            }
        )

    return df.select(col).mapInPandas(_mg, f"{col} {dtype}, __pn bigint")


def mg_candidates(df: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition Misra–Gries survivor items (≤ m per partition) as a
    one-column DataFrame; superset of every item with global frequency
    > N/(m+1)."""
    return (
        _mg_candidates_with_n(df, col, m)
        .filter(F.col(col).isNotNull())
        .select(col)
    )


def mg_candidates_arrays(
    df: DataFrame, arr_col: str, out_col: str, m: int
) -> DataFrame:
    """`mg_candidates` over an ARRAY column — one Arrow row per document
    instead of one per element, so pass 1 transfers a fraction of the row
    overhead (measured ~2× end-to-end on the token stream at sf1). Array
    elements must be non-null (a null never survives the recount join
    anyway). Output: candidate rows (`out_col`, __pn NULL) plus ONE
    sentinel row (NULL, n_elements) per partition — the same pass that
    prunes candidates also measures N, so the caller needs no second
    corpus scan (and no corpus-sized persist) to learn the total."""
    if m < 1:
        raise ValueError(f"mg_candidates_arrays: m must be >= 1, got {m}")
    eltype = df.schema[arr_col].dataType.elementType.simpleString()

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            flat = pdf[arr_col].explode().dropna()
            n_part += int(len(flat))
            counters = _mg_fold(counters, flat.value_counts(), m)
        # object dtype: see _mg_candidates_with_n — a None appended to
        # int64 keys would coerce to float64 and corrupt values > 2^53.
        yield pd.DataFrame(
            {
                out_col: pd.Series(
                    list(counters.keys()) + [None], dtype=object
                ),
                "__pn": pd.Series(
                    [None] * len(counters) + [n_part], dtype=object
                ),
            }
        )

    return df.select(arr_col).mapInPandas(
        _mg, f"{out_col} {eltype}, __pn bigint"
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    freq_num: int = 1,
    freq_den: int = 100,
    m: int | None = None,
) -> DataFrame:
    """EXACT set of values whose count exceeds N·freq_num/freq_den,
    computed with candidate pruning so the aggregation shuffle carries at
    most m·n_partitions keys. Returns (col, cnt, freq_ppm) ordered by
    cnt desc, col asc. The threshold compare is integer cross-multiplied
    (`cnt·freq_den > N·freq_num`) — no float boundary ambiguity.

    `m` defaults to freq_den/freq_num (the smallest counter budget whose
    MG undercount bound N/(m+1) < N·freq_num/freq_den still guarantees
    no true heavy hitter is pruned). NULLs — and, for float/double
    columns, NaNs — are excluded: neither is counted in N nor eligible
    as a hitter (pandas value_counts drops NaN in pass 1, so NaN is
    filtered out up front to keep N and the recount consistent)."""
    if m is None:
        m = freq_den // freq_num
    spark = df.sparkSession
    vals = df.filter(F.col(col).isNotNull())
    if df.schema[col].dataType.typeName() in ("float", "double"):
        vals = vals.filter(~F.isnan(F.col(col)))
    # ONE pass yields candidates AND N (bounded collect: ≤ m+1 rows per
    # partition) — the arrays-variant discipline, so the source is
    # scanned exactly twice total: this pass plus the lazy recount.
    raw = _mg_candidates_with_n(vals, col, m).collect()
    n_total = sum(r["__pn"] for r in raw if r["__pn"] is not None)
    cands = _sorted_keys(r[col] for r in raw)
    dtype = df.schema[col].dataType.simpleString()
    if not n_total or not cands:
        return spark.createDataFrame(
            [], f"{col} {dtype}, cnt bigint, freq_ppm bigint"
        )
    cand = spark.createDataFrame([(c,) for c in cands], f"{col} {dtype}")
    recount = (
        vals.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * freq_den > F.lit(n_total) * freq_num)
    )
    return _hitter_report(recount, col, n_total)


def _sorted_keys(keys) -> list:
    """Distinct non-null candidate keys, sorted. BinaryType columns
    collect as (unhashable) bytearray — normalize to bytes so the set
    works and createDataFrame round-trips losslessly."""
    return sorted(
        {
            bytes(k) if isinstance(k, bytearray) else k
            for k in keys
            if k is not None
        }
    )


def _hitter_report(recount: DataFrame, col: str, n_total: int) -> DataFrame:
    # freq_ppm via integer DIV on both engines (float division + bigint
    # cast TRUNCATES in Spark but ROUNDS in DuckDB — boundary hazard).
    return recount.select(
        col,
        "cnt",
        F.expr(f"(cnt * 1000000) DIV {n_total}").alias("freq_ppm"),
    ).orderBy(F.desc("cnt"), F.asc(col))


def heavy_hitters_arrays(
    df: DataFrame,
    arr_col: str,
    out_col: str,
    freq_num: int = 1,
    freq_den: int = 100,
    m: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """`heavy_hitters` over the ELEMENTS of an array column (the token-
    stream shape: one row per document, `arr_col` its token array) —
    identical result set, cheaper physique, and NO lingering state:

    - Pass 1 ships arrays (one Arrow row per document) through the MG
      pruner, which emits candidates AND per-partition element counts, so
      one bounded collect (≤ m+1 rows per partition) yields both the
      candidate list and N — no separate count() scan.
    - The element projection is persisted so the recount explode reads
      the already-computed arrays instead of re-deriving them; because at
      most freq_den/freq_num values can exceed frequency
      freq_num/freq_den, the final report is PROVABLY bounded — it is
      collected, the cache released, and a local DataFrame returned, so
      no corpus-sized persist ever outlives the call (set persist=False
      to trade a second derivation pass for zero caching, e.g. when the
      projection is a cheap column reference).

    Array elements must be non-null; null/empty arrays contribute
    nothing."""
    if m is None:
        m = freq_den // freq_num
    eltype = df.schema[arr_col].dataType.elementType.simpleString()
    spark = df.sparkSession
    empty_schema = f"{out_col} {eltype}, cnt bigint, freq_ppm bigint"
    arr = df.select(arr_col)
    if persist:
        arr = arr.persist()
    try:
        raw = mg_candidates_arrays(arr, arr_col, out_col, m).collect()
        n_total = sum(r["__pn"] for r in raw if r["__pn"] is not None)
        cands = _sorted_keys(r[out_col] for r in raw)
        if not n_total or not cands:
            return spark.createDataFrame([], empty_schema)
        cand = spark.createDataFrame(
            [(c,) for c in cands], f"{out_col} {eltype}"
        )
        toks = arr.select(F.explode(F.col(arr_col)).alias(out_col))
        recount = (
            toks.join(F.broadcast(cand), out_col, "left_semi")
            .groupBy(out_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * freq_den > F.lit(n_total) * freq_num)
        )
        report = _hitter_report(recount, out_col, n_total)
        rows = report.collect()
        return spark.createDataFrame(rows, report.schema)
    finally:
        if persist:
            arr.unpersist()
