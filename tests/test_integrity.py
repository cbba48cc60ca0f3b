"""Property tests for the integrity/maintenance and corpus-prep operators
(integrity_plans.py, corpus_plans.py) — the invariants that make them safe
to run incrementally at 100 TB, beyond the value-hash parity the oracle
gate already proves.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crz_scraper_spark.catalog import load_table
from crz_scraper_spark.plans.corpus_plans import (
    _CHUNK_STRIDE,
    _CHUNK_WORDS,
    doc_chunking,
)
from crz_scraper_spark.plans.integrity_plans import (
    _Z_BITS,
    _row_hash_spark,
    incremental_daily_rollup,
    table_checksum,
    zorder_layout_key,
)

from tests.conftest import SF_DIR


def test_checksum_merges_by_xor(spark):
    """checksum(A ∪ B) == checksum(A) XOR checksum(B) for a disjoint split —
    the property that lets replica comparison merge partial scans instead of
    rescanning a partition in one task (xor stays an exact BIGINT at any
    scale; a sum would overflow int64 / lose float precision)."""
    events = load_table(spark, SF_DIR, "events")
    whole = (
        events.agg(F.bit_xor(_row_hash_spark()).alias("c")).first()["c"]
    )
    parts = (
        events.groupBy((F.col("event_id") % 2).alias("half"))
        .agg(F.bit_xor(_row_hash_spark()).alias("c"))
        .collect()
    )
    assert len(parts) == 2
    import functools, operator
    assert functools.reduce(operator.xor, (r["c"] for r in parts)) == whole


def test_checksum_detects_single_row_change(spark):
    """Flipping one row's content changes that day's checksum and no
    other's."""
    base = {r["day"]: r["checksum"] for r in table_checksum(spark, SF_DIR).collect()}
    events = load_table(spark, SF_DIR, "events")
    tampered = events.withColumn(
        "user_id",
        F.when(F.col("event_id") == 0, F.col("user_id") + 1).otherwise(
            F.col("user_id")
        ),
    )
    changed_day = (
        events.filter(F.col("event_id") == 0)
        .select(F.to_date(F.col("ts").cast("timestamp")).alias("d"))
        .first()["d"]
    )
    after = {
        r["day"]: r["checksum"]
        for r in tampered.groupBy(
            F.to_date(F.col("ts").cast("timestamp")).alias("day")
        )
        .agg(F.count("*").alias("n_rows"), F.bit_xor(_row_hash_spark()).alias("checksum"))
        .collect()
    }
    assert after[changed_day] != base[changed_day]
    assert all(after[d] == base[d] for d in base if d != changed_day)


def test_incremental_rollup_equals_direct(spark):
    """Merged base+delta partials must equal the direct full aggregate —
    the invariant that makes O(increment) daily maintenance sound."""
    inc = {
        (r["day"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in incremental_daily_rollup(spark, SF_DIR).collect()
    }
    events = load_table(spark, SF_DIR, "events")
    direct = {
        (r["day"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events.groupBy(
            F.to_date(F.col("ts").cast("timestamp")).alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert inc == direct


def test_zorder_key_roundtrip(spark):
    """De-interleaving the even/odd bits of zkey recovers the low 16 bits
    of both inputs — the key really encodes both dimensions."""
    rows = zorder_layout_key(spark, SF_DIR).limit(200).collect()
    assert rows
    mask = (1 << _Z_BITS) - 1
    for r in rows:
        a = b = 0
        for i in range(_Z_BITS):
            a |= ((r["zkey"] >> (2 * i)) & 1) << i
            b |= ((r["zkey"] >> (2 * i + 1)) & 1) << i
        assert a == (r["user_id"] & mask)
        assert b == (r["day_ord"] & mask)


def test_chunking_covers_every_word_once_per_stride(spark):
    """Chunk starts are exactly 1, 1+stride, ...; the union of chunk spans
    covers [1, n_words]; every chunk except the last is full-length iff
    enough words remain."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.size(F.expr("filter(split(lower(text), ' +'), w -> w <> '')")).alias(
            "n"
        ),
    )
    n_words = {r["doc_id"]: r["n"] for r in docs.collect()}
    by_doc: dict = {}
    for r in doc_chunking(spark, SF_DIR).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        n = n_words[doc_id]
        starts = sorted(c["chunk_start"] for c in chunks)
        assert starts == list(range(1, n + 1, _CHUNK_STRIDE))
        covered = max(c["chunk_start"] + c["chunk_words"] - 1 for c in chunks)
        assert covered == n  # spans reach exactly the last word
        for c in chunks:
            expected = min(_CHUNK_WORDS, n - c["chunk_start"] + 1)
            assert c["chunk_words"] == expected


def _executed_plan(df) -> str:
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunking_plan_is_map_only(spark):
    """doc_chunking must not shuffle beyond the single-file fan_out — the
    property that makes it scale linearly with input bytes."""
    from crz_scraper_spark.plans.corpus_plans import doc_chunking

    plan = _executed_plan(doc_chunking(spark, SF_DIR))
    assert plan.count("Exchange") == 1, plan  # fan_out only
    assert "SortAggregate" not in plan and "HashAggregate" not in plan, plan


def test_boilerplate_blacklist_broadcasts(spark):
    """The frequent-gram blacklist must reach the per-doc side as a
    broadcast (it is frequency-capped by construction): since r11 it is
    ONE collected-array row on a BroadcastNestedLoopJoin, and the per-doc
    counts are per-row array arithmetic — no per-gram hash-join probe, no
    docs-sized re-aggregation exchange after the join (the only exchanges
    are the two fan-out repartitions, the gram-DF aggregate, and the
    blacklist-array collect). Corpus-sized data never sort-merge-joins."""
    from crz_scraper_spark.plans.corpus_plans import boilerplate_ngram_filter

    plan = _executed_plan(boilerplate_ngram_filter(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # No aggregation sits above the join: counts are per-row.
    join_pos = plan.index("BroadcastNestedLoopJoin")
    assert "HashAggregate" not in plan[:join_pos], plan[:join_pos]


def test_checksum_sum_catches_even_multiplicity_swap(spark):
    """bit_xor is blind to multiplicity changes by an even amount
    ({A,A,B,B} xors to 0 like {C,C,D,D}); the mod-2^60 hash sum must
    distinguish them."""
    import pyspark.sql.functions as F

    def comps(vals):
        df = spark.createDataFrame([(v,) for v in vals], "h bigint")
        row = df.agg(
            F.bit_xor("h").alias("x"),
            F.expr(
                "CAST(sum(CAST(h AS DECIMAL(38,0)))"
                " % 1152921504606846976 AS BIGINT)"
            ).alias("s"),
        ).collect()[0]
        return row["x"], row["s"]

    a = comps([11, 11, 22, 22])
    b = comps([33, 33, 44, 44])
    assert a[0] == b[0] == 0  # the xor blind spot, demonstrated
    assert a[1] != b[1]  # the sum component catches it


def test_range_split_points_approx_mode(spark, sf_dir):
    """`exact=False` swaps the global rank window for percentile_approx's
    mergeable sketch (one map-combine pass, no Window/global sort in the
    plan) and keeps the guarantee that matters for a range layout:
    every boundary's cumulative fraction is within 1/accuracy (+ the
    worst single-value tie mass — the sketch returns actual data values,
    and a duplicated value carries all its rows) of i/R."""
    from crz_scraper_spark.plans.integrity_plans import (
        _RANGE_BUCKETS,
        range_split_points,
    )

    acc = 100
    df = range_split_points(spark, sf_dir, exact=False, accuracy=acc)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = events.count()
    max_tie = (
        events.groupBy("user_id").count()
        .agg(F.max("count")).collect()[0][0]
    ) / n
    rows = df.collect()
    assert len(rows) == _RANGE_BUCKETS - 1
    for r in rows:
        target = r["bucket_id"] / _RANGE_BUCKETS
        frac = r["n_rows_le"] / n
        assert abs(frac - target) <= 1.0 / acc + max_tie, (
            r["bucket_id"], frac, target, max_tie,
        )


def test_quality_band_filter_approx_mode(spark, sf_dir):
    """`exact=False` computes the 5%/95% band from the percentile sketch:
    no Window in the plan, and the kept fraction is 90% within the
    sketch's rank-error bound (+ boundary tie mass)."""
    from pyspark.sql import functions as F

    from crz_scraper_spark.plans.corpus_plans import quality_band_filter

    acc = 100
    df = quality_band_filter(spark, sf_dir, exact=False, accuracy=acc)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    max_tie = (
        docs.groupBy("n_chars").count().agg(F.max("count")).collect()[0][0]
    ) / n
    kept = df.count() / n
    assert abs(kept - 0.90) <= 2 * (1.0 / acc + max_tie), (kept, max_tie)
    # Exact and approx agree on the band within the same tolerance.
    exact_rows = quality_band_filter(spark, sf_dir, exact=True).count() / n
    assert abs(kept - exact_rows) <= 2 * (1.0 / acc + max_tie)


def test_window_rotation_covers_never_checked():
    """The 50-query driver window must keep its rotation contract: exactly
    50 entries, first in registry order, and EVERY registry query no
    prior-round CORRECTNESS record has checked must take a slot in the
    CURRENT window, never queue silently. (All CORRECTNESS_r*.json on
    disk count — r1-r6 closed the rotation over the full registry.)"""
    import glob
    import json

    from crz_scraper_spark.plans.registry import _FIRST_WINDOW, REGISTRY

    assert len(_FIRST_WINDOW) == 50
    assert list(REGISTRY)[:50] == _FIRST_WINDOW
    checked: set = set()
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        checked |= set(json.load(open(p)))
    never = [q for q in REGISTRY if q not in checked]
    missing = [q for q in never if q not in _FIRST_WINDOW]
    assert not missing, f"never-checked queries left out of window: {missing}"


def test_window_rows_only_entries_are_the_flagged_tail():
    """Window slots carry SQL oracles wherever SQL can express the op.
    The round-7 window is all-oracled (the former rows-only re-checks
    passed twice consecutively in r5/r6 and rotated out; ann_ivf_topk /
    ann_pq_topk gained fixed-literal oracles this round) — no NEW
    rows-only entry may ride along unflagged."""
    from crz_scraper_spark.plans.registry import _FIRST_WINDOW, REGISTRY

    rows_only = {n for n in _FIRST_WINDOW if REGISTRY[n][1] is None}
    assert rows_only == set(), rows_only


def test_rows_only_entries_declare_oracled_twins():
    """The rows-only ledger is self-certifying (VERDICT r9 item 6): every
    registry entry without a SQL oracle must declare its oracled twin in
    ROWS_ONLY_TWINS — the same operator with the engine-specific piece
    (hash seed / trained state / sketch library) replaced by a portable
    equivalent that IS hash-matched against DuckDB. A future rows-only
    addition without a twin fails here instead of silently weakening the
    driver's correctness gate."""
    from crz_scraper_spark.plans.registry import REGISTRY, ROWS_ONLY_TWINS

    rows_only = {n for n, (_f, s) in REGISTRY.items() if s is None}
    assert set(ROWS_ONLY_TWINS) == rows_only, (
        "ROWS_ONLY_TWINS keys must be exactly the rows-only registry "
        f"entries; diff: {set(ROWS_ONLY_TWINS) ^ rows_only}"
    )
    for name, twin in ROWS_ONLY_TWINS.items():
        assert twin in REGISTRY, f"{name}: twin {twin} not registered"
        assert REGISTRY[twin][1] is not None, (
            f"{name}: twin {twin} is itself rows-only — the mapping must "
            "land on a DuckDB-oracled query"
        )


def test_architecture_registry_map_not_stale():
    """ARCHITECTURE.md's registry map must name EVERY registry query (the
    one-hop navigation aid VERDICT r6 item 7 asked for) and carry the live
    oracled/rows-only counts in its header line."""
    from crz_scraper_spark.plans.registry import REGISTRY

    text = open("/root/repo/ARCHITECTURE.md").read()
    assert "## Registry map" in text
    section = text.split("## Registry map", 1)[1]
    missing = [q for q in REGISTRY if f"`{q}`" not in section]
    assert not missing, f"registry map missing queries: {missing}"
    n = len(REGISTRY)
    oracled = sum(1 for _f, s in REGISTRY.values() if s is not None)
    assert f"All {n} registry queries ({oracled} DuckDB-oracled" in section
    assert f"{n - oracled} rows-only" in section
    # rows-only entries must be starred, oracled ones must not be
    for q, (_f, s) in REGISTRY.items():
        starred = f"`{q}`\\*" in section
        assert starred == (s is None), (q, starred)


def test_readme_registry_counts_not_stale():
    """README's driver-contract paragraph states the registry size, the
    oracled count, and the rows-only count as literals; pin them to the
    live registry so the doc can't drift again (ADVICE r4)."""
    import re

    from crz_scraper_spark.plans.registry import REGISTRY

    text = open("/root/repo/README.md").read()
    n = len(REGISTRY)
    oracled = sum(1 for _f, s in REGISTRY.values() if s is not None)
    assert f"maps {n} named operators" in text, (
        f"README operator count stale (registry has {n})"
    )
    assert f"SQL for the {oracled} SQL-expressible ones" in text, (
        f"README oracled count stale (registry has {oracled})"
    )
    m = re.search(r"the (\d+) rows-only entries", text)
    assert m and int(m.group(1)) == n - oracled, (
        f"README rows-only count stale (registry has {n - oracled})"
    )
