"""The engine's named-query registry.

Aggregates every plan group into the `queries()` / `oracle_sql()` surface the
driver consumes via `__spark_entry__.py`. Each entry is
`name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)`; a None oracle
marks a genuinely non-SQL-expressible op (hash-bucketed LSH pipelines,
streaming state) that gets the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crz_scraper_spark.plans import (
    core_plans,
    corpus_plans,
    curation_plans,
    event_plans,
    extra_plans,
    integrity_plans,
    parity_plans,
    scale_plans,
    text_plans,
    tpch_plans,
    tpch2_plans,
    window_plans,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}
for group in (
    core_plans,
    corpus_plans,
    curation_plans,
    text_plans,
    event_plans,
    scale_plans,
    extra_plans,
    integrity_plans,
    window_plans,
    parity_plans,
    tpch_plans,
    tpch2_plans,
):
    for name, entry in group.QUERIES.items():
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = entry


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql.strip()
        for name, (_fn, sql) in REGISTRY.items()
        if sql is not None
    }
