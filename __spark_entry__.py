"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``crz_scraper_spark`` package; this module is a
thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crz_scraper_spark.plans.registry import oracle_sql as _oracle_sql
from crz_scraper_spark.plans.registry import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's stage-2
    contract filter chain (`02_filter_by_CIN.py:184-310` re-expressed as one
    DataFrame plan — broadcast semi-join key filter, try_cast price guard,
    timestamp threshold, deterministic first-wins dedup, ranking sort)."""
    from crz_scraper_spark.plans.core_plans import stage2_contract_filter

    return stage2_contract_filter(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per SQL-expressible query."""
    return _oracle_sql()
