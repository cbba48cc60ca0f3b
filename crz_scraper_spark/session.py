"""SparkSession factory tuned for this engine.

Local testing runs on local[N] (single JVM); the configs below are the ones
that also matter on a 1000-executor cluster reading 100 TB:

- AQE on (runtime partition coalescing, skew-join splitting) — replaces any
  hand-tuning of shuffle partition counts per stage.
- Arrow enabled — every pandas UDF / mapInPandas crosses the JVM<->Python
  boundary in columnar batches, not pickled rows.
- UTC session timezone — timestamps compare bit-identically against external
  oracles (DuckDB) and across clusters in different zones.
- shuffle.partitions sized to cores locally; on a real cluster AQE coalesces
  from a high initial count, so the absolute number matters less.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "crz_scraper_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The driver testdata's events.parquet stores TIMESTAMP(NANOS,...),
        # which Spark's vectorized reader rejects; read as long nanos and
        # convert in catalog.load_table (DuckDB truncates the same way).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ContextCleaner's periodic JVM GC defaults to 30 MINUTES — in a
        # 164-query session, JVM-side broadcast/shuffle/codegen state
        # accumulates unreclaimed for the whole run (py4j gc.collect()
        # frees Python refs, but the JVM only notices unreachability at a
        # GC), and late-session memory pressure showed up as 10-12x
        # timing draws on the persist-heavy md5-LSH family. A moderate
        # interval amortizes the cleanup steadily; measured bracketing:
        # 90s tamed the storms but taxed an sf0.1 run of sub-second
        # queries +20% (pauses land inside measured windows), per-query
        # forced System.gc() was 13% worse still, 300s keeps storms away
        # without the short-query tax.
        .config("spark.cleaner.periodicGC.interval", "300s")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
