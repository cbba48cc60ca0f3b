"""Sliding windows, exact percentiles, and custom stateful streaming
(applyInPandasWithState) — completing the §2.8 streaming surface and the
quantile family (absent from the reference, built-in in the engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crz_scraper_spark.catalog import load_table
from crz_scraper_spark.streaming.windows import stateful_user_counts

# ---------------------------------------------------------------------------
# sliding_window_counts — 1-hour windows sliding every 30 minutes: each event
# lands in 2 windows (window() with a slide produces the expansion natively;
# the oracle reconstructs it with an unnest of the two candidate starts).
# ---------------------------------------------------------------------------


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )


SLIDING_WINDOW_COUNTS_SQL = """
SELECT ws AS window_start, event_type, count(*) AS n_events
FROM (
  SELECT e.ts, e.event_type,
         unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
  FROM events e
)
WHERE ts >= ws AND ts < ws + INTERVAL '1 hour'
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# value_percentiles — exact interpolated percentiles (Spark `percentile` ≡
# DuckDB `quantile_cont`); approx_percentile is the 100 TB path, the exact
# form is the oracle-checkable baseline.
# ---------------------------------------------------------------------------


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pct = F.percentile(F.col("value"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return events.groupBy("event_type").agg(
        F.round(F.element_at(pct, 1), 6).alias("p25"),
        F.round(F.element_at(pct, 2), 6).alias("p50"),
        F.round(F.element_at(pct, 3), 6).alias("p75"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75
FROM events
GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# streaming_stateful_counts — custom stateful operator through the real
# streaming engine (applyInPandasWithState): per-user event counting with
# explicit GroupState. Events are one bounded batch locally, so the final
# state equals the batch group-count oracle.
# ---------------------------------------------------------------------------


def streaming_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stateful_user_counts(spark, sf_dir)


STREAMING_STATEFUL_COUNTS_SQL = """
SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
"""


QUERIES: dict = {
    "sliding_window_counts": (sliding_window_counts, SLIDING_WINDOW_COUNTS_SQL),
    "value_percentiles": (value_percentiles, VALUE_PERCENTILES_SQL),
    "streaming_stateful_counts": (streaming_stateful_counts, STREAMING_STATEFUL_COUNTS_SQL),
}
