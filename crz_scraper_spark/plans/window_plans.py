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


# ---------------------------------------------------------------------------
# trailing_hour_stats — time-interval RANGE frame: per event, the sum/count
# of the same user's events in the trailing hour (inclusive). Spark RANGE
# frames need a numeric order key, so the frame runs over unix_micros(ts)
# with a ±microsecond bound — exactly DuckDB's
# `RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`. A RANGE frame
# over equal timestamps includes all peers, so no tiebreaker is needed; the
# in-frame sum is decimal-exact (order-independent).
# ---------------------------------------------------------------------------


def trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 2
        ).alias("trailing_hr_value"),
        F.count("*").over(w).alias("trailing_hr_events"),
    )


TRAILING_HOUR_STATS_SQL = """
SELECT user_id, event_id, ts,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 2)
         AS trailing_hr_value,
       count(*) OVER w AS trailing_hr_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""

# ---------------------------------------------------------------------------
# event_value_distribution — rank-family analytics (ntile / percent_rank /
# cume_dist) per event type. The order key includes event_id so ranks are
# tie-free and the rank-derived ratios are bit-identical across engines
# (identical integer operands → identical double quotients).
# ---------------------------------------------------------------------------


def event_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return events.select(
        "event_type",
        "event_id",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


EVENT_VALUE_DISTRIBUTION_SQL = """
SELECT event_type, event_id, value,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 9) AS pct_rank,
       round(cume_dist() OVER w, 9) AS cume
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


# ---------------------------------------------------------------------------
# daily_gap_fill — dense calendar grid: per event_type, one row for EVERY
# day between the table's global min and max day, zero-filled where no
# events occurred (time-series consumers need gaps explicit, not absent).
# The calendar comes from sequence(min_day, max_day) over the 1-row global
# extent aggregate — generated, never stored — cross-joined with the tiny
# type dimension and left-joined to the per-day counts. All three non-fact
# inputs are broadcast; the fact table shuffles once for its groupBy.
# ---------------------------------------------------------------------------


def daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("day"), "event_type"
    )
    extent = events.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    days = extent.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    types = events.select("event_type").distinct()
    counts = events.groupBy("day", "event_type").agg(
        F.count("*").alias("n")
    )
    return (
        days.crossJoin(F.broadcast(types))
        .join(F.broadcast(counts), ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


DAILY_GAP_FILL_SQL = """
WITH ext AS (
  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events
),
days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM ext
),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT d.day, t.event_type, coalesce(c.n, 0) AS n_events
FROM days d CROSS JOIN types t
LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
"""

# ---------------------------------------------------------------------------
# locf_fill — last-observation-carried-forward: for every event, the most
# recent preceding purchase value of the same user (NULL until their first
# purchase). last_value(IGNORE NULLS) over an unbounded-preceding frame —
# one shuffle on user_id, sorted once; the same single-pass pattern fills
# sensor dropouts at 100 TB (the as-of join is its two-table sibling).
# ---------------------------------------------------------------------------


def locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(
        F.col("event_type") == "purchase", F.round(F.col("value"), 6)
    )
    return events.select(
        "event_id",
        "user_id",
        F.last(purchase_val, ignorenulls=True).over(w).alias(
            "last_purchase_value"
        ),
    )


LOCF_FILL_SQL = """
SELECT event_id, user_id,
       last_value(CASE WHEN event_type = 'purchase' THEN round(value, 6) END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_purchase_value
FROM events
"""


QUERIES: dict = {
    "daily_gap_fill": (daily_gap_fill, DAILY_GAP_FILL_SQL),
    "locf_fill": (locf_fill, LOCF_FILL_SQL),
    "sliding_window_counts": (sliding_window_counts, SLIDING_WINDOW_COUNTS_SQL),
    "value_percentiles": (value_percentiles, VALUE_PERCENTILES_SQL),
    "streaming_stateful_counts": (streaming_stateful_counts, STREAMING_STATEFUL_COUNTS_SQL),
    "trailing_hour_stats": (trailing_hour_stats, TRAILING_HOUR_STATS_SQL),
    "event_value_distribution": (
        event_value_distribution,
        EVENT_VALUE_DISTRIBUTION_SQL,
    ),
}
