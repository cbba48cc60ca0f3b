"""Canonical warehouse-analytics shapes on the TPC-H-ish testdata — the
large-join/agg query surface the reference never had (its joins are all
small-side lookups, SURVEY.md §2.3 note) but any user of a 100 TB engine
expects. Shapes follow TPC-H Q10/Q12/Q18; constants adapted to the synthetic
data's ranges.

Plan posture: every query is one scan per fact table, dims broadcast,
aggregates partial+final around a single shuffle; the Q18-shape inner
aggregate reuses the lineitem partitioning for its semi-join probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crz_scraper_spark.catalog import load_table
from crz_scraper_spark.functions.casts import dsum

# ---------------------------------------------------------------------------
# returned_revenue_by_customer — Q10 shape: revenue lost to returned items
# per customer over a date window; lineitem⋈orders shuffle join, customer
# and nation broadcast.
# ---------------------------------------------------------------------------


def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "lost_revenue"
            ),
            F.count("*").alias("n_returned_items"),
        )
    )


RETURNED_REVENUE_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS lost_revenue,
       count(*) AS n_returned_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
"""

# ---------------------------------------------------------------------------
# priority_by_shipwindow — Q12 shape: conditional aggregation (count urgent
# vs non-urgent orders) per lineitem status over a ship-date window. One
# join, one agg, the CASE/WHEN-inside-sum pattern.
# ---------------------------------------------------------------------------


def priority_by_shipwindow(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_priority"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_priority"),
        )
    )


PRIORITY_BY_SHIPWINDOW_SQL = """
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS high_priority,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS low_priority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
"""

# ---------------------------------------------------------------------------
# large_volume_orders — Q18 shape: orders whose total quantity exceeds a
# threshold (aggregate → HAVING → semi-join back to the fact rows). The
# inner aggregate and the outer join share the l_orderkey partitioning, so
# the semi-join probe adds no extra shuffle of lineitem.
# ---------------------------------------------------------------------------


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


LARGE_VOLUME_ORDERS_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       t.total_qty
FROM (
  SELECT l_orderkey,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) > 150.0
) t
JOIN orders o   ON t.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


QUERIES: dict = {
    "returned_revenue_by_customer": (
        returned_revenue_by_customer,
        RETURNED_REVENUE_SQL,
    ),
    "priority_by_shipwindow": (priority_by_shipwindow, PRIORITY_BY_SHIPWINDOW_SQL),
    "large_volume_orders": (large_volume_orders, LARGE_VOLUME_ORDERS_SQL),
}
