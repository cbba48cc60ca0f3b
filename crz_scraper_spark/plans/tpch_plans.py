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
# per customer over a date window; lineitem⋈orders shuffle join, nation
# broadcast. customer (150k × sf) carries no hint: AQE decides broadcast vs
# shuffle from runtime stats so the plan survives a 100× scale-up.
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
        .join(customer, orders.o_custkey == customer.c_custkey)
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
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
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
# the semi-join probe adds no extra shuffle of lineitem. customer joins
# unhinted — AQE chooses the strategy, so no forced multi-GB broadcast at
# scale.
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
        .join(customer, orders.o_custkey == customer.c_custkey)
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


# ---------------------------------------------------------------------------
# regional_local_volume — Q5 proper: revenue from lineitems where customer
# and supplier sit in the SAME nation, within one region. The
# c_nationkey = s_nationkey predicate ties the two dims to each other
# across the fact row — a join-graph cycle Catalyst resolves as a post-join
# filter; region→nation pre-filters the nation broadcast so only 1/5 of
# nations survive into the join. customer/supplier are scale-proportional,
# so instead of forced broadcasts they are pre-shrunk with a left-semi join
# against the 5-row asia_nations broadcast (1/5 selectivity) and then joined
# unhinted — AQE picks broadcast vs shuffle from the post-filter size.
# ---------------------------------------------------------------------------


def regional_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    asia_keys = asia_nations.select("n_nationkey")
    customer = customer.join(
        F.broadcast(asia_keys),
        customer.c_nationkey == asia_keys.n_nationkey,
        "left_semi",
    )
    supplier = supplier.join(
        F.broadcast(asia_keys),
        supplier.s_nationkey == asia_keys.n_nationkey,
        "left_semi",
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia_nations),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


REGIONAL_LOCAL_VOLUME_SQL = """
SELECT n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = 'ASIA'
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# forecast_revenue — Q6 shape: pure scan-filter-aggregate, zero joins, zero
# shuffle beyond the single-row final agg. The canonical pushdown showcase:
# all three predicates reach the parquet scan as PushedFilters and only
# (l_shipdate, l_discount, l_quantity, l_extendedprice) are read.
# ---------------------------------------------------------------------------


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "forecast_revenue"
            )
        )
    )


FORECAST_REVENUE_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS forecast_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24.0
"""

# ---------------------------------------------------------------------------
# order_priority_semijoin — Q4 shape: EXISTS rewritten as a large-large
# LEFT SEMI join (orders ⋉ lineitem). Both sides shuffle on orderkey; the
# semi join keeps the probe narrow (orderkey only on the build side).
# At 100 TB both facts would be bucketed on orderkey → shuffle-free.
# ---------------------------------------------------------------------------


def order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    discounted = li.filter(F.col("l_discount") >= 0.05).select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(discounted, orders.o_orderkey == discounted.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORDER_PRIORITY_SEMIJOIN_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.05)
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# nation_volume_shipping — Q7 shape: role-playing dimension (nation joined
# twice under different aliases, once via supplier, once via customer), a
# symmetric pair predicate, and a year rollup. The 2-row nation slices
# broadcast; customer/supplier are pre-shrunk to ~2/25 of their rows with
# left-semi joins against those slices and then joined UNHINTED (they grow
# with sf, so a forced broadcast would OOM at 100×; AQE decides from the
# post-semi-join size). lineitem⋈orders is the only guaranteed fact shuffle.
# ---------------------------------------------------------------------------


def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # The symmetric pair predicate implies each side ∈ {N1, N2} — Catalyst
    # does not derive single-side constraints from an OR-of-ANDs, so state
    # them on the dims explicitly: the nation broadcasts shrink to 2 rows
    # and the inner joins drop non-matching fact rows at the earliest join
    # instead of at the final filter (measured 2.0 s → for the fact rows
    # surviving the supplier join, ~2/25 pass instead of all).
    n1 = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    customer = customer.join(
        F.broadcast(n2.select("cn_key")),
        customer.c_nationkey == F.col("cn_key"),
        "left_semi",
    )
    supplier = supplier.join(
        F.broadcast(n1.select("sn_key")),
        supplier.s_nationkey == F.col("sn_key"),
        "left_semi",
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


NATION_VOLUME_SHIPPING_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l.l_shipdate)
"""

# ---------------------------------------------------------------------------
# customer_order_distribution — Q13 shape: LEFT OUTER join with a filter
# inside the join condition (orders pre-filtered before the join — NOT a
# post-join WHERE, which would turn the outer join inner), then a
# histogram-of-counts double aggregation.
# ---------------------------------------------------------------------------


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
"""

# ---------------------------------------------------------------------------
# promo_revenue_ratio — Q14 shape: conditional-aggregate ratio over a
# dimension join (part grows with sf → unhinted, column-pruned to
# (p_partkey, p_type); AQE picks broadcast vs shuffle). Numerator and
# denominator are each decimal-exact
# sums (order-independent); the division happens once on identical doubles
# in both engines.
# ---------------------------------------------------------------------------


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(part.select("p_partkey", "p_type"),
              li.l_partkey == F.col("p_partkey"))
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)).alias(
                "promo_revenue"
            ),
            dsum(rev).alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            F.round(
                100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6
            ).alias("promo_pct"),
        )
    )


PROMO_REVENUE_RATIO_SQL = """
WITH agg AS (
  SELECT
    CAST(round(sum(CAST(CASE WHEN p.p_type = 'PROMO'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0.0 END AS DECIMAL(18,6))), 2) AS DOUBLE)
      AS promo_revenue,
    CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
      AS total_revenue
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
    AND l.l_shipdate <  TIMESTAMP '1996-10-01'
)
SELECT promo_revenue, total_revenue,
       round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
FROM agg
"""

# ---------------------------------------------------------------------------
# avg_qty_outlier_revenue — Q17 shape: correlated scalar subquery
# (per-part average quantity) decorrelated into a groupBy + join-back. The
# per-part aggregate and the probe share the l_partkey shuffle partitioning,
# so AQE reuses the exchange. Quantities are integral doubles → their sum is
# exact → plain avg is order-independent.
# ---------------------------------------------------------------------------


def avg_qty_outlier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#23")),
                li.l_partkey == part.p_partkey)
        .join(thresh, li.l_partkey == thresh.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


AVG_QTY_OUTLIER_REVENUE_SQL = """
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2)
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey) t
  ON t.t_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < t.qty_thresh
"""

# ---------------------------------------------------------------------------
# disjunctive_brand_quantity — Q19 shape: OR-of-ANDs predicate spanning both
# join sides. Catalyst extracts the common l_partkey=p_partkey equi-key and
# evaluates the disjunction as a post-join filter, plus pushes the
# per-side implications (brand ∈ {...}, quantity ranges) into the scans.
# ---------------------------------------------------------------------------


def disjunctive_brand_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & (qty >= 1.0) & (qty <= 11.0))
        | ((F.col("p_brand") == "Brand#23") & (qty >= 10.0) & (qty <= 20.0))
        | ((F.col("p_brand") == "Brand#34") & (qty >= 20.0) & (qty <= 30.0))
    )
    return (
        # Only the three brands can satisfy the disjunction — pre-filter the
        # part side (now a small fixed fraction, safely hint-free) so the
        # join probe carries 3/|brands| of part instead of all of it.
        li.join(
            part.filter(
                F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            ).select("p_partkey", "p_brand"),
            li.l_partkey == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


DISJUNCTIVE_BRAND_QUANTITY_SQL = """
SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1.0 AND 11.0)
   OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10.0 AND 20.0)
   OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20.0 AND 30.0)
"""

# ---------------------------------------------------------------------------
# lonely_returning_supplier — Q21 shape: EXISTS + NOT EXISTS self-joins on
# the fact table, expressed as LEFT SEMI and LEFT ANTI hash joins with a
# mixed equi + non-equi condition (same orderkey, different suppkey). The
# three derived sets all shuffle on l_orderkey → one exchange, reused.
# supplier (10k × sf) joins unhinted so AQE, not a forced hint, picks the
# strategy at scale.
# ---------------------------------------------------------------------------


def lonely_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("o_okey"), F.col("l_suppkey").alias("o_skey")
    )
    other_r = returned.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("r_skey")
    )
    lonely = (
        returned.join(
            other,
            (returned.l_orderkey == other.o_okey)
            & (returned.l_suppkey != other.o_skey),
            "left_semi",
        )
        .join(
            other_r,
            (returned.l_orderkey == other_r.r_okey)
            & (returned.l_suppkey != other_r.r_skey),
            "left_anti",
        )
    )
    return (
        lonely.join(supplier, lonely.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


LONELY_RETURNING_SUPPLIER_SQL = """
SELECT s.s_name, count(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_returnflag = 'R') l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
"""

# ---------------------------------------------------------------------------
# rich_inactive_customers — Q22 shape: scalar aggregate subquery as a
# broadcast single-row cross join (the Spark idiom for a decorrelated
# scalar), then an ANTI join against the fact table (customers with no
# order since 2000 — "churned"; the anti side's date filter pushes into
# the orders scan). The average is a decimal-exact sum ÷ count so the
# threshold is bit-identical across engines and partitionings.
# ---------------------------------------------------------------------------


def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_bal")
        )
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


RICH_INACTIVE_CUSTOMERS_SQL = """
SELECT c.c_mktsegment, count(*) AS numcust,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
        SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*), 6)
        FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_mktsegment
"""


QUERIES: dict = {
    "returned_revenue_by_customer": (
        returned_revenue_by_customer,
        RETURNED_REVENUE_SQL,
    ),
    "priority_by_shipwindow": (priority_by_shipwindow, PRIORITY_BY_SHIPWINDOW_SQL),
    "large_volume_orders": (large_volume_orders, LARGE_VOLUME_ORDERS_SQL),
    "regional_local_volume": (regional_local_volume, REGIONAL_LOCAL_VOLUME_SQL),
    "forecast_revenue": (forecast_revenue, FORECAST_REVENUE_SQL),
    "order_priority_semijoin": (
        order_priority_semijoin,
        ORDER_PRIORITY_SEMIJOIN_SQL,
    ),
    "nation_volume_shipping": (nation_volume_shipping, NATION_VOLUME_SHIPPING_SQL),
    "customer_order_distribution": (
        customer_order_distribution,
        CUSTOMER_ORDER_DISTRIBUTION_SQL,
    ),
    "promo_revenue_ratio": (promo_revenue_ratio, PROMO_REVENUE_RATIO_SQL),
    "avg_qty_outlier_revenue": (
        avg_qty_outlier_revenue,
        AVG_QTY_OUTLIER_REVENUE_SQL,
    ),
    "disjunctive_brand_quantity": (
        disjunctive_brand_quantity,
        DISJUNCTIVE_BRAND_QUANTITY_SQL,
    ),
    "lonely_returning_supplier": (
        lonely_returning_supplier,
        LONELY_RETURNING_SUPPLIER_SQL,
    ),
    "rich_inactive_customers": (
        rich_inactive_customers,
        RICH_INACTIVE_CUSTOMERS_SQL,
    ),
}
