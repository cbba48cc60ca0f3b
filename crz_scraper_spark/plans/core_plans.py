"""Core relational plans: the reference's stage-2 filter-chain semantics plus
the large-join/agg/window surface the engine gets from DataFrame ops.

Every query here is a lazy DataFrame chain — Catalyst collapses the chained
filters into one predicate, pushes them into the parquet scan, prunes columns,
and picks broadcast vs shuffled joins (SURVEY.md §4). Aggregate/computed
columns are aliased identically to the oracle SQL (driver hash-compares by
sorted column name).

Float policy: money sums rounded to 2, averages/ratios to 6 — removes
last-ulp summation-order differences between Spark and DuckDB without
changing semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crz_scraper_spark.catalog import load_table
from crz_scraper_spark.functions.casts import davg, dsum
from crz_scraper_spark.operators.dedup import first_wins_dedup

# ---------------------------------------------------------------------------
# pricing_summary — TPC-H-Q1-shaped scan+agg (SURVEY §2.4 A-family; the
# reference's word-count/size-sum aggregations A4/A8 generalized to the
# multi-aggregate groupBy Spark gives for free).
# ---------------------------------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)      AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
                                                                             AS sum_disc_price,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6)      AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_price,
       count(*)                                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# stage2_contract_filter — the FLAGSHIP: `02_filter_by_CIN.py:184-310`
# re-expressed on testdata. orders ≈ contracts, supplier nationkeys ≈ the
# companies.csv broadcast key list (P4/J1), price threshold with
# string→double try_cast reject (P7, `02:233-243`), timestamp threshold (P8,
# `02:70-89,246-250`), first-wins composite-key dedup (A6, `02:254-268`).
# One DataFrame chain; the semi-join broadcasts; dedup is the deterministic
# window form (SURVEY §7 Hard-1).
# ---------------------------------------------------------------------------


def stage2_contract_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")

    key_list = supplier.select(F.col("s_nationkey").alias("c_nationkey")).distinct()
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
    # P4: broadcast left-semi against the reference key list.
    filtered = joined.join(F.broadcast(key_list), "c_nationkey", "left_semi")
    # P7: the reference stores prices as strings and rejects non-castable
    # rows via float()+ValueError; try_cast on a string round-trip is the
    # same reject-on-invalid semantics.
    price_ok = filtered.filter(
        F.col("o_totalprice").cast("string").try_cast("double").isNotNull()
        & (F.col("o_totalprice") >= 150000.0)
    )
    # P8: publication-date threshold (typed timestamp ordering ≡ the
    # reference's recursive string comparator).
    dated = price_ok.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    # A6: first-wins dedup per customer (earliest order wins, id tie-break).
    deduped = first_wins_dedup(
        dated,
        keys=["o_custkey"],
        order_by=[F.asc("o_orderdate"), F.asc("o_orderkey")],
    )
    # O1-style ranked output (ordering itself is cosmetic for the oracle
    # hash; the deterministic part is the dedup).
    return deduped.select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice", "o_orderdate"
    ).orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))


STAGE2_CONTRACT_FILTER_SQL = """
WITH filtered AS (
  SELECT o.o_orderkey, o.o_custkey, c.c_name, o.o_totalprice, o.o_orderdate
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey IN (SELECT DISTINCT s_nationkey FROM supplier)
    AND TRY_CAST(CAST(o.o_totalprice AS VARCHAR) AS DOUBLE) IS NOT NULL
    AND o.o_totalprice >= 150000.0
    AND o.o_orderdate >= TIMESTAMP '1997-01-01'
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM filtered
)
SELECT o_orderkey, o_custkey, c_name, o_totalprice, o_orderdate
FROM ranked WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# revenue_by_nation — large equi-join chain + hash agg (beyond the reference's
# small-side lookups, SURVEY §2.3 note; lineitem⋈orders is the shuffle join,
# nation broadcast). customer is scale-proportional (150k × sf) so it gets NO
# explicit broadcast hint — a forced hint overrides autoBroadcastJoinThreshold
# and OOMs at 100× scale; AQE picks broadcast vs shuffle from runtime stats.
# ---------------------------------------------------------------------------


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

# ---------------------------------------------------------------------------
# ewma_nation_revenue — exponentially-weighted smoothing of each nation's
# monthly revenue, computed as a SEQUENTIAL FOLD: ewma_t = (ewma_{t-1} +
# x_t) DIV 2 in integer cents. Recurrences like EWMA don't decompose into
# commutative partials, so the engine's shape is: distributed month-level
# aggregation first (the corpus-sized work), then collect each group's
# ORDERED month series into an array (bounded — months per nation, not
# rows) and fold it with the higher-order `aggregate` expression, entirely
# JVM-side codegen, no UDF. Integer halving keeps the fold engine-portable
# (DuckDB `list_reduce` inits from the first element, matching
# `aggregate(slice(xs,2,..), xs[1], ...)` exactly), so the whole recurrence
# is hash-verified. floor() before the cents cast because Spark's
# decimal→bigint cast truncates while DuckDB's rounds.
# ---------------------------------------------------------------------------


def ewma_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.trunc("o_orderdate", "month").alias("month"))
        .agg(
            F.floor(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,6)")
                )
                * 100
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    arrs = monthly.groupBy("n_name").agg(
        F.count("*").alias("n_months"),
        F.expr(
            "transform(sort_array(collect_list(struct(month, cents))),"
            " s -> s.cents)"
        ).alias("xs"),
    )
    return arrs.select(
        "n_name",
        "n_months",
        F.expr(
            "aggregate(slice(xs, 2, size(xs) - 1), xs[0],"
            " (acc, x) -> (acc + x) DIV 2)"
        ).alias("ewma_cents"),
    ).orderBy("n_name")


EWMA_NATION_REVENUE_SQL = """
WITH monthly AS (
  SELECT n.n_name,
         date_trunc('month', o.o_orderdate) AS month,
         CAST(floor(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) * 100) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_name,
       count(*) AS n_months,
       list_reduce(list(cents ORDER BY month), (acc, x) -> (acc + x) // 2)
         AS ewma_cents
FROM monthly
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# top_orders_per_customer — per-group top-k window (O4: top-1-per-group at
# `09_clean_tables.py:263-264,309`, generalized to k=3).
# ---------------------------------------------------------------------------


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_cust
  FROM orders
)
WHERE rank_in_cust <= 3
"""

# ---------------------------------------------------------------------------
# customers_without_orders — anti-join (J5/J6 shape: the reference's
# "not in accumulated list" membership, `03_download_contracts.py:713`).
# ---------------------------------------------------------------------------


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

# ---------------------------------------------------------------------------
# order_lineitem_rollup — per-order rollup joined back to orders: the
# reference's per-contract attachment size sums (A8,
# `03_download_contracts.py:632-656`) as a groupBy + large-large join.
# ---------------------------------------------------------------------------


def order_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "order_revenue"
        ),
    )
    return per_order.join(
        orders, per_order.l_orderkey == orders.o_orderkey
    ).select(
        "o_orderkey", "o_orderstatus", "n_items", "sum_qty", "order_revenue"
    )


ORDER_LINEITEM_ROLLUP_SQL = """
SELECT o.o_orderkey, o.o_orderstatus, t.n_items, t.sum_qty, t.order_revenue
FROM (
  SELECT l_orderkey, count(*) AS n_items,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS order_revenue
  FROM lineitem GROUP BY l_orderkey
) t
JOIN orders o ON t.l_orderkey = o.o_orderkey
"""

# ---------------------------------------------------------------------------
# priority_status_pivot — dynamic wide schema via pivot (the reference's
# keyword-column pivot shape, `04_tag_text_contracts.py:78-89`, on enum cols).
# ---------------------------------------------------------------------------


def priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )
    return p.select(
        "o_orderpriority",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    )


PRIORITY_STATUS_PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# dedup_orders_first_wins — A6 in isolation: deterministic first-wins dedup
# on a composite key (`02_filter_by_CIN.py:254-268`).
# ---------------------------------------------------------------------------


def dedup_orders_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return first_wins_dedup(
        orders,
        keys=["o_custkey", "o_orderpriority"],
        order_by=[F.asc("o_orderdate"), F.asc("o_orderkey")],
    ).select("o_custkey", "o_orderpriority", "o_orderkey", "o_orderdate")


DEDUP_ORDERS_FIRST_WINS_SQL = """
SELECT o_custkey, o_orderpriority, o_orderkey, o_orderdate
FROM (
  SELECT o_custkey, o_orderpriority, o_orderkey, o_orderdate,
         row_number() OVER (
             PARTITION BY o_custkey, o_orderpriority
             ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# nationkey_set_ops — union/intersect/except surface (U1–U3,
# `03_download_contracts.py:516-543`, `09_clean_tables.py:303-307`).
# ---------------------------------------------------------------------------


def nationkey_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").cast("int").alias("nationkey")).distinct()
    s = supplier.select(F.col("s_nationkey").cast("int").alias("nationkey")).distinct()
    both = c.intersect(s).withColumn("membership", F.lit("both"))
    cust_only = c.exceptAll(s).withColumn("membership", F.lit("customer_only"))
    supp_only = s.exceptAll(c).withColumn("membership", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(supp_only)


NATIONKEY_SET_OPS_SQL = """
WITH c AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer),
     s AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
SELECT nationkey, 'both' AS membership          FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'customer_only' AS membership FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'supplier_only' AS membership FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
"""

# ---------------------------------------------------------------------------
# date_sequence — S9: the reference's 130-line hand-rolled calendar clamp +
# daily enumeration (`00_download_CRZ_DB.py:49-180`) as one `sequence` expr.
# ---------------------------------------------------------------------------


def date_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("2024-01-01")),
                F.to_date(F.lit("2024-01-31")),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )


DATE_SEQUENCE_SQL = """
SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
              INTERVAL 1 DAY))::DATE AS d
"""

# ---------------------------------------------------------------------------
# order_parts_array — nested-array algebra (F11/F12: collect, sort,
# element_at, size, array_join — the attachment-array operations of
# `03_download_contracts.py:619-654`, `04_tag_text_contracts.py:136-162`).
# ---------------------------------------------------------------------------


def order_parts_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("parts"))
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.size("parts").alias("n_parts"),
            F.element_at("parts", 1).alias("first_part"),
            F.array_join(F.transform("parts", lambda x: x.cast("string")), ",").alias(
                "parts_str"
            ),
        )
    )


ORDER_PARTS_ARRAY_SQL = """
SELECT l_orderkey AS o_orderkey,
       len(parts)                  AS n_parts,
       parts[1]                    AS first_part,
       array_to_string(parts, ',') AS parts_str
FROM (
  SELECT l_orderkey, list(l_partkey ORDER BY l_partkey) AS parts
  FROM lineitem GROUP BY l_orderkey
)
"""

# ---------------------------------------------------------------------------
# top_status_per_priority — O4 exactly (top-1 per group by ratio/count,
# `09_clean_tables.py:263-264,309`).
# ---------------------------------------------------------------------------


def top_status_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("cnt"), F.asc("o_orderstatus")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("top_status"), "cnt")
    )


TOP_STATUS_PER_PRIORITY_SQL = """
SELECT o_orderpriority, o_orderstatus AS top_status, cnt
FROM (
  SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
         row_number() OVER (
             PARTITION BY o_orderpriority
             ORDER BY count(*) DESC, o_orderstatus ASC) AS rn
  FROM orders GROUP BY o_orderpriority, o_orderstatus
)
WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# string_column_profile — A9 column profiling (`09_clean_tables.py:180-215,
# 288-301`): per string column, non-empty ratio, digit-bearing ratio,
# distinct count — expressed as unpivot(stack) + one hash agg.
# ---------------------------------------------------------------------------


def string_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    long = orders.select(
        F.expr(
            "stack(2, 'o_orderstatus', o_orderstatus,"
            " 'o_orderpriority', o_orderpriority) AS (col_name, cell)"
        )
    )
    return long.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.count(F.when(F.trim(F.col("cell")) != "", 1)) / F.count("*"), 6
        ).alias("nonempty_ratio"),
        F.round(
            F.count(F.when(F.col("cell").rlike(r"\d"), 1)) / F.count("*"), 6
        ).alias("digit_ratio"),
        F.countDistinct("cell").alias("n_distinct"),
    )


STRING_COLUMN_PROFILE_SQL = """
WITH long AS (
  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS cell FROM orders
  UNION ALL
  SELECT 'o_orderpriority' AS col_name, o_orderpriority AS cell FROM orders
)
SELECT col_name,
       count(*) AS n_rows,
       round(count(*) FILTER (WHERE trim(cell) <> '') * 1.0 / count(*), 6) AS nonempty_ratio,
       round(count(*) FILTER (WHERE regexp_matches(cell, '\\d')) * 1.0 / count(*), 6) AS digit_ratio,
       count(DISTINCT cell) AS n_distinct
FROM long
GROUP BY col_name
"""


# ---------------------------------------------------------------------------
# sql_shipping_priority — the declarative SQL surface: ONE ANSI string (TPC-H
# Q3 shape) executed verbatim by BOTH `spark.sql` over registered views and
# the DuckDB oracle. The reference has no query language (SURVEY §3); this is
# the engine's `spark.sql(...)` entry point working end to end — parser →
# Catalyst → same physical join/agg plans the DataFrame form gets.
# Deterministic top-10: ties broken by o_orderkey.
# ---------------------------------------------------------------------------

SQL_SHIPPING_PRIORITY = """
SELECT o.o_orderkey,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
"""


def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crz_scraper_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_SHIPPING_PRIORITY)


QUERIES: dict = {
    "pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "sql_shipping_priority": (sql_shipping_priority, SQL_SHIPPING_PRIORITY),
    "stage2_contract_filter": (stage2_contract_filter, STAGE2_CONTRACT_FILTER_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_BY_NATION_SQL),
    "ewma_nation_revenue": (ewma_nation_revenue, EWMA_NATION_REVENUE_SQL),
    "top_orders_per_customer": (top_orders_per_customer, TOP_ORDERS_PER_CUSTOMER_SQL),
    "customers_without_orders": (
        customers_without_orders,
        CUSTOMERS_WITHOUT_ORDERS_SQL,
    ),
    "order_lineitem_rollup": (order_lineitem_rollup, ORDER_LINEITEM_ROLLUP_SQL),
    "priority_status_pivot": (priority_status_pivot, PRIORITY_STATUS_PIVOT_SQL),
    "dedup_orders_first_wins": (dedup_orders_first_wins, DEDUP_ORDERS_FIRST_WINS_SQL),
    "nationkey_set_ops": (nationkey_set_ops, NATIONKEY_SET_OPS_SQL),
    "date_sequence": (date_sequence, DATE_SEQUENCE_SQL),
    "order_parts_array": (order_parts_array, ORDER_PARTS_ARRAY_SQL),
    "top_status_per_priority": (top_status_per_priority, TOP_STATUS_PER_PRIORITY_SQL),
    "string_column_profile": (string_column_profile, STRING_COLUMN_PROFILE_SQL),
}
