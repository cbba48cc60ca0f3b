"""Remaining TPC-H query shapes (Q2/Q8/Q9/Q11/Q15/Q16/Q20 patterns), adapted
to the driver's star schema — which has no ``partsupp`` table, so ``lineitem``
plays the part↔supplier bridge and ``p_retailprice`` the cost proxy.

Together with tpch_plans/extra_plans/parity_plans this completes coverage of
all 22 canonical TPC-H query *shapes* (correlated min subquery, market-share
ratio, scalar-subquery HAVING, max-equality top-1, NOT-IN anti-join,
nested semi-join chain) — the large-join/agg surface the reference never had
(its joins are all small-side lookups, SURVEY.md §2.3 note) but a 100 TB
engine must provide.

Plan posture notes per query are inline; throughout, dims broadcast, the
single big fact scan shuffles at most once, and every money aggregate uses
the decimal-exact `dsum` so results are summation-order independent (the
cross-engine hash-match requirement, SURVEY.md §7 Hard 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crz_scraper_spark.catalog import load_table
from crz_scraper_spark.functions.casts import dsum

# ---------------------------------------------------------------------------
# min_cost_supplier — Q2 shape: correlated MIN subquery. For every LARGE
# part, the European supplier(s) whose cheapest observed sale price equals
# the part's global minimum among European suppliers. The correlated
# subquery becomes a window MIN over the per-(part, supplier) aggregate —
# one shuffle on l_partkey serves both the aggregate and the window.
# Ties keep all achieving suppliers (same as SQL `= (SELECT min...)`).
# No division anywhere: MIN over raw doubles is exact cross-engine.
# ---------------------------------------------------------------------------


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    euro_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            supplier.s_nationkey == nation.n_nationkey,
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # euro_supp (~1/5 of supplier) and the LARGE part slice are constant
    # FRACTIONS of sf-proportional tables — still sf-proportional, so no
    # forced broadcast: AQE broadcasts them at small sf and degrades to
    # shuffle joins at 100 TB instead of OOMing.
    pair_min = (
        li.join(euro_supp, li.l_suppkey == euro_supp.s_suppkey)
        .join(
            part.filter(F.col("p_type") == "LARGE"),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    best = F.min("min_price").over(Window.partitionBy("p_partkey"))
    return (
        pair_min.withColumn("part_best", best)
        .filter(F.col("min_price") == F.col("part_best"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "min_price")
    )


MIN_COST_SUPPLIER_SQL = """
WITH euro_pairs AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
         min(l.l_extendedprice) AS min_price
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  JOIN part p     ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'LARGE'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name, min_price
FROM euro_pairs e
WHERE min_price = (SELECT min(min_price) FROM euro_pairs e2
                   WHERE e2.p_partkey = e.p_partkey)
"""

# ---------------------------------------------------------------------------
# nation_market_share — Q8 shape: per order-year, NATION_7 suppliers' share
# of ECONOMY-part revenue sold to AMERICA customers. The share is a
# sum(CASE)/sum ratio over one aggregate pass; both sums are decimal-exact,
# the final double division is IEEE-deterministic on identical inputs.
# ---------------------------------------------------------------------------


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    america_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
        nation.n_regionkey == region.r_regionkey,
    ).select(F.col("n_nationkey").alias("cust_nk"))
    supp_nation = supplier.join(
        F.broadcast(nation),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0))
    # The ECONOMY-part semi-join is the most selective predicate on the fact
    # table, so it runs BEFORE the lineitem⋈orders shuffle (Catalyst does not
    # reorder across a left-semi without CBO stats): at 100 TB it is the
    # difference between shuffling the full fact table and shuffling only the
    # ECONOMY slice. The ECONOMY part slice is a constant fraction of the
    # sf-proportional part table, so it carries NO hint (AQE broadcasts it
    # while it fits, shuffles at 100 TB); customer is pre-shrunk to the
    # AMERICA region (1/5 of rows) with a 5-row-broadcast semi-join and
    # then joined UNHINTED, and supp_nation (supplier-sized, 10k × sf) is
    # unhinted too. The one guaranteed shuffle is the pre-filtered
    # li⋈orders.
    li_econ = li.join(
        part.filter(F.col("p_type") == "ECONOMY"),
        li.l_partkey == part.p_partkey,
        "left_semi",
    )
    customer_america = customer.join(
        F.broadcast(america_nations),
        customer.c_nationkey == F.col("cust_nk"),
        "left_semi",
    )
    return (
        li_econ.join(orders, li_econ.l_orderkey == orders.o_orderkey)
        .join(customer_america, orders.o_custkey == customer_america.c_custkey)
        .join(supp_nation, li_econ.l_suppkey == supp_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                dsum(target, scale=6) / dsum(vol, scale=6), 6
            ).alias("mkt_share")
        )
    )


NATION_MARKET_SHARE_SQL = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(
         CAST(round(sum(CAST(CASE WHEN sn.n_name = 'NATION_7'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0.0 END AS DECIMAL(18,6))), 6) AS DOUBLE)
         / CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,6))), 6) AS DOUBLE),
         6) AS mkt_share
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
WHERE c.c_nationkey IN (
        SELECT n.n_nationkey FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'AMERICA')
  AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# product_profit — Q9 shape: profit per (supplier nation, year) over parts
# whose name contains 'red'; cost proxy = p_retailprice * l_quantity / 100
# (no partsupp.ps_supplycost in this schema). The profit expression is
# computed per row then decimal-summed — one fact shuffle on the group keys.
# ---------------------------------------------------------------------------


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") / F.lit(100.0)
    return (
        # 'red' parts are a constant fraction of the part table (sf-
        # proportional) — unhinted, AQE decides.
        li.join(
            part.filter(F.col("p_name").contains("red")).select(
                "p_partkey", "p_retailprice"
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        # supplier grows with sf → no forced broadcast hint; AQE decides.
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(amount).alias("profit"))
    )


PRODUCT_PROFIT_SQL = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - p.p_retailprice * l.l_quantity / 100.0
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# important_part_value — Q11 shape: scalar subquery in HAVING. Per-part
# shipped value from NATION_3 suppliers, keeping parts above 0.1% of the
# grand total. The grand total is a 1-row broadcast cross join — the fact
# table shuffles once on l_partkey; the threshold compare is map-side.
# ---------------------------------------------------------------------------


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    n3_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        supplier.s_nationkey == nation.n_nationkey,
        "left_semi",
    ).select("s_suppkey")
    # n3_supp is 1/25 of supplier — still sf-proportional, so unhinted.
    base = li.join(n3_supp, li.l_suppkey == F.col("s_suppkey"), "left_semi")
    per_part = base.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice")).alias("part_value")
    )
    total = base.agg(
        dsum(F.col("l_extendedprice")).alias("total_value")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.001)
        .select("l_partkey", "part_value")
    )


IMPORTANT_PART_VALUE_SQL = """
WITH base AS (
  SELECT l.l_partkey, l.l_extendedprice
  FROM lineitem l
  WHERE l.l_suppkey IN (
    SELECT s.s_suppkey FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3')
)
SELECT l_partkey,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS part_value
FROM base
GROUP BY l_partkey
HAVING CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
       > (SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
          FROM base) * 0.001
"""

# ---------------------------------------------------------------------------
# top_revenue_supplier — Q15 shape: aggregate → global MAX → equality join
# back (the view + scalar-subquery pattern). Revenue per supplier over
# 1996Q1 shipments; suppliers achieving the maximum survive (ties kept,
# exactly SQL's `= (SELECT max...)`). Supplier agg is tiny → the MAX is a
# 1-row broadcast; equality over decimal-rounded doubles is exact.
# ---------------------------------------------------------------------------


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    best = rev.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        # After the max-equality filter the probe side is ~1 row; supplier
        # grows with sf, so it carries no hint — AQE broadcasts the tiny
        # filtered side instead of forcing a multi-GB supplier broadcast.
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


TOP_REVENUE_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""

# ---------------------------------------------------------------------------
# part_supplier_variety — Q16 shape: distinct-supplier counts per part
# attribute triple, with a NOT-IN exclusion subquery (suppliers with
# negative-ish balances) that becomes a broadcast anti-join BEFORE the
# distinct-count shuffle, and attribute exclusions pushed to the part scan.
# ---------------------------------------------------------------------------


def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    keep_parts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.filter(F.col("s_acctbal") < 100.0).select("s_suppkey")
    # bad_supp / keep_parts are constant fractions of supplier / part —
    # sf-proportional, so no forced broadcast (AQE decides).
    return (
        li.join(bad_supp, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(keep_parts, li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


PART_SUPPLIER_VARIETY_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25)
  AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 100.0)
GROUP BY 1, 2, 3
"""

# ---------------------------------------------------------------------------
# excess_quantity_suppliers — Q20 shape: nested semi-join chain. Suppliers
# in NATION_5 who shipped more than 60 units of blue parts during 1997.
# part-filter semi-join → per-supplier HAVING aggregate → semi-join into the
# supplier dim; lineitem shuffles once on l_suppkey. Only the fixed-size
# nation slice is hinted; every sf-proportional side is left to AQE.
# ---------------------------------------------------------------------------


def excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    blue_parts = part.filter(F.col("p_name").contains("blue")).select("p_partkey")
    big_shippers = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(blue_parts, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("blue_qty"))
        .filter(F.col("blue_qty") > 60.0)
    )
    # big_shippers is a per-supplier aggregate — supplier-cardinality, i.e.
    # sf-proportional — so it carries no hint either (blue_parts likewise).
    return (
        supplier.join(
            big_shippers,
            supplier.s_suppkey == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_5")),
            supplier.s_nationkey == nation.n_nationkey,
            "left_semi",
        )
        .select("s_suppkey", "s_name", "blue_qty")
    )


EXCESS_QUANTITY_SUPPLIERS_SQL = """
SELECT s.s_suppkey, s.s_name, t.blue_qty
FROM supplier s
JOIN (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS blue_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
  GROUP BY l_suppkey
  HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) > 60.0
) t ON s.s_suppkey = t.l_suppkey
WHERE s.s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5')
"""


# ---------------------------------------------------------------------------
# part_affinity — market-basket co-occurrence: the top part pairs bought in
# the same order. The self-join keys on l_orderkey, so pair generation is
# LOCAL to each order after one shuffle, and the p1 < p2 ordering keeps
# each unordered pair exactly once; blow-up is bounded by lines-per-order
# squared (single digits), never corpus². distinct before pairing so a
# part repeated within an order can't double-count.
# ---------------------------------------------------------------------------


def part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, (a.l_orderkey == b.__ok) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
    )
    # Global top-20 via rank-then-filter: compiles to
    # TakeOrderedAndProject(limit=20) (bounded per-partition heap, no
    # corpus-wide sort, no single-partition WindowExec over the pairs
    # table — which is part²-shaped in the worst case). Physical shape
    # pinned by tests/test_scale_layout.py::test_global_topk_plans_are_bounded.
    w = Window.orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("part_a", "part_b", "n_orders", "rnk")
    )


# ---------------------------------------------------------------------------
# association_rules — market-basket rules on top of part_affinity's pair
# counts: every co-occurrence pair yields two directed rules (a ⇒ b and
# b ⇒ a) with support, confidence = n_ab/n_a, and lift = N·n_ab/(n_a·n_b),
# all as integer ppm (numerator-first multiply then integer DIV — the only
# division both engines floor identically). Item and pair counts come from
# the same distinct basket projection; item counts join back part-sized
# (AQE broadcasts them). Top-30 physical shape: the rnk<=30 filter
# triggers LimitPushDownThroughWindow, so the executed plan is
# TakeOrderedAndProject(limit=30) — bounded per-partition heaps — BELOW a
# residual single-partition rnk window whose input is the 30 surviving
# rows, not the rule table (shape pinned by
# tests/test_scale_layout.py::test_global_topk_plans_are_bounded, which
# asserts on the EXECUTED plan). Overflow headroom: n_ab·N·10^6 needs BIGINT only up
# to ~10^12 baskets·pair-count product; beyond that (extreme 100 TB), lift
# should accumulate in DECIMAL(38,0) — noted, not needed at any tested SF.
# ---------------------------------------------------------------------------

_RULE_MIN_SUPPORT = 3
_RULE_TOP = 30


def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    totals = op.agg(
        F.count_distinct("l_orderkey").alias("n_baskets")
    )
    item = op.groupBy(F.col("l_partkey").alias("ante")).agg(
        F.count("*").alias("n_ante")
    )
    a = op.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = op.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, (a.l_orderkey == b.__ok) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _RULE_MIN_SUPPORT)
    )
    rules = pairs.select(
        F.col("pa").alias("ante"), F.col("pb").alias("cons"), "n_ab"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("ante"), F.col("pa").alias("cons"), "n_ab"
        )
    )
    joined = (
        rules.join(item, "ante")
        .join(
            item.select(
                F.col("ante").alias("cons"), F.col("n_ante").alias("n_cons")
            ),
            "cons",
        )
        .crossJoin(F.broadcast(totals))
    )
    scored = joined.select(
        "ante",
        "cons",
        "n_ab",
        F.expr("(n_ab * 1000000) DIV n_ante").alias("conf_ppm"),
        F.expr("(n_ab * n_baskets * 1000000) DIV (n_ante * n_cons)").alias(
            "lift_ppm"
        ),
    )
    w = Window.orderBy(
        F.desc("lift_ppm"), F.desc("conf_ppm"), F.asc("ante"), F.asc("cons")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _RULE_TOP)
        .select("ante", "cons", "n_ab", "conf_ppm", "lift_ppm", "rnk")
    )


ASSOCIATION_RULES_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM op),
item AS (SELECT l_partkey AS ante, count(*) AS n_ante FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {_RULE_MIN_SUPPORT}
),
rules AS (
  SELECT pa AS ante, pb AS cons, n_ab FROM pairs
  UNION ALL
  SELECT pb AS ante, pa AS cons, n_ab FROM pairs
),
scored AS (
  SELECT r.ante, r.cons, r.n_ab,
         (r.n_ab * 1000000) // i1.n_ante AS conf_ppm,
         (r.n_ab * (SELECT n_baskets FROM n) * 1000000)
           // (i1.n_ante * i2.n_ante) AS lift_ppm
  FROM rules r
  JOIN item i1 ON r.ante = i1.ante
  JOIN item i2 ON r.cons = i2.ante
)
SELECT ante, cons, n_ab, conf_ppm, lift_ppm, rnk
FROM (
  SELECT *, row_number() OVER (
    ORDER BY lift_ppm DESC, conf_ppm DESC, ante ASC, cons ASC) AS rnk
  FROM scored
)
WHERE rnk <= {_RULE_TOP}
"""


PART_AFFINITY_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_orders
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_orders, rnk FROM (
  SELECT part_a, part_b, n_orders,
         row_number() OVER (ORDER BY n_orders DESC, part_a, part_b) AS rnk
  FROM pairs
)
WHERE rnk <= 20
"""


QUERIES: dict = {
    "min_cost_supplier": (min_cost_supplier, MIN_COST_SUPPLIER_SQL),
    "part_affinity": (part_affinity, PART_AFFINITY_SQL),
    "association_rules": (association_rules, ASSOCIATION_RULES_SQL),
    "nation_market_share": (nation_market_share, NATION_MARKET_SHARE_SQL),
    "product_profit": (product_profit, PRODUCT_PROFIT_SQL),
    "important_part_value": (important_part_value, IMPORTANT_PART_VALUE_SQL),
    "top_revenue_supplier": (top_revenue_supplier, TOP_REVENUE_SUPPLIER_SQL),
    "part_supplier_variety": (part_supplier_variety, PART_SUPPLIER_VARIETY_SQL),
    "excess_quantity_suppliers": (
        excess_quantity_suppliers,
        EXCESS_QUANTITY_SUPPLIERS_SQL,
    ),
}
