"""Graph plans: iterative ranking over relationship graphs derived from the
relational tables (operators/graph.py).

`part_pagerank` ranks parts by damped PageRank over the co-purchase graph
(parts sharing an order). The whole iteration is integer fixed-point, so the
oracle — the SAME ``iterations`` power steps unrolled as chained CTEs,
generated from the same Python constants — hash-matches the Spark loop
exactly. This is the engine's demonstration that even iterative algorithms
stay inside the driver-verified correctness gate when their arithmetic is
made engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crz_scraper_spark.catalog import load_table

_PR_ITERS = 5
_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100
_PR_SCALE = 1_000_000
_PR_MAX_BASKET = 50
_PR_TOP = 20


def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crz_scraper_spark.operators.graph import (
        copurchase_edges,
        pagerank_fixed_point,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, max_basket=_PR_MAX_BASKET)
    ranks = pagerank_fixed_point(
        edges,
        iterations=_PR_ITERS,
        damping_num=_PR_DAMP_NUM,
        damping_den=_PR_DAMP_DEN,
        scale=_PR_SCALE,
    )
    # Global top-K: plain orderBy + limit compiles to TakeOrderedAndProject
    # (per-partition heaps, K rows to the driver) — no full sort runs.
    return ranks.select(
        F.col("node").alias("partkey"), F.col("rank").alias("rank_ppm")
    ).orderBy(F.desc("rank_ppm"), "partkey").limit(_PR_TOP)


_TRI_TOP = 20


def part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph (top 20).

    The Spark plan uses degree-ordered orientation (operators/graph.py::
    triangle_counts — O(m^1.5) wedges whatever the degree skew); the oracle
    is the plain a<b<c three-way self-join, which enumerates the same
    triangle set by commutativity. Same results, different physical
    strategy — exactly the contract the correctness gate checks.
    """
    from crz_scraper_spark.operators.graph import (
        copurchase_edges,
        triangle_counts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, max_basket=_PR_MAX_BASKET)
    out = triangle_counts(edges, top_k=_TRI_TOP)
    return out.select(F.col("node").alias("partkey"), "n_tri").orderBy(
        F.desc("n_tri"), "partkey"
    )


_GRAPH_PREFIX_SQL = f"""
WITH ok_orders AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING count(DISTINCT l_partkey) <= {_PR_MAX_BASKET}
),
li AS (
  SELECT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN ok_orders USING (l_orderkey)
),
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)"""


def _triangles_sql() -> str:
    return f"""{_GRAPH_PREFIX_SQL},
und AS (SELECT src AS u, dst AS v FROM pairs WHERE src < dst),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node AS partkey, count(*) AS n_tri
FROM (SELECT unnest([a, b, c]) AS node FROM tri)
GROUP BY node
ORDER BY n_tri DESC, partkey
LIMIT {_TRI_TOP}
"""


def _pagerank_sql() -> str:
    base = _PR_SCALE - _PR_SCALE * _PR_DAMP_NUM // _PR_DAMP_DEN
    steps = []
    for k in range(1, _PR_ITERS + 1):
        steps.append(
            f"""r{k} AS (
  SELECT n.node,
         CAST({base} + COALESCE(({_PR_DAMP_NUM} * s.tot) // {_PR_DAMP_DEN}, 0)
              AS BIGINT) AS rank
  FROM (SELECT src AS node FROM deg) n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS tot
    FROM e JOIN r{k - 1} r ON r.node = e.src
    GROUP BY e.dst
  ) s USING (node)
)"""
        )
    chain = ",\n".join(steps)
    return f"""{_GRAPH_PREFIX_SQL},
deg AS (SELECT src, count(*) AS outdeg FROM pairs GROUP BY src),
e AS (SELECT p.src, p.dst, d.outdeg FROM pairs p JOIN deg d USING (src)),
r0 AS (SELECT src AS node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM deg),
{chain}
SELECT node AS partkey, rank AS rank_ppm
FROM r{_PR_ITERS}
ORDER BY rank_ppm DESC, partkey
LIMIT {_PR_TOP}
"""


QUERIES: dict = {
    "part_pagerank": (part_pagerank, _pagerank_sql()),
    "part_triangles": (part_triangles, _triangles_sql()),
}
