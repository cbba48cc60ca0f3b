"""Iterative graph ranking (PageRank) as bounded-iteration DataFrame joins.

The reference has no graph operator; this extends the engine the same way
`operators/similarity.py::kmeans_fit` does for clustering — an iterative
distributed algorithm expressed as a driver loop over declarative plans, so
Catalyst/AQE handle the physical strategy at any scale. The per-iteration
shape is the standard Pregel-style step: join ranks to the (persisted)
out-degree-annotated edge list on ``src``, shuffle contributions by ``dst``,
aggregate. Nothing node- or edge-proportional ever reaches the driver; the
loop is a FIXED iteration count, so the whole computation is one plan chain.

All arithmetic is integer fixed-point (parts-per-million ranks, integer DIV
for both the out-degree split and the damping multiply) — deterministic and
engine-portable, so a SQL oracle that unrolls the same ``iterations`` steps
reproduces the ranks bit-for-bit. That is what makes an *iterative* operator
hash-checkable against DuckDB at all: float PageRank would drift in the last
ulp between engines.

Fixed-point quantization note: a node's contribution ``rank DIV outdeg``
floors to 0 once ``outdeg > rank`` (hub nodes with millions of neighbours at
ppm scale). That loses mass monotonically — ranks are a deterministic lower
bound of the real-valued iteration, which is the right failure mode for a
"top influencers" ranking; raise ``scale`` if the graph's max degree
approaches it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power steps, integer ppm.

    ``edges`` is a directed edge list; nodes are the distinct sources (a
    symmetric graph — the co-occurrence graphs this engine builds — makes
    that the full node set). Sinks receive the teleport mass only
    (coalesce 0), matching the unrolled SQL oracle exactly.
    """
    base = scale - scale * damping_num // damping_den
    deg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    # Annotate edges with the source's out-degree ONCE and persist: every
    # iteration re-reads this frame, and both the join and the per-iteration
    # rank frame hash-partition on the source key, so the exchange is reused
    # across iterations instead of reshuffling the (corpus-sized) edge list.
    e = edges.join(deg, src).persist()
    nodes = deg.select(F.col(src).alias("node"))
    ranks = nodes.select("node", F.lit(scale).cast("bigint").alias("rank"))
    try:
        for _ in range(iterations):
            incoming = (
                e.join(ranks, e[src] == ranks["node"])
                .select(
                    F.col(dst).alias("node"),
                    F.expr("rank DIV outdeg").alias("contrib"),
                )
                .groupBy("node")
                .agg(F.sum("contrib").alias("tot"))
            )
            ranks = nodes.join(incoming, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.coalesce(
                        F.expr(f"({damping_num} * tot) DIV {damping_den}"),
                        F.lit(0),
                    )
                )
                .cast("bigint")
                .alias("rank"),
            )
        # Materialize the bounded-depth chain while the edge persist is
        # alive; the result is node-sized, not edge-sized, so localCheckpoint
        # (executor-memory, no lineage) is the right cut point.
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return ranks


def copurchase_edges(
    lineitem: DataFrame, max_basket: int = 50
) -> DataFrame:
    """Distinct symmetric (src, dst) part pairs co-occurring in an order.

    Pair generation is quadratic in basket size, so baskets with more than
    ``max_basket`` distinct parts are dropped first — the standard guard
    that keeps one mega-order (a crawler, a corporate bulk buy) from
    emitting k^2 pairs in a single task. TPC-H baskets top out at 7 parts,
    so the cap is a no-op on testdata and purely a scale guard.

    Physical shape: NOT the naive self-join on the order key (two scans +
    a join + the distinct = three corpus shuffles). One groupBy collapses
    each order to its part set (a single shuffle, map-side combined), the
    cap filters on ``size(set)``, and the k^2 expansion is two map-side
    explodes; only the final distinct shuffles again — and on the pair
    key, which is also the output partitioning downstream joins want.
    """
    baskets = (
        lineitem.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .filter(
            (F.size("parts") >= 2) & (F.size("parts") <= max_basket)
        )
        .select("parts")
    )
    return (
        baskets.select(F.explode("parts").alias("src"), "parts")
        .select("src", F.explode("parts").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, top_k: int | None = None) -> DataFrame:
    """(node, n_tri): how many triangles each node participates in.

    ``edges`` is a symmetric edge list (both directions present, as
    `copurchase_edges` emits). The naive wedge enumeration explodes on hub
    nodes (sum of deg^2); the standard fix — and the whole point of this
    operator — is DEGREE-ORDERED ORIENTATION (Chiba-Nishizeki / the
    "node-iterator++" scheme): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, which caps every node's
    oriented out-degree at O(sqrt(m)) and the wedge count at O(m^1.5)
    regardless of the degree distribution. The orientation is a total
    order, so each triangle {a,b,c} is enumerated exactly once as the
    wedge (a->b, a->c with b before c) closed by the oriented edge b->c.

    Per-iteration shape: one self-join of the oriented edge list on the
    wedge apex, one semi-ish join against the same list for closure, one
    explode+group for per-node counts — all shuffle-partitioned on node
    keys, nothing collected. The result is hash-checkable against a plain
    a<b<c three-way self-join oracle: orientation changes the PLAN, not
    the triangle set.
    """
    und = edges.filter(F.col("src") < F.col("dst"))
    deg = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # Annotate both endpoints, then orient by (deg, node).
    e = (
        und.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("deg", "sdeg")
        .join(
            deg.withColumnRenamed("node", "dst").withColumnRenamed(
                "deg", "ddeg"
            ),
            "dst",
        )
    )
    fwd = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(fwd, F.col("ddeg")).otherwise(F.col("sdeg")).alias("bdeg"),
    ).persist()
    try:
        e1 = oriented.select(
            F.col("a"), F.col("b"), F.col("bdeg").alias("b1deg")
        )
        e2 = oriented.select(
            F.col("a"), F.col("b").alias("c"), F.col("bdeg").alias("b2deg")
        )
        wedges = e1.join(e2, "a").filter(
            (F.col("b1deg") < F.col("b2deg"))
            | ((F.col("b1deg") == F.col("b2deg")) & (F.col("b") < F.col("c")))
        )
        closing = oriented.select(
            F.col("a").alias("b"), F.col("b").alias("c")
        )
        tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
        per_node = (
            tri.select(
                F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                    "node"
                )
            )
            .groupBy("node")
            .agg(F.count("*").alias("n_tri"))
        )
        if top_k is not None:
            per_node = per_node.orderBy(F.desc("n_tri"), "node").limit(top_k)
        per_node = per_node.localCheckpoint(eager=True)
    finally:
        oriented.unpersist()
    return per_node
