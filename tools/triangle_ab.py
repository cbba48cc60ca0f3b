"""A/B harness for part_triangles' oriented-array shuffle payload
(VERDICT r8 item 3 / r9 item 3: the one residual superlinear
production-tier cost, 4-5x per 3.33x at sf10).

Hypothesis under test: the dominant shuffle ships each oriented edge's
SOURCE adjacency array (na) to the dst partition — total elements
= sum_a outdeg(a)^2. But orientation points every edge at the
higher-(deg,id) endpoint, so the SOURCE is the lower-degree node, which
keeps most of its edges oriented OUTWARD (outdeg ~ deg), while the dst's
oriented outdeg is small. Swapping the join order so the intermediate
carries nb instead (total elements = sum_e outdeg(dst(e)) = the number
of oriented 2-paths) should strictly shrink the payload on any
degree-skewed graph and tie on a regular one.

Variants:
  base     — current triangle_counts (adjacency fast path)
  swap     — attach nb FIRST (intermediate shuffles nb on a)
  bucketed — materialize the oriented adjacency as a bucketed+sorted
             warehouse table on node, then run the two payload joins
             against the bucketed reads (pays the write once;
             VERDICT r8's proposed lever)

Usage: python tools/triangle_ab.py <sf_dir> [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crz_scraper_spark.operators.graph import copurchase_adjacency, triangle_counts
from crz_scraper_spark.session import get_spark


def _oriented(adjacency: DataFrame) -> tuple[DataFrame, str | None]:
    """The shared prefix: oriented int-compacted edges (a, b)."""
    und = adjacency.select(
        F.col("node").alias("src"), F.explode("nbrs").alias("dst")
    ).filter(F.col("src") < F.col("dst"))
    deg = adjacency.select("node", F.size("nbrs").alias("deg"))
    e = (
        und.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("deg", "sdeg")
        .join(
            deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"),
            "dst",
        )
    )
    fwd = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).cast("int").alias("a"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).cast("int").alias("b"),
    )
    return oriented, "bigint"


def _finish(tri: DataFrame, out_cast: str | None) -> DataFrame:
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    if out_cast:
        per_node = per_node.select(
            F.col("node").cast(out_cast).alias("node"), "n_tri"
        )
    return per_node.localCheckpoint(eager=True)


def variant_base(spark, sf_dir) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return triangle_counts(adjacency=copurchase_adjacency(li))


def variant_swap(spark, sf_dir) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    oriented, out_cast = _oriented(copurchase_adjacency(li))
    oriented = oriented.persist()
    try:
        oriented.count()
        adj = oriented.groupBy(F.col("a").alias("node")).agg(
            F.sort_array(F.collect_list("b")).alias("nbrs")
        )
        adj_a = adj.select(F.col("node").alias("a"), F.col("nbrs").alias("na"))
        adj_b = adj.select(F.col("node").alias("b"), F.col("nbrs").alias("nb"))
        # SWAP: attach the dst-side array first; the wide intermediate then
        # shuffles nb (sum_e outdeg(dst)) on a instead of na
        # (sum_e outdeg(src) = sum outdeg^2) on b.
        withs = (
            oriented.join(adj_b.hint("shuffle_hash"), "b")
            .join(adj_a.hint("shuffle_hash"), "a")
        )
        tri = withs.select(
            "a", "b", F.explode(F.array_intersect("na", "nb")).alias("c")
        )
        out = _finish(tri, out_cast)
    finally:
        oriented.unpersist()
    return out


def variant_bucketed(spark, sf_dir) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    oriented, out_cast = _oriented(copurchase_adjacency(li))
    oriented = oriented.persist()
    try:
        oriented.count()
        adj = oriented.groupBy(F.col("a").alias("node")).agg(
            F.sort_array(F.collect_list("b")).alias("nbrs")
        )
        spark.sql("DROP TABLE IF EXISTS tri_adj_bucketed")
        (
            adj.write.mode("overwrite")
            .bucketBy(32, "node")
            .sortBy("node")
            .saveAsTable("tri_adj_bucketed")
        )
        badj = spark.table("tri_adj_bucketed")
        adj_a = badj.select(F.col("node").alias("a"), F.col("nbrs").alias("na"))
        adj_b = badj.select(F.col("node").alias("b"), F.col("nbrs").alias("nb"))
        withs = oriented.join(adj_a, "a").join(adj_b, "b")
        tri = withs.select(
            "a", "b", F.explode(F.array_intersect("na", "nb")).alias("c")
        )
        out = _finish(tri, out_cast)
    finally:
        oriented.unpersist()
    return out


VARIANTS = {
    "base": variant_base,
    "swap": variant_swap,
    "bucketed": variant_bucketed,
}


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or list(VARIANTS)
    spark = get_spark("triangle_ab")
    spark.sparkContext.setLogLevel("ERROR")
    # correctness gate at whatever SF: all variants must agree exactly
    results = {}
    for name in names:
        fn = VARIANTS[name]
        # warm (codegen + page cache), then min-of-2
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        runs = []
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 1))
            spark.catalog.clearCache()
        results[name] = runs
        print(f"{name}: {runs} min={min(runs)}", flush=True)
    if len(names) > 1:
        a = VARIANTS[names[0]](spark, sf_dir)
        for name in names[1:]:
            b = VARIANTS[name](spark, sf_dir)
            d = a.exceptAll(b).count() + b.exceptAll(a).count()
            print(f"parity {names[0]} vs {name}: diff_rows={d}", flush=True)
            assert d == 0, (names[0], name)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
