"""Generate an sf1-scale benchmark dataset by replicating the driver's
sf0.1 tables 10x with disjoint key spaces (VERDICT r2 item 7: measure the
scaling SLOPE of shuffle-dominated plans, not just their sf0.1 constant).

Replication preserves referential structure (lineitem -> orders/part/
supplier, orders -> customer, events.user_id -> customer) by shifting every
key domain per replica. Fixed dims (nation, region) are copied once —
exactly how a real 10x corpus behaves. Text is vowel/consonant-permuted per
replica (length-preserving, so n_chars stays valid) and embeddings get a
per-replica dimension-0 offset: WITHOUT that, every document/vector would
have 9 identical twins and the near-dup pair joins would measure a
pathological 45x edge blow-up instead of a 10x corpus.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/crz_sf1)
Then:  SPARK_GRAFT_SF_DIR=/tmp/crz_sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crz_scraper_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
# SPARK_GRAFT_REPLICAS overrides the replication factor (e.g. 30 ⇒ an
# sf3-scale dataset for a SECOND slope datapoint: a plan that is linear
# must show ~3× sf1's time, a hidden quadratic shows ~9×).
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))

OFF = {
    "order": 10_000_000,
    "cust": 1_000_000,
    "supp": 100_000,
    "part": 1_000_000,
    "doc": 10_000_000,
    "vec": 10_000_000,
    "event": 100_000_000,
}

_BASE = "etaoin"
# REPLICAS distinct length-6 permutation targets for translate(), drawn
# deterministically from the 720 permutations of the base (strided so
# consecutive replicas differ in more than one position). Replica 0 keeps
# the identity so the sf0.1 corpus is a literal subset.
import itertools as _it

_ALL_PERMS = ["".join(p) for p in _it.permutations(_BASE)]
_PERMS = [_BASE] + [
    p for p in _ALL_PERMS[:: max(1, len(_ALL_PERMS) // (REPLICAS * 3)) ]
    if p != _BASE
][: REPLICAS - 1]
assert len(_PERMS) >= REPLICAS, (len(_PERMS), REPLICAS)


def _shift(df, col: str, domain: str, i: int):
    return df.withColumn(col, F.col(col) + F.lit(i * OFF[domain]))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crz_sf1"
    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")

    def src(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def sink(df, t):
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    for t in ("nation", "region"):
        sink(src(t), t)

    def replicate(t, fn):
        base = src(t)
        parts = [fn(base, i) for i in range(REPLICAS)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        sink(u, t)
        print(f"{t}: {REPLICAS}x written", flush=True)

    replicate("customer", lambda d, i: _shift(d, "c_custkey", "cust", i))
    replicate("supplier", lambda d, i: _shift(d, "s_suppkey", "supp", i))
    replicate("part", lambda d, i: _shift(d, "p_partkey", "part", i))
    replicate(
        "orders",
        lambda d, i: _shift(
            _shift(d, "o_orderkey", "order", i), "o_custkey", "cust", i
        ),
    )
    replicate(
        "lineitem",
        lambda d, i: _shift(
            _shift(
                _shift(d, "l_orderkey", "order", i), "l_partkey", "part", i
            ),
            "l_suppkey",
            "supp",
            i,
        ),
    )
    replicate(
        "events",
        lambda d, i: _shift(
            _shift(d, "event_id", "event", i), "user_id", "cust", i
        ),
    )
    replicate(
        "documents",
        lambda d, i: _shift(d, "doc_id", "doc", i).withColumn(
            "text", F.translate("text", _BASE, _PERMS[i])
        ),
    )
    # Per-replica offset on a ROTATING dimension (i % dim), not a growing
    # dim-0 shift: at high replica counts a monotone dim-0 drift makes the
    # late replicas nearly parallel in cosine space — one giant artificial
    # dense direction that swallows the whole corpus into a single
    # quantizer cell (a data-generation pathology, not a real-corpus
    # shape). Rotating the axis keeps every replica separated from every
    # other (two ±3.0 coordinate differences) while replica 0 stays the
    # literal sf0.1 subset. Past 64 replicas the rotation wraps, so the
    # offset MAGNITUDE scales with the wrap count (replica 65 gets +6.0 at
    # dim 1 where replica 1 got +3.0) — without that, wrapped replicas
    # would be exact embedding twins of their mod-64 partner and every
    # near-dup query would measure a 2x multiplicity artifact.
    replicate(
        "embeddings",
        lambda d, i: _shift(d, "vec_id", "vec", i).withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, idx: F.when(
                    F.lit(i > 0) & (idx == F.lit(i % 64)),
                    x + F.lit(3.0 * (1 + (i - 1) // 64)),
                ).otherwise(x).cast("float"),
            ),
        ),
    )
    for t in (
        "customer supplier part orders lineitem events documents embeddings"
    ).split():
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
