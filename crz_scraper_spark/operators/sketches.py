"""Count-Min sketch: a fixed-size, mergeable frequency summary.

The reference counts word frequencies exactly with a full group-by
(`05_build_special_dictionary.py:99-141`). At 100 TB the exact table is
itself corpus-sized; a Count-Min sketch (Cormode & Muthukrishnan 2005)
bounds the summary at ``depth x width`` counters REGARDLESS of corpus
size, overestimates by at most ``e*N/width`` with probability
``1 - exp(-depth)``, and — because every counter is a plain SUM — merges
across partitions, days, or clusters by element-wise addition. That
mergeability is the scale story: each executor builds its partial sketch
map-side (the group-by below collapses to ``depth x width`` rows per
partition before the shuffle), and incremental daily builds just add
counter tables.

Hashing uses the engine-portable md5 scheme (`operators/dedup.py::
_md5_hash64`): row ``j``'s bucket for token ``t`` is
``conv(substr(md5(j || ':' || t), 1, 15), 16, 10) % width`` — reproducible
bit-for-bit in any engine with md5, so the DuckDB oracle can rebuild the
identical sketch and the driver hash-checks estimates exactly, not just
within the probabilistic bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, j: int, width: int) -> Column:
    """Portable bucket index for hash row ``j``: 60-bit md5 prefix mod width.

    The 15-hex-char prefix is non-negative in both engines, so ``%`` needs
    no pmod dance (DuckDB twin: ``('0x' || substr(md5(j || ':' || t), 1,
    15))::BIGINT % width``).
    """
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 15), 16, 10)
    return (h.cast("bigint") % F.lit(width)).alias(f"b{j}")


def cms_build(
    tokens: DataFrame, token_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the sketch: ``(j, bucket, c)`` — exactly ``depth*width`` rows.

    One pass over the token stream; the explode to ``depth`` rows per token
    is collapsed by map-side partial aggregation to at most ``depth*width``
    rows per task before the (tiny, fixed-size) shuffle.
    """
    c = F.col(token_col)
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _bucket(c, j, width).alias("bucket"))
            for j in range(depth)
        ]
    )
    return (
        tokens.select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch: min over the ``depth`` counters per probe.

    The sketch is ``depth*width`` rows however large the corpus was, so the
    join side is always broadcastable; probe volume drives the cost. The
    estimate never undercounts (each counter is a superset sum), so
    ``est >= true`` is a hard invariant callers can assert in-query.
    """
    c = F.col(token_col)
    keyed = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _bucket(c, j, width).alias("bucket")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("k"),
    ).select("*", F.col("k.j").alias("j"), F.col("k.bucket").alias("bucket"))
    joined = keyed.join(F.broadcast(sketch), ["j", "bucket"], "inner")
    group_cols = [col for col in probes.columns]
    return joined.groupBy(*group_cols).agg(F.min("c").alias("est"))
