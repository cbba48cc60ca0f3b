"""Broadcast Bloom-filter membership — the shuffle-free prefilter tier for
membership-style joins whose small side fits a bitset but not a hash set
per task (benchmark decontamination, URL blocklists, id blacklists).

Why this exists: the exact decontamination join (`eval_contamination`)
shuffles the full training-corpus n-gram stream on the gram key. At 100 TB
that shuffle is the pipeline's dominant cost even though the eval side is
benchmark-sized (MBs). A Bloom filter of the eval grams broadcast to every
task turns the corpus side into a MAP-ONLY scan: candidate rows (true
matches + fp-rate false positives) are the only rows that reach the exact
verification join, which then runs against the broadcast eval set — the
corpus never shuffles at all. Because the filter build and probe use the
same deterministic hash family, there are NO false negatives: prefilter +
exact verify ≡ the exact join, so the composed operator stays fully
oracle-checkable.

Hashing is md5-based here (portable, deterministic, and shared with the
repo's other cross-engine hash constructions); a production build swaps in
vectorized xxhash64 over Arrow buffers — the operator shape (build bitset
driver-side from the SMALL side, broadcast, probe in an Arrow-batched
pandas UDF) is unchanged. Spark's built-in `DataFrame.stat.bloomFilter`
is the JVM alternative when the probe can stay in Scala; the pure-numpy
form below keeps the bit layout explicit and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


def _positions(item: str, n_bits: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"{i}:{item}".encode()).hexdigest()[:15], 16) % n_bits
        for i in range(k)
    ]


def build_bloom(
    items: Iterable[str], n_bits: int = 1 << 20, k: int = 5
) -> np.ndarray:
    """Build the bitset from the SMALL side (driver-side; the eval set /
    blocklist is index-metadata-sized by assumption). n_bits=2^20 at k=5
    holds ~10^5 items under 1% fp; size for ~1.44 * n * log2(1/fp) bits."""
    bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    for it in items:
        for h in _positions(it, n_bits, k):
            bits[h >> 3] |= np.uint8(1 << (h & 7))
    return bits


def might_contain_udf(
    spark: SparkSession, bits: np.ndarray, n_bits: int = 1 << 20, k: int = 5
):
    """Arrow-batched membership probe over the broadcast bitset.

    Guarantee: never False for an item that was inserted (no false
    negatives); True for a bounded fraction of absent items (false
    positives), which the caller removes with an exact broadcast join.
    """
    bc = spark.sparkContext.broadcast(bits)

    @pandas_udf(BooleanType())
    def might_contain(s: pd.Series) -> pd.Series:
        b = bc.value

        def chk(x) -> bool:
            if x is None:
                return False
            return all(
                (b[h >> 3] >> (h & 7)) & 1 for h in _positions(x, n_bits, k)
            )

        return s.map(chk)

    return might_contain
