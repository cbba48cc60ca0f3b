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

Hashing is crc32 double-hashing (Kirsch-Mitzenmacher: pos_i = h1 + i*h2):
two C-speed crc calls per item, k arithmetic probes — deterministic across
runs/processes, and ~10× faster per row than k md5 digests. The choice is
FREE of cross-engine concerns: correctness never depends on which items
the filter passes (exactness comes from the verify join), only on
build/probe using the same family — so the fastest deterministic hash
wins. A production build swaps in vectorized xxhash64 over Arrow buffers;
the operator shape (build bitset driver-side from the SMALL side,
broadcast, probe in an Arrow-batched pandas UDF) is unchanged. Spark's
built-in `DataFrame.stat.bloomFilter` is the JVM alternative when the
probe can stay in Scala; the pure-numpy form below keeps the bit layout
explicit and testable.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


def _positions(item: str, n_bits: int, k: int) -> list[int]:
    b = item.encode()
    h1 = zlib.crc32(b)
    # Independent second hash via a salted stream; |1 keeps the stride odd
    # so for power-of-two n_bits the probe sequence never degenerates.
    h2 = zlib.crc32(b, 0x9E3779B9) | 1
    return [(h1 + i * h2) % n_bits for i in range(k)]


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
        # Vectorized probe: two C-speed crc32 calls per item, then all k
        # probe positions and bit gathers as whole-batch numpy ops — the
        # per-row-Python formulation (s.map with per-probe indexing) was
        # measured ~10× slower on the sf0.1 gram stream.
        b = bc.value
        notna = s.notna().to_numpy()
        enc = [x.encode() if isinstance(x, str) else b"" for x in s]
        h1 = np.fromiter(
            (zlib.crc32(e) for e in enc), dtype=np.uint64, count=len(enc)
        )
        h2 = (
            np.fromiter(
                (zlib.crc32(e, 0x9E3779B9) for e in enc),
                dtype=np.uint64,
                count=len(enc),
            )
            | 1
        )
        ok = notna.copy()
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            bit = (b[(pos >> np.uint64(3)).astype(np.int64)]
                   >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            ok &= bit.astype(bool)
        return pd.Series(ok)

    return might_contain


def build_bloom_from_hashes(
    hashes: Iterable[int], n_bits: int = 1 << 20, k: int = 5
) -> np.ndarray:
    """Bitset over PRE-HASHED 64-bit keys (e.g. Spark-side `xxhash64` of the
    item): h1/h2 derive from the low/high halves (Kirsch-Mitzenmacher), so
    no further hashing happens at probe time. Preferred over the string
    form whenever the probe side is large: the JVM computes xxhash64 in
    codegen and the UDF ships 8-byte longs instead of strings."""
    h = np.asarray(list(hashes), dtype=np.int64).view(np.uint64)
    bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    h1 = h % np.uint64(n_bits)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(
                np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
            ),
        )
    return bits


def might_contain_hash_udf(
    spark: SparkSession, bits: np.ndarray, n_bits: int = 1 << 20, k: int = 5
):
    """Probe for `build_bloom_from_hashes`: input is the 64-bit hash column
    (LongType). Whole-batch numpy — zero per-row Python, zero string
    traffic (measured: the string-probe decontamination dropped from 13 s
    to ~the exact join's own cost at sf0.1 after switching)."""
    from pyspark.sql.types import BooleanType as _B

    bc = spark.sparkContext.broadcast(bits)

    @pandas_udf(_B())
    def might_contain(s: pd.Series) -> pd.Series:
        b = bc.value
        notna = s.notna().to_numpy()
        h = s.fillna(0).to_numpy(dtype=np.int64).view(np.uint64)
        h1 = h % np.uint64(n_bits)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        ok = notna.copy()
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            bit = (
                b[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1)
            ok &= bit.astype(bool)
        return pd.Series(ok)

    return might_contain
