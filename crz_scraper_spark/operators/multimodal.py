"""Multimodal binary-column plumbing: opaque payload bytes + typed metadata,
decode/feature-extract as Arrow-batched pandas UDFs over `mapInPandas`.

BASELINE.json:6 extension; the reference's analog is the PDF/OCR subprocess
stage (X1–X5, `04_convert_contracts_to_text.py:251-338`,
`06_extract_tables.py:140-220`) — per-file black-box extraction, which in
Spark is a per-partition batched map with no shuffle.

The actual image/audio decode libraries are NOT in this container, so the
decode step is a clearly-marked deterministic FAKE (`_fake_decode`): it
derives metadata purely from the payload bytes, which keeps the Spark-side
contract — schema, Arrow batch shape, partition-parallel UDF signature —
fully real and testable. Swap `_fake_decode` for PIL/ffmpeg in a real
deployment; everything else stands.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fake_width bigint, fake_height bigint, "
    "fmt string, payload_md5 string"
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic metadata from byte length only.

    A real implementation would be e.g. `PIL.Image.open(io.BytesIO(payload))`
    — unavailable in this container. Raising NotImplementedError here would
    kill the plumbing test, so the stub is a pure function of the bytes.
    """
    n = len(payload)
    return (n % 1024, (n * 7) % 768, "fake/raw")


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload) → decoded metadata rows.

    Arrow delivers columnar batches; hashing/metadata stays vectorized where
    possible. One output row per input row (1:1 map; X5's 0..n flat-map shape
    is the same mechanism with multi-row emission).
    """
    import hashlib

    for pdf in it:
        payloads = pdf["payload"]
        meta = [_fake_decode(p if p is not None else b"") for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                "fake_width": [m[0] for m in meta],
                "fake_height": [m[1] for m in meta],
                "fmt": [m[2] for m in meta],
                "payload_md5": [
                    hashlib.md5(p if p is not None else b"").hexdigest()
                    for p in payloads
                ],
            }
        )


def decode_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque binary payload and run
    the decode UDF — the full multimodal column path on available data."""
    binary = docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )
    return binary.mapInPandas(decode_batches, DECODED_SCHEMA)
