"""XML contract-dump source (operators S1/S2).

Reference behavior: `01_parse_xml.py:14,69-77` parses each daily dump with
lxml `recover=True`, iterates `<contract>` elements, and copies unparseable
files to `Corrupted_XML_files/` (`01_parse_xml.py:18-21,197-200`); fields are
then extracted by hard-coded positional index into a recursively flattened
node list (`01_parse_xml.py:87-116`).

Spark design: the native XML source (Spark 4) with `rowTag` gives a typed
nested row per contract — positional extraction becomes schema-on-read; the
PERMISSIVE + corrupt-record column replaces the corrupted-files directory
(route rows where `_corrupt_record IS NOT NULL` to a quarantine sink instead
of copying whole files). At 100 TB the dump set is thousands of daily files:
one distributed scan, no per-file Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# Typed contract schema mirroring the 22-column table of
# `01_parse_xml.py:202-203` (FIXTURES.md B1) — real types instead of
# all-strings: timestamps for the 5 dates, long sizes, nested attachments.
ATTACHMENT_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("att_id", T.StringType()),
            T.StructField("nazov", T.StringType()),
            T.StructField("subor", T.StringType()),
            T.StructField("velkost", T.LongType()),
            T.StructField("odkaz", T.StringType()),
            T.StructField("datum", T.StringType()),
        ]
    )
)

# Supplements are DOUBLY nested: each dodatok carries its own attachments
# array (`03_download_contracts.py:640-653` re-parses the inner list literal
# per supplement) — here it's just a nested ArrayType(Struct) level.
SUPPLEMENT_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("dod_id", T.StringType()),
            T.StructField("nazov", T.StringType()),
            T.StructField("cena", T.StringType()),
            T.StructField("datum", T.StringType()),
            T.StructField(
                "prilohy", T.StructType([T.StructField("priloha", ATTACHMENT_TYPE)])
            ),
        ]
    )
)

CONTRACT_SCHEMA = T.StructType(
    [
        T.StructField("nazov", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("inner_id", T.StringType()),
        T.StructField("objednavatel_ico", T.StringType()),
        T.StructField("objednavatel", T.StringType()),
        T.StructField("objednavatel_adresa", T.StringType()),
        T.StructField("dodavatel_ico", T.StringType()),
        T.StructField("dodavatel", T.StringType()),
        T.StructField("dodavatel_adresa", T.StringType()),
        T.StructField("datum_zverejnenia", T.StringType()),
        T.StructField("datum_podpisu", T.StringType()),
        T.StructField("datum_platnosti", T.StringType()),
        T.StructField("datum_ucinnosti", T.StringType()),
        T.StructField("posledna_zmena", T.StringType()),
        T.StructField("cena_konecna", T.StringType()),
        T.StructField("cena_podpisana", T.StringType()),
        T.StructField("rezort", T.StringType()),
        T.StructField("typ", T.StringType()),
        T.StructField("stav", T.StringType()),
        T.StructField(
            "prilohy", T.StructType([T.StructField("priloha", ATTACHMENT_TYPE)])
        ),
        T.StructField(
            "dodatky", T.StructType([T.StructField("dodatok", SUPPLEMENT_TYPE)])
        ),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_contracts_xml(
    spark: SparkSession, path: str, row_tag: str = "contract"
) -> DataFrame:
    """Permissive XML scan: one row per `<contract>`, corrupt rows captured
    in `_corrupt_record` (S2) rather than aborting the scan (the Spark
    equivalent of lxml `recover=True` + the corrupted-files directory)."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(CONTRACT_SCHEMA)
        .load(path)
    )


def stream_contracts_xml(
    spark: SparkSession, dir_path: str, row_tag: str = "contract"
) -> DataFrame:
    """Streaming form of the dump source: the daily-dump drop directory
    consumed as a Structured Streaming file source (the engine's
    incremental model for `00_download_CRZ_DB.py:179-220`'s re-run-for-new-
    dates loop — each day's dump file is one new micro-batch; checkpointing
    makes re-runs exactly-once instead of the reference's manual date
    bookkeeping). Same schema, permissive mode, and corrupt-record routing
    as the batch reader; downstream stage-2 filters compose unchanged since
    they are stateless row operations."""
    return (
        spark.readStream.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(CONTRACT_SCHEMA)
        .load(dir_path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) — route bad records like `Corrupted_XML_files/`.

    Spark forbids corrupt-record-only queries against raw file sources
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache the parsed
    result first, as the error message itself prescribes. In a pipeline the
    parsed batch would be persisted to Parquet at this point anyway.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, corrupt


def flatten_contracts(df: DataFrame) -> DataFrame:
    """Unwrap the XML nesting into the flat 22-column contracts table
    (P1 positional projection, done by name instead of node index) with a
    stable ingest index for order-dependent dedup (SURVEY §7 Hard-1 ≈
    `01_parse_xml.py:191-195`'s total_index)."""
    return (
        df.withColumn("prilohy", F.col("prilohy.priloha"))
        # Unwrap the inner per-supplement attachment wrapper too: dodatky
        # becomes array<struct<..., prilohy: array<struct>>> — the doubly
        # nested form `explode(dodatky)` + `explode(prilohy)` consumes.
        .withColumn(
            "dodatky",
            F.transform(
                F.col("dodatky.dodatok"),
                lambda d: d.withField("prilohy", d["prilohy"]["priloha"]),
            ),
        )
        .withColumn("ingest_idx", F.monotonically_increasing_id())
    )
