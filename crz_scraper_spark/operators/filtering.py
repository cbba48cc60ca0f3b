"""The stage-2 contract filter chain with an auditable discard-reason column.

Faithful re-expression of `02_filter_by_CIN.py:184-298`'s `tosslevel` ladder
(taxonomy per FIXTURES.md §C):

    0  kept
    1  supplier CIN not in companies list        (02:198-203)
   -1  purchaser matches no resort name          (02:205-225)
    2  attachments empty / no https:// link      (02:228-230)
    3  price below threshold or unparseable      (02:233-243)
    4  published before threshold date/malformed (02:246-250)
    5  duplicate of an earlier-kept (name, ID)   (02:254-268)

Semantic details mirrored exactly:

- The reference's first three checks all run unconditionally, each
  OVERWRITING `tosslevel` — so a row failing CIN *and* attachments reports
  reason 2. The `when()` ladder below encodes that precedence (2, then -1,
  then 1).
- Price/date/dup checks only run when `tosslevel == 0` so far.
- **Resort early-exit quirk**: the reference's `key_count` logic
  (`02:214-225`) aborts after examining only the FIRST THREE resort columns
  — reproduced via `max_resort_keys=3` (pass None for the presumably
  intended all-keys behavior).
- **Order-dependent dedup** (SURVEY §7 Hard-1): a row is a duplicate only if
  an EARLIER row with the same (normalized name, ID) passed checks 1–4 —
  rows discarded for other reasons never enter the control list. Implemented
  as a window prefix-count over the explicit ingest index, which makes the
  reference's accumulating-list semantics deterministic and distributed.

One lazy DataFrame pass: Catalyst fuses every predicate; the two reference
lists ride along as broadcast structures; the only shuffle is the dedup
window partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crz_scraper_spark.functions.casts import try_double


def _norm_key(c: Column) -> Column:
    """Space-stripped key normalization (`02:201`: `.replace(" ","")`)."""
    return F.regexp_replace(c, " ", "")


def _norm_name(c: Column) -> Column:
    """Dedup-key name normalization (`02:263`: strip + newline→space)."""
    return F.trim(F.regexp_replace(c, "\n", " "))


def stage2_filter(
    contracts: DataFrame,
    company_cins: list[str],
    resort_names_by_key: list[list[str]],
    price_min: float = 0.0,
    date_min: str | None = None,
    max_resort_keys: int | None = 3,
    index_col: str = "ingest_idx",
) -> DataFrame:
    """Annotate every contract row with `discard_reason` (0 = kept).

    `company_cins` / `resort_names_by_key` are the small curated reference
    lists (companies.csv / resorts.csv — 2,429 rows in the reference); they
    are embedded as broadcast array literals, the Spark analog of the
    reference's in-memory Python lists.

    Callers keep rows with `discard_reason == 0` and may audit the rest —
    the reference only printed the reasons to the console.
    """
    cins = F.array(*[F.lit(c.replace(" ", "")) for c in company_cins])
    keys = resort_names_by_key
    if max_resort_keys is not None:
        keys = keys[:max_resort_keys]
    resort_names = [
        n.upper().replace(" ", "") for names in keys for n in names if n
    ]
    resorts = F.array(*[F.lit(n) for n in resort_names])

    # NULL inputs (missing CIN/name/links) must read as check-failed, not
    # unknown — coalesce every flag to False (the reference's str() coercion
    # turns missing into 'nan', which fails every membership test).
    cin_ok = F.coalesce(
        F.array_contains(cins, _norm_key(F.col("dodavatel_ico"))), F.lit(False)
    )
    purchaser = _norm_key(F.upper(F.col("objednavatel")))
    resort_ok = F.coalesce(
        F.exists(resorts, lambda n: purchaser.contains(n)), F.lit(False)
    )

    att = F.col("prilohy")
    att_ok = F.coalesce(
        att.isNotNull()
        & (F.size(att) > 0)
        & F.exists(att, lambda a: F.coalesce(a["odkaz"], F.lit("")).contains("https://")),
        F.lit(False),
    )

    price_ok = try_double(F.col("cena_konecna")) >= F.lit(price_min)
    price_ok = F.coalesce(price_ok, F.lit(False))  # gibberish → reject (02:241)

    if date_min is not None:
        d = F.to_timestamp(F.col("datum_zverejnenia"))
        date_ok = F.coalesce(d >= F.to_timestamp(F.lit(date_min)), F.lit(False))
    else:
        date_ok = F.lit(True)

    pass14 = cin_ok & resort_ok & att_ok & price_ok & date_ok

    w = (
        Window.partitionBy(_norm_name(F.col("nazov")), F.col("id"))
        .orderBy(F.col(index_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    earlier_kept = F.coalesce(
        F.sum(F.when(pass14, 1).otherwise(0)).over(w), F.lit(0)
    )
    is_dup = pass14 & (earlier_kept > 0)

    reason = (
        F.when(~att_ok, F.lit(2))
        .when(~resort_ok, F.lit(-1))
        .when(~cin_ok, F.lit(1))
        .when(~price_ok, F.lit(3))
        .when(~date_ok, F.lit(4))
        .when(is_dup, F.lit(5))
        .otherwise(F.lit(0))
    )
    return contracts.withColumn("discard_reason", reason)


def stage2_clean(filtered: DataFrame) -> DataFrame:
    """Keep survivors and apply the reference's final string normalization
    (`02:275-277`: strip + newline→space on every metadata string column)."""
    out = filtered.filter(F.col("discard_reason") == 0).drop("discard_reason")
    for c, t in out.dtypes:
        if t == "string":
            out = out.withColumn(c, _norm_name(F.col(c)))
    return out
