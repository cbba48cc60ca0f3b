"""Stage-9 profiling/classification operators (SURVEY.md §2.4 A9/A10, §2.5
O4): dictionary-based gibberish detection, header detection, numeric/price
column classification over a long-format cells table, and weighted keyword
suggestion. Dictionary membership has three fidelity tiers, all sharing the
same broadcast-semi-join plan (J7): plain wordset (`oov_profile`),
suffix-strip morphology (`morph_oov_profile`), and full Hunspell affix
expansion (`hunspell_oov_profile` — .dic/.aff expanded once at
broadcast-build time by functions/hunspell.py, the Spark-first equivalent
of the reference's per-token Hunspell handles).

Reference behavior (`09_clean_tables.py`):
- gibberish column: spellcheck each cell's words; drop column when
  wrong/(wrong+correct) > 0.75 (09:195-215).
- header row: first row is the header iff its cells hit > 2 keywords
  (09:222-241).
- price/position columns: digit-bearing-row ratio > 0.75 (09:288-301).
- suggested keywords: header words of accepted columns accumulate the
  column's hit ratio as a score (09:310-324).
- spellcheck handles: `05_build_special_dictionary.py:42-50`,
  `09_clean_tables.py:83-91` (Dicts/sk_SK + Dicts/en_US Hunspell pairs).

Spark design: everything is a groupBy over a long format (table_id, col,
row_no, cell) — the reference's per-file pandas loops become one shuffle per
profile; the dictionary is a broadcast semi-join (J7) instead of per-cell
Hunspell calls (morphological affix fidelity would need real Hunspell
handles inside a pandas UDF — SURVEY §7 Hard-3; the wordset approximation
is used here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crz_scraper_spark.functions.text import tokens_nonempty


def oov_profile(
    docs: DataFrame,
    dictionary: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gibberish_threshold: float = 0.75,
) -> DataFrame:
    """Per-document out-of-vocabulary ratio + gibberish flag (A9+J7).

    `dictionary` is a (word) DataFrame (e.g. the corpus words with count > 5,
    the stage-5a special dictionary `05_build_special_dictionary.py:136-141`).
    Tokens left-join the broadcast dictionary; OOV ratio =
    unmatched / total, gibberish iff ratio > threshold (`09:211`).
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens_nonempty(text_col)).alias("word")
    )
    dic = dictionary.select(
        F.col(dictionary.columns[0]).alias("word"), F.lit(1).alias("__in_dict")
    ).distinct()
    joined = toks.join(F.broadcast(dic), "word", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(F.col("__in_dict").isNull(), 1)).alias("n_oov"),
        )
        .withColumn(
            "oov_ratio", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
        .withColumn(
            "is_gibberish", (F.col("oov_ratio") > gibberish_threshold).cast("int")
        )
    )


def oov_profile_counts(
    doc_word_counts: DataFrame,
    dictionary: DataFrame,
    id_col: str = "doc_id",
    count_col: str = "n",
    gibberish_threshold: float = 0.75,
) -> DataFrame:
    """oov_profile over a pre-aggregated per-(doc, word) count table — the
    shared-scan tier for callers whose dictionary ALSO derives from the
    corpus (dictionary_oov): tokenizing once into (id, word, n) and rolling
    both the dictionary and the profile off that table replaces a second
    full tokenize+explode pass with a shuffle of the far smaller count
    table. Same rows as oov_profile by the count identity
    Σ_word n = token count and Σ_{OOV word} n = OOV token count."""
    dic = dictionary.select(
        F.col(dictionary.columns[0]).alias("word"), F.lit(1).alias("__in_dict")
    ).distinct()
    joined = doc_word_counts.join(F.broadcast(dic), "word", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum(count_col).alias("n_tokens"),
            F.coalesce(
                F.sum(
                    F.when(F.col("__in_dict").isNull(), F.col(count_col))
                ),
                F.lit(0),
            ).alias("n_oov"),
        )
        .withColumn(
            "oov_ratio", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
        .withColumn(
            "is_gibberish", (F.col("oov_ratio") > gibberish_threshold).cast("int")
        )
    )


def hunspell_oov_profile(
    docs: DataFrame,
    dic_path: str,
    aff_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    gibberish_threshold: float = 0.75,
) -> DataFrame:
    """Full-fidelity X6: expand the real .dic/.aff pair once (driver-side,
    dictionary-sized work) into the accepted-surface-form set, then run the
    identical broadcast-semi-join membership plan as `oov_profile`. The
    corpus-side cost is unchanged at any scale; only the broadcast payload
    grows (~10x the stem count)."""
    from crz_scraper_spark.functions.hunspell import hunspell_dictionary_df

    dictionary = hunspell_dictionary_df(docs.sparkSession, dic_path, aff_path)
    return oov_profile(
        docs,
        dictionary,
        id_col=id_col,
        text_col=text_col,
        gibberish_threshold=gibberish_threshold,
    )


# Hunspell-style affix approximation (SURVEY §7 Hard-3): a token is
# in-vocabulary if it OR a suffix-stripped stem is in the dictionary. Real
# Hunspell handles (per-executor, inside a pandas UDF) are the full-fidelity
# path when the library is present; this suffix tier captures the common
# inflections with pure relational operators — and is therefore oracleable.
MORPH_SUFFIXES = ["s", "es", "ed", "ing"]
MORPH_MIN_STEM = 3


def _morph_accepted_vocab(vocab: DataFrame, dictionary: DataFrame) -> DataFrame:
    """The accepted-word set shared by both morph tiers (ADVICE r10 — the
    two copies could drift): each VOCABULARY word (not each occurrence —
    the vocab is corpus-log sized) explodes to ≤ len(MORPH_SUFFIXES)+1
    stem candidates, semi-joins the broadcast dictionary, and the accepted
    words come back as a broadcastable (word, __ok=1) frame."""
    dic = dictionary.select(
        F.col(dictionary.columns[0]).alias("dword")
    ).distinct()
    stem_cols = [F.col("word")]
    for suf in MORPH_SUFFIXES:
        stem = F.expr(
            f"CASE WHEN word LIKE '%{suf}' AND"
            f" length(word) - {len(suf)} >= {MORPH_MIN_STEM}"
            f" THEN substring(word, 1, length(word) - {len(suf)}) END"
        )
        stem_cols.append(stem)
    cand = vocab.select(
        "word",
        F.explode(
            F.filter(F.array(*stem_cols), lambda s: s.isNotNull())
        ).alias("stem"),
    )
    return (
        cand.join(F.broadcast(dic), cand.stem == dic.dword, "left_semi")
        .select("word")
        .distinct()
        .withColumn("__ok", F.lit(1))
    )


def morph_oov_profile(
    docs: DataFrame,
    dictionary: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gibberish_threshold: float = 0.75,
) -> DataFrame:
    """oov_profile with suffix-stripping morphology: the candidate-stem set
    of each VOCABULARY word (not each occurrence — the vocab is corpus-log
    sized) explodes to ≤ len(MORPH_SUFFIXES)+1 stems, semi-joins the
    broadcast dictionary, and the accepted vocabulary broadcasts back onto
    the token stream. Two broadcast joins, one corpus shuffle (the per-doc
    aggregate) — same plan class as oov_profile."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_nonempty(text_col)).alias("word")
    )
    accepted = _morph_accepted_vocab(toks.select("word").distinct(), dictionary)
    joined = toks.join(F.broadcast(accepted), "word", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(F.col("__ok").isNull(), 1)).alias("n_oov"),
        )
        .withColumn(
            "oov_ratio", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
        .withColumn(
            "is_gibberish", (F.col("oov_ratio") > gibberish_threshold).cast("int")
        )
    )


def morph_oov_profile_counts(
    doc_word_counts: DataFrame,
    dictionary: DataFrame,
    id_col: str = "doc_id",
    count_col: str = "n",
    gibberish_threshold: float = 0.75,
) -> DataFrame:
    """morph_oov_profile over a pre-aggregated per-(doc, word) count table
    — the shared-scan tier (see oov_profile_counts): the vocabulary, the
    stem candidates, and the per-doc profile all roll off one tokenize
    pass. Same rows by the same count identities; the stem/accept logic is
    generated from the identical MORPH_SUFFIXES arms."""
    accepted = _morph_accepted_vocab(
        doc_word_counts.select("word").distinct(), dictionary
    )
    joined = doc_word_counts.join(F.broadcast(accepted), "word", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum(count_col).alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("__ok").isNull(), F.col(count_col))),
                F.lit(0),
            ).alias("n_oov"),
        )
        .withColumn(
            "oov_ratio", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
        .withColumn(
            "is_gibberish", (F.col("oov_ratio") > gibberish_threshold).cast("int")
        )
    )


def classify_columns(
    cells: DataFrame,
    keywords: list[str],
    numeric_threshold: float = 0.75,
    header_threshold: int = 2,
) -> DataFrame:
    """Per (table_id, col): empty ratio, digit-row ratio, keyword hits in the
    header cell, and the resulting classification flags (09:180-301).

    `cells` is long-format (table_id, col, row_no, cell); row_no 0 is the
    candidate header row.
    """
    kws = F.array(*[F.lit(k.lower()) for k in keywords])
    body = F.col("row_no") > 0
    cell = F.col("cell")
    return (
        cells.groupBy("table_id", "col")
        .agg(
            F.count(F.when(body, 1)).alias("n_rows"),
            F.count(
                F.when(body & (F.coalesce(F.trim(cell), F.lit("")) == ""), 1)
            ).alias("n_empty"),
            F.count(F.when(body & cell.rlike(r"\d"), 1)).alias("n_digit"),
            F.sum(
                F.when(
                    F.col("row_no") == 0,
                    F.size(
                        F.filter(
                            kws, lambda k: F.lower(F.coalesce(cell, F.lit(""))).contains(k)
                        )
                    ),
                ).otherwise(0)
            ).alias("header_kw_hits"),
        )
        .withColumn(
            "empty_ratio",
            F.round(F.col("n_empty") / F.greatest(F.col("n_rows"), F.lit(1)), 6),
        )
        .withColumn(
            "digit_ratio",
            F.round(F.col("n_digit") / F.greatest(F.col("n_rows"), F.lit(1)), 6),
        )
        .withColumn("is_empty_col", (F.col("empty_ratio") >= 1.0).cast("int"))
        .withColumn(
            "is_numeric_col", (F.col("digit_ratio") > numeric_threshold).cast("int")
        )
        .withColumn(
            "is_header_match", (F.col("header_kw_hits") > header_threshold).cast("int")
        )
    )


def best_column_per_table(
    classified: DataFrame, score_col: str = "digit_ratio"
) -> DataFrame:
    """O4: top-1 column per table by ratio (09:263-264,309) — deterministic
    tie-break on column name."""
    w = Window.partitionBy("table_id").orderBy(F.desc(score_col), F.asc("col"))
    return (
        classified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def suggest_keywords(
    cells: DataFrame, classified: DataFrame, score_col: str = "digit_ratio"
) -> DataFrame:
    """A10: header words of qualifying columns accumulate the column score
    (09:310-324) — explode(header words) + groupBy(word) sum(weight)."""
    headers = cells.filter(F.col("row_no") == 0).select(
        "table_id", "col", F.col("cell").alias("header")
    )
    scored = headers.join(
        classified.select("table_id", "col", score_col), ["table_id", "col"]
    )
    return (
        scored.select(
            F.explode(tokens_nonempty("header")).alias("word"),
            F.col(score_col).alias("weight"),
        )
        .groupBy("word")
        .agg(F.round(F.sum("weight"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("word"))
    )
