"""Training-data curation operators beyond the reference (BASELINE.json's
large-scale-pipeline mandate): PII redaction, repetition-based quality
signals (Gopher-style), deterministic stratified sampling, and eval-set
n-gram decontamination.

The reference's closest analogues are its keyword tagging / quality
thresholds (`04_tag_text_contracts.py:98-212`, `09_clean_tables.py:180-215`);
these plans generalize that "score every document, filter on the score"
pattern to the signals a 100 TB LLM-pretraining pipeline actually computes.

All four are fully oracle-checked: the only nondeterminism risks are float
division (rounded to 6 both sides; IEEE division of identical doubles is
exact) and hash choice (md5, portable to DuckDB — same idiom as
`train_test_split`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crz_scraper_spark.catalog import fan_out, load_table, pin

_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), ' +'), w -> w <> '')"
_TOKS_SPARK = "filter(split(lower(text), ' +'), w -> w <> '')"

# ---------------------------------------------------------------------------
# pii_redact — regex PII scrubbing. The synthetic corpus contains no PII, so
# a deterministic contact string derived from doc_id is appended first (both
# engines synthesize the identical augmentation); the operator under test is
# the redact-and-count: global regexp_replace + regexp_count for emails and
# phone numbers. Embarrassingly parallel — no shuffle, scales linearly; at
# 100 TB this runs as a map-only stage fused into the scan.
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+\d{3}-\d{8}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +421-"),
        F.lpad((F.col("doc_id") % 100000000).cast("string"), 8, "0"),
        F.lit("."),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).alias("redacted_len"),
    )


PII_REDACT_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact: user' || doc_id::VARCHAR || '@example.com or +421-'
              || lpad((doc_id % 100000000)::VARCHAR, 8, '0') || '.' AS a
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(a, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(a, '{_PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(a, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5,
       len(regexp_replace(regexp_replace(a, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_len
FROM aug
"""

# ---------------------------------------------------------------------------
# repetition_stats — Gopher-style repetition quality signals per document:
# distinct-token ratio, most-frequent-token fraction, duplicate-bigram
# fraction. The per-word counts go explode → two-level hash agg (partial
# combine on (doc, word) keeps the shuffle narrow); the bigram part stays
# array-side (higher-order functions, no explode). Low-quality docs are the
# ones with high top_word_frac / dup_bigram_frac — the downstream filter is
# a plain predicate on this output.
# ---------------------------------------------------------------------------


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.expr(_TOKS_SPARK).alias("toks")
    )
    word_counts = (
        docs.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .count()
    )
    word_stats = word_counts.groupBy("doc_id").agg(
        F.sum("count").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("count").alias("top_word_n"),
    )
    # Spark's sequence(1, n) is bidirectional (n = -1 yields [1, 0, -1]),
    # so short docs need an explicit guard; DuckDB's generate_series is
    # empty when stop < start and needs none.
    bigram_stats = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(toks) >= 2 THEN"
            "  transform(sequence(1, size(toks) - 1),"
            "            i -> concat(element_at(toks, i), ' ',"
            "                        element_at(toks, i + 1)))"
            " ELSE array() END"
        ).alias("bg"),
    ).select(
        "doc_id",
        F.size("bg").alias("n_bigrams"),
        F.size(F.array_distinct("bg")).alias("n_bigrams_distinct"),
    )
    return (
        word_stats.join(bigram_stats, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "distinct_ratio"
            ),
            F.round(F.col("top_word_n") / F.col("n_tokens"), 6).alias(
                "top_word_frac"
            ),
            F.when(F.col("n_bigrams") > 0,
                   F.round(1 - F.col("n_bigrams_distinct") / F.col("n_bigrams"), 6))
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_frac"),
        )
    )


REPETITION_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
word_stats AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
         max(cnt) AS top_word_n
  FROM (
    SELECT doc_id, w, count(*) AS cnt
    FROM toks, unnest(t) AS u(w)
    GROUP BY doc_id, w
  )
  GROUP BY doc_id
),
bigram_stats AS (
  SELECT doc_id,
         len(bg) AS n_bigrams,
         len(list_distinct(bg)) AS n_bigrams_distinct
  FROM (
    SELECT doc_id,
           list_transform(generate_series(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i + 1]) AS bg
    FROM toks
  )
)
SELECT w.doc_id, w.n_tokens,
       round(w.n_distinct / CAST(w.n_tokens AS DOUBLE), 6) AS distinct_ratio,
       round(w.top_word_n / CAST(w.n_tokens AS DOUBLE), 6) AS top_word_frac,
       CASE WHEN b.n_bigrams > 0
            THEN round(1 - b.n_bigrams_distinct / CAST(b.n_bigrams AS DOUBLE), 6)
            ELSE 0.0 END AS dup_bigram_frac
FROM word_stats w JOIN bigram_stats b USING (doc_id)
"""

# ---------------------------------------------------------------------------
# stratified_sample — deterministic per-stratum downsampling: each language
# keeps a configured percentage, decided per row by an md5 bucket of the
# doc_id under a sampling-specific salt (independent of the train/test
# split's hash). Shuffle-free sampling; the reported per-stratum totals are
# one hash aggregate. The 100 TB posture: sampling decisions must be
# reproducible row-local expressions, never rand() — re-runs and spills
# can't change membership.
# ---------------------------------------------------------------------------

_STRATA_RATES = {"en": 50, "de": 20, "fr": 20, "zh": 10, "sk": 10}
_DEFAULT_RATE = 20


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    keep = (bucket < rate).cast("int")
    return (
        docs.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_sampled"),
        )
    )


_RATE_CASE_SQL = " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in _STRATA_RATES.items()
)

STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 15))::BIGINT % 100
                     < (CASE {_RATE_CASE_SQL} ELSE {_DEFAULT_RATE} END)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM documents
GROUP BY lang
"""

# ---------------------------------------------------------------------------
# eval_contamination — benchmark decontamination: which training documents
# share at least one word-level n-gram with a held-out eval document
# (eval set := doc_id % 97 == 0)? n = 4 here so the synthetic word-soup
# corpus yields a nonzero answer at the driver's sf0.01 gate; real
# decontamination uses 8-13 (the n is one constant). Both sides explode their 8-gram sets,
# meet in a shuffle hash join keyed on the n-gram string, and the distinct
# shared-gram count per (train, eval) pair comes from one aggregate. This
# is the standard exact-substring decontamination pipeline; at 100 TB the
# join key should be the n-gram's 64-bit hash (xxhash64) instead of the
# string — same plan, 10× narrower shuffle — and hot n-grams (boilerplate)
# get frequency-capped before the join.
# ---------------------------------------------------------------------------

_NGRAM_N = 4


def eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _NGRAM_N
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.expr(_TOKS_SPARK).alias("toks")
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {n} THEN"
                f"  array_distinct(transform(sequence(1, size(toks) - {n - 1}),"
                f"            i -> concat_ws(' ', slice(toks, i, {n}))))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )
    is_eval = F.col("doc_id") % 97 == 0
    eval_grams = grams.filter(is_eval).withColumnRenamed("doc_id", "eval_doc")
    train_grams = grams.filter(~is_eval).withColumnRenamed("doc_id", "train_doc")
    return (
        train_grams.join(eval_grams, "gram")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_shared_grams"))
    )


EVAL_CONTAMINATION_SQL = f"""
WITH grams AS (
  SELECT doc_id, g AS gram
  FROM (
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(1, len(t) - {_NGRAM_N - 1}),
               i -> array_to_string(t[i:i + {_NGRAM_N - 1}], ' '))) AS gs
    FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
    WHERE len(t) >= {_NGRAM_N}
  ), unnest(gs) AS u(g)
)
SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
       count(*) AS n_shared_grams
FROM grams t
JOIN grams e ON t.gram = e.gram
WHERE e.doc_id % 97 = 0 AND t.doc_id % 97 <> 0
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# per_class_sample — deterministic K-per-group sampling: rank rows inside
# each (lang) stratum by a salted md5 of the key and keep the first K —
# "give me N examples per class" with membership that survives re-runs,
# task retries, and spills (rand() would not). One shuffle on the group
# key; the hash ranking compiles to the same WindowGroupLimit map-side
# top-K as first_wins_dedup.
# ---------------------------------------------------------------------------

_SAMPLE_PER_CLASS = 20


def per_class_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("pcs:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", "lang", h.alias("h"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SAMPLE_PER_CLASS)
        .select("lang", "doc_id", "rnk")
    )


PER_CLASS_SAMPLE_SQL = f"""
SELECT lang, doc_id, rnk FROM (
  SELECT lang, doc_id,
         row_number() OVER (
             PARTITION BY lang
             ORDER BY md5('pcs:' || doc_id::VARCHAR), doc_id) AS rnk
  FROM documents
)
WHERE rnk <= {_SAMPLE_PER_CLASS}
"""


# ---------------------------------------------------------------------------
# weighted_sample — deterministic weighted sampling WITHOUT replacement
# (Efraimidis-Spirakis A-ES): each row draws u ~ Uniform(0,1) from a SEEDED
# md5 of its key (reproducible across runs/retries/partitionings — rand()
# is none of those), gets key = -ln(u)/w with w = the row's weight
# (n_chars: longer docs proportionally likelier), and the global top-K
# smallest keys are the sample. This is how "sample 10k docs proportional
# to quality" runs at 100 TB: one scan + one bounded top-K — the
# rank-then-filter shape compiles to TakeOrderedAndProject(limit=K)
# (Spark's LimitPushDownThroughWindow + InsertWindowGroupLimit rewrite:
# per-partition bounded heap, no corpus-wide sort, no single-partition
# WindowExec; only K survivors per partition travel), and the row_number
# window then runs over just the K winners. The physical shape is pinned
# by tests/test_scale_layout.py::test_global_topk_plans_are_bounded — do
# NOT "help" with a manual per-partition pre-prune: it hides the filter
# from the rewrite and regresses to a real shuffle + WindowExec. The
# exponential key is computed from exact integer hashes ⇒ identical
# doubles on both engines; ranking uses the rounded key (cosine-top-k
# discipline).
# ---------------------------------------------------------------------------

_WSAMPLE_K = 100


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**60))  # (0, 1]: 15 hex chars < 2^60, +1 avoids ln(0)
    key = F.round(-F.log(u) / F.col("n_chars"), 12)
    w = Window.orderBy(F.asc("es_key"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "n_chars", key.alias("es_key"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _WSAMPLE_K)
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         round(-ln((('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 15))::BIGINT
                    ::DOUBLE + 1.0) / {float(2**60)}) / n_chars, 12) AS es_key
  FROM documents
)
SELECT doc_id, n_chars, es_key,
       row_number() OVER (ORDER BY es_key, doc_id) AS rnk
FROM keyed
QUALIFY rnk <= {_WSAMPLE_K}
"""



# ---------------------------------------------------------------------------
# epoch_shuffle — deterministic global training-order shuffle: every epoch
# reshuffles the corpus by ordering docs on md5(epoch-salt + doc_id), and
# the order is materialized as (epoch, shard, pos) — the layout a data
# loader consumes (each of S shards is one worker's read stream, consumed
# in pos order). rand() never appears: membership and order are pure
# row-local hash arithmetic, so retries/spills/re-runs reproduce the exact
# byte order (the same discipline as stratified_sample/train_test_split).
#
# 100 TB posture: NO global sort/window — the shard id is a uniform hash
# bucket (map-side), and the intra-shard position is a row_number windowed
# PER SHARD, so the sort parallelizes S ways (S scales with the worker
# count; writing shard as the partition column makes each worker's stream
# one contiguous parquet read). This is the two-phase discipline of
# sequence_packing applied to epoch ordering.
# ---------------------------------------------------------------------------

_SHUF_EPOCHS = 2
_SHUF_SHARDS = 8


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    epochs = spark.range(_SHUF_EPOCHS).select(
        F.col("id").cast("int").alias("epoch")
    )
    key = F.md5(
        F.concat(
            F.lit("shuf"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    shard = (
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint")
        % _SHUF_SHARDS
    ).cast("int")
    w = Window.partitionBy("epoch", "shard").orderBy("sort_key", "doc_id")
    return (
        docs.select("doc_id")
        .crossJoin(F.broadcast(epochs))
        .select(
            "epoch",
            "doc_id",
            shard.alias("shard"),
            key.alias("sort_key"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("epoch", "shard", "pos", "doc_id")
    )


EPOCH_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT e.epoch, d.doc_id,
         md5('shuf' || e.epoch::VARCHAR || ':' || d.doc_id::VARCHAR) AS k
  FROM documents d
  CROSS JOIN unnest(generate_series(0, {_SHUF_EPOCHS - 1})) AS e(epoch)
)
SELECT CAST(epoch AS INT) AS epoch,
       CAST(('0x' || substr(k, 1, 15))::BIGINT % {_SHUF_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY epoch, ('0x' || substr(k, 1, 15))::BIGINT % {_SHUF_SHARDS}
           ORDER BY k, doc_id) AS BIGINT) AS pos,
       doc_id
FROM keyed
"""



# ---------------------------------------------------------------------------
# bloom_decontaminate — the 100 TB decontamination path: eval_contamination's
# exact join shuffles the corpus n-gram stream; here the eval grams (the
# SMALL side — benchmark sets are MBs) build a broadcast Bloom bitset, the
# corpus gram stream is prefiltered MAP-SIDE (no corpus shuffle), and the
# surviving candidates (true matches + fp-rate false positives) are
# verified with an exact broadcast join. No false negatives by
# construction, false positives removed by the verify join ⇒ the composed
# result EQUALS the exact join and stays fully oracled — the oracle SQL is
# the plain exact formulation, bloom-free.
# ---------------------------------------------------------------------------


def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crz_scraper_spark.operators.bloom import (
        build_bloom_from_hashes,
        might_contain_hash_udf,
    )

    n = _NGRAM_N
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.expr(_TOKS_SPARK).alias("toks")
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {n} THEN"
                f"  array_distinct(transform(sequence(1, size(toks) - {n - 1}),"
                f"            i -> concat_ws(' ', slice(toks, i, {n}))))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )
    is_eval = F.col("doc_id") % 97 == 0
    # The eval side is bounded (benchmark-sized): ONE pass over the eval
    # docs only (the doc_id filter pushes below the explode to the scan)
    # collects its distinct grams driver-side — index-metadata work, same
    # rationale as the IVF trainer sample. Both the bitset AND the exact
    # verify side derive from that list, so the big corpus is scanned
    # exactly once (probe pass) and is never cached — at 100 TB there is
    # nothing here that grows with the corpus except the one map-only scan.
    # One collect fetches both the gram strings (verify side) and their
    # JVM xxhash64 (bitset build) — a single small Spark job.
    eval_rows = (
        grams.filter(is_eval)
        .select("gram")
        .distinct()
        .select("gram", F.xxhash64("gram").alias("gh"))
        .collect()
    )
    # The bloom is keyed on xxhash64(gram): the JVM computes the hash in
    # codegen (8-byte longs through Arrow, not gram strings — measured ~10×
    # cheaper probe at sf0.1); same family on build and probe ⇒ still no
    # false negatives. coalesce keeps the column non-nullable — the probe
    # refuses the float64 batches a nullable long would become.
    eval_grams = spark.createDataFrame(
        [(r["gram"],) for r in eval_rows], "gram string"
    )
    bloom = build_bloom_from_hashes([r["gh"] for r in eval_rows])
    probe = might_contain_hash_udf(spark, bloom)
    candidates = grams.filter(~is_eval).filter(
        probe(F.coalesce(F.xxhash64(F.col("gram")), F.lit(0)))
    )
    return (
        candidates.join(F.broadcast(eval_grams), "gram")
        .groupBy(F.col("doc_id").alias("train_doc"))
        .agg(F.count("*").alias("n_shared_grams"))
    )


BLOOM_DECONTAMINATE_SQL = f"""
WITH grams AS (
  SELECT doc_id, g AS gram
  FROM (
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(1, len(t) - {_NGRAM_N - 1}),
               i -> array_to_string(t[i:i + {_NGRAM_N - 1}], ' '))) AS gs
    FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
    WHERE len(t) >= {_NGRAM_N}
  ), unnest(gs) AS u(g)
),
eval_g AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
SELECT t.doc_id AS train_doc, CAST(count(*) AS BIGINT) AS n_shared_grams
FROM grams t JOIN eval_g e ON t.gram = e.gram
WHERE t.doc_id % 97 <> 0
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# token_budget_sample — fixed token budget per source: walk each source's
# documents in a deterministic hash order and keep the prefix whose
# cumulative token count fits the budget. This is how pretraining mixtures
# cap over-represented sources (a fixed budget per domain regardless of how
# much of it was crawled) — the output is budget-bounded however large the
# corpus grows. The oracle is the plain per-source cumulative window; the
# Spark plan computes the SAME cumulative sum with the two-phase prefix sum
# (`sequence_packing`'s pattern): a per-source ordered window would funnel
# each source's entire slice through ONE task (sources are few and huge at
# 100 TB), so phase 1 runs hash-block-partitioned intra-block sums in
# parallel and phase 2 offsets them with one tiny per-(source, block) frame.
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 800
# 64 hash-ordered blocks: md5 prefix is 60 bits, so DIV 2^54 yields block
# ids 0..63 that sort identically to the hash itself.
_BUDGET_BLOCK_SPAN = 1 << 54


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h")
    )
    t = docs.select(
        "source",
        "doc_id",
        F.size(F.expr(_TOKS_SPARK)).cast("bigint").alias("n_tok"),
        h,
    ).withColumn("block", F.expr(f"h DIV {_BUDGET_BLOCK_SPAN}"))
    intra_w = (
        Window.partitionBy("source", "block")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Eager checkpoint pins ONE tokenize pass (the sequence_packing fix):
    # the per-block totals branch otherwise re-planned its partial
    # aggregate below its own exchange, re-running the tokenizer scan.
    # Checkpointed rows are 5 scalars/doc; totals = the same sums over the
    # same rows, read off the windowed frame.
    t = pin(t.withColumn("intra", F.sum("n_tok").over(intra_w)))
    totals = t.groupBy("source", "block").agg(
        F.sum("n_tok").alias("block_tot")
    )
    off_w = (
        Window.partitionBy("source")
        .orderBy("block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "source",
        "block",
        F.coalesce(F.sum("block_tot").over(off_w), F.lit(0)).alias("offset"),
    )
    cum = t.join(F.broadcast(offsets), ["source", "block"]).select(
        "source", "n_tok", (F.col("offset") + F.col("intra")).alias("cum")
    )
    return (
        cum.filter(F.col("cum") <= _BUDGET_TOKENS)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("n_tok").alias("tokens_kept"),
            F.max("cum").alias("budget_used"),
        )
        .orderBy("source")
    )


TOKEN_BUDGET_SAMPLE_SQL = f"""
WITH t AS (
  SELECT source, doc_id,
         len({_TOKS_SQL}) AS n_tok,
         ('0x' || substr(md5('budget:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM documents
),
c AS (
  SELECT source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source,
       count(*) AS n_docs_kept,
       CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
       CAST(max(cum) AS BIGINT) AS budget_used
FROM c
WHERE cum <= {_BUDGET_TOKENS}
GROUP BY source
ORDER BY source
"""


QUERIES: dict = {
    "weighted_sample": (weighted_sample, WEIGHTED_SAMPLE_SQL),
    "token_budget_sample": (token_budget_sample, TOKEN_BUDGET_SAMPLE_SQL),
    "pii_redact": (pii_redact, PII_REDACT_SQL),
    "per_class_sample": (per_class_sample, PER_CLASS_SAMPLE_SQL),
    "repetition_stats": (repetition_stats, REPETITION_STATS_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
    "eval_contamination": (eval_contamination, EVAL_CONTAMINATION_SQL),
    "epoch_shuffle": (epoch_shuffle, EPOCH_SHUFFLE_SQL),
    "bloom_decontaminate": (bloom_decontaminate, BLOOM_DECONTAMINATE_SQL),
}
