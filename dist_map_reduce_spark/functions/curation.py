"""Corpus-curation operators: eval-set decontamination, stratified
sampling, and quality-percentile filtering — the selection stages of
a pretraining-data pipeline (between quality scoring and packing).

Reference parity note: the reference's surface is generic
map/shuffle/reduce (src/worker/worker.go:131-218); these are
LLM-data-pipeline extensions (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.functions.dedup_common import _SHINGLE_SQL, shingles
from dist_map_reduce_spark.registry import query

# Held-out evaluation source: anything sharing enough shingles with
# it must not be trained on.
_EVAL_SOURCE = "src0"
_CONTAM_MIN_SHINGLES = 5


@query(
    "decontaminate_against_eval",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    eval_sh AS (
      SELECT DISTINCT shingle
      FROM sh JOIN documents USING (doc_id)
      WHERE source = '{_EVAL_SOURCE}'
    ),
    train AS (
      SELECT doc_id FROM documents WHERE source <> '{_EVAL_SOURCE}'
    ),
    overlap AS (
      SELECT sh.doc_id, count(*) AS n_shared
      FROM sh JOIN eval_sh USING (shingle)
      JOIN train USING (doc_id)
      GROUP BY sh.doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(o.n_shared, 0) AS BIGINT) AS n_shared,
           coalesce(o.n_shared, 0) >= {_CONTAM_MIN_SHINGLES} AS contaminated
    FROM train t LEFT JOIN overlap o ON t.doc_id = o.doc_id
    """,
)
def decontaminate_against_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents whose
    3-gram shingle sets overlap the held-out eval source (the
    standard n-gram-overlap check run before pretraining).

    Scale design: inverted-index join — training shingles against
    the DISTINCT eval shingle set, grouped per doc. Cost scales with
    true shingle collisions, never |train| × |eval|. The eval side
    is aggregated to distinct shingles first (bounded by the eval
    corpus, typically ≪ train); no broadcast hint — AQE picks the
    strategy from its observed size."""
    docs = load_table(spark, sf_dir, "documents")
    train_docs = docs.filter(F.col("source") != _EVAL_SOURCE)
    sh_train = shingles(train_docs.select("doc_id", "text"))
    eval_sh = (
        shingles(docs.filter(F.col("source") == _EVAL_SOURCE).select("doc_id", "text"))
        .select("shingle")
        .distinct()
    )
    overlap = (
        sh_train.join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_raw"))
    )
    return (
        train_docs.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_raw", F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce("n_shared_raw", F.lit(0)) >= _CONTAM_MIN_SHINGLES).alias(
                "contaminated"
            ),
        )
    )


# Per-language keep rates (percent of [00, ff] md5 space): downsample
# the dominant language, keep the tail languages whole.
_LANG_RATES: dict[str, int] = {"en": 25, "de": 50, "fr": 50, "es": 50, "zh": 100}


def _rate_case_sql() -> str:
    arms = " ".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in _LANG_RATES.items()
    )
    return f"CASE {arms} ELSE 100 END"


@query(
    "stratified_sample_by_lang",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substring(md5('sample:' || CAST(doc_id AS STRING)), 1, 2))::BIGINT
          * 100 < ({_rate_case_sql()}) * 256
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-language rates, assigned by
    salted md5 of the doc id — deterministic and reproducible across
    runs, engines, and cluster sizes (`sample()`/`randomSplit` are
    partitioning-dependent), and consistent for a given document as
    the corpus grows. A narrow filter over the scan: no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "conv(substring(md5(cast(concat('sample:', cast(doc_id as string))"
        " as binary)), 1, 2), 16, 10)"
    ).cast("bigint")
    rate = F.expr(_rate_case_sql())
    return docs.filter(bucket * 100 < rate * 256).select("doc_id", "lang")


@query(
    "quality_percentile_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             round(len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')), 6) AS ttr
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, ttr,
             round(percent_rank() OVER (
               PARTITION BY source ORDER BY ttr, doc_id), 6) AS q
      FROM scored
    )
    SELECT doc_id, source, ttr, q FROM ranked WHERE q >= 0.2
    """,
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality filtering: drop the bottom 20% of documents
    PER SOURCE by type-token ratio — per-stratum percentiles, not a
    global threshold, so a noisy source can't crowd out a clean one.
    One window per source partition; ties broken by doc_id so the
    cut is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "source",
        F.round(
            F.size(F.array_distinct(ws)) * F.lit(1.0) / F.size(ws), 6
        ).alias("ttr"),
    )
    w = Window.partitionBy("source").orderBy("ttr", "doc_id")
    return (
        scored.withColumn("q", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("q") >= 0.2)
    )


@query(
    "text_repetition_signals",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    scalars AS (
      SELECT doc_id,
             len(ws) AS n_words,
             round(1 - len(list_distinct(ws)) * 1.0 / len(ws), 6)
               AS dup_word_frac,
             CASE WHEN len(ws) >= 3 THEN
               round(1 - len(list_distinct(
                       [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        FOR i IN generate_series(1, len(ws) - 2)])) * 1.0
                     / (len(ws) - 2), 6)
             ELSE 0.0 END AS dup_trigram_frac,
             greatest(len(ws) - 1, 0) AS n_bigrams
      FROM base
    ),
    bg AS (
      SELECT doc_id,
             unnest(CASE WHEN len(ws) >= 2 THEN
               [ws[i] || ' ' || ws[i+1]
                FOR i IN generate_series(1, len(ws) - 1)]
             ELSE [] END) AS bigram
      FROM base
    ),
    top AS (
      SELECT doc_id, max(cnt) AS top_n FROM (
        SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2
      ) GROUP BY doc_id
    )
    SELECT s.doc_id, n_words, dup_word_frac, dup_trigram_frac,
           CASE WHEN n_bigrams = 0 THEN 0.0
                ELSE round(coalesce(top_n, 0) * 1.0 / n_bigrams, 6)
           END AS top_bigram_frac
    FROM scalars s LEFT JOIN top ON s.doc_id = top.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-word fraction,
    duplicate-trigram fraction, and the count fraction of the most
    frequent bigram — the standard boilerplate/spam signals of a
    pretraining pipeline.

    Scale design: ZERO shuffle. The per-document bigram mode — which
    the oracle (and the naive plan) computes as explode + two
    aggregations — is here the maximum run length over the SORTED
    bigram array: an O(b log b) per-row expression, so the whole
    operator is a narrow projection over the corpus scan. At 100 TB
    that is the difference between a free column and a
    trillion-row shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).select(
        "doc_id",
        "ws",
        F.expr(
            "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1),"
            " i -> concat_ws(' ', ws[i - 1], ws[i]))"
            " ELSE array() END"
        ).alias("bs"),
        F.expr(
            "CASE WHEN size(ws) >= 3 THEN transform(sequence(2, size(ws) - 1),"
            " i -> concat_ws(' ', ws[i - 2], ws[i - 1], ws[i]))"
            " ELSE array() END"
        ).alias("ts"),
    )
    n_words = F.size("ws")
    n_bigrams = F.size("bs")
    n_trigrams = F.size("ts")
    # max run of equal adjacent elements in the sorted array == count
    # of the most frequent bigram, without any shuffle
    max_run = F.expr(
        "aggregate(array_sort(bs),"
        " named_struct('prev', cast('' as string), 'run', 0L, 'mx', 0L),"
        " (a, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(x = a.prev, a.run + 1, 1L),"
        "   'mx', greatest(a.mx, IF(x = a.prev, a.run + 1, 1L))),"
        " a -> a.mx)"
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            1 - F.size(F.array_distinct("ws")) * F.lit(1.0) / n_words, 6
        ).alias("dup_word_frac"),
        F.when(n_trigrams > 0,
               F.round(
                   1 - F.size(F.array_distinct("ts")) * F.lit(1.0) / n_trigrams,
                   6,
               ))
        .otherwise(0.0)
        .alias("dup_trigram_frac"),
        F.when(n_bigrams > 0, F.round(max_run * F.lit(1.0) / n_bigrams, 6))
        .otherwise(0.0)
        .alias("top_bigram_frac"),
    )


# Temperature exponent for source-mixing weights (UnifiedQA /
# multilingual-sampling style: w ∝ n^alpha flattens the source
# distribution toward uniform as alpha → 0).
_MIX_ALPHA = 0.3


@query(
    "corpus_mix_weights",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents
      GROUP BY source
    ),
    powed AS (
      SELECT source, n_docs, n_tokens,
             CAST(round(pow(n_tokens, {_MIX_ALPHA}), 12)
                  AS DECIMAL(22,12)) AS w
      FROM per_source
    ),
    tot AS (SELECT sum(w) AS tw FROM powed)
    SELECT source, n_docs, n_tokens,
           CAST(round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 8)
                AS DOUBLE) AS weight
    FROM powed, tot
    """,
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixing weights for training-batch sampling:
    w(source) ∝ n_tokens^alpha, normalized. The exact-token counts
    are integers; each pow() is a deterministic scalar IEEE op
    rounded to 12 dp; the normalizing sum accumulates those rounded
    values as DECIMAL (exact, associative) — so the weights are
    engine-independent (same discipline as money.py / pagerank).
    One tiny aggregation (one row per source) plus a 1-row
    crossJoin; the heavy part — token counting — is a map-side
    partial-aggregated scan."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    powed = per_source.withColumn(
        "w",
        F.expr(
            f"CAST(round(pow(n_tokens, {_MIX_ALPHA}), 12) AS DECIMAL(22,12))"
        ),
    )
    tot = powed.agg(F.sum("w").alias("tw"))
    return (
        powed
        # 1-row aggregate: scalar-subquery crossJoin, not a data join
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(
                "CAST(round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 8)"
                " AS DOUBLE)"
            ).alias("weight"),
        )
    )
