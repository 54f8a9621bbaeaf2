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
from dist_map_reduce_spark.functions.dedup import _SHINGLE_SQL, shingles
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
