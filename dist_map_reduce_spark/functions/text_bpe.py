"""BPE-style pre-tokenization counts over the documents table.

``text_token_counts`` (functions/text.py) counts whitespace and
ASCII-class tokens; this module adds the real thing a training-data
pipeline meters cost with: a GPT-2-style pre-tokenizer split —
contraction suffixes, space-bound letter runs, digit runs, and
punctuation runs, Unicode-aware via ``\\p{L}``/``\\p{N}`` classes.

The pattern is deliberately restricted to syntax with IDENTICAL
semantics in Java regex (Spark, executors) and RE2 (DuckDB oracle):
no lookahead (RE2 has none — the original GPT-2 pattern's
``\\s+(?!\\S)`` arm is the one thing dropped), alternation is
leftmost-first in both engines, and both implement the Unicode
general categories. One JVM-side projection — ``regexp_extract_all``
inside whole-stage codegen, no UDF — so at 100 TB this is a pure
map over the corpus scan with column pruning to (doc_id, text).

Reference parity: the reference's only tokenizer is a non-letter
split (src/worker/worker.go:270-288, FieldsFunc); sub-word-aware
pre-tokenization is engine extension surface (BASELINE.json north
star: token counting with a BPE-ish regex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

# GPT-2-ish pre-tokenizer, RE2-safe subset (no lookahead):
#   contraction suffixes | space?+letters | space?+digits |
#   space?+punctuation-run | whitespace-run
PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)

_SQL_PATTERN = PRETOKEN_PATTERN.replace("'", "''")


@query(
    "text_bpe_pretoken_counts",
    oracle=f"""
    SELECT doc_id,
           len(toks)                                          AS n_pretokens,
           len(list_distinct(toks))                           AS n_unique,
           list_max(list_transform(toks, t -> len(t)))        AS max_token_len
    FROM (
      SELECT doc_id,
             regexp_extract_all(text, '{_SQL_PATTERN}') AS toks
      FROM documents
    )
    """,
)
def text_bpe_pretoken_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document pre-token statistics under the BPE-ish split:
    total pre-tokens (the unit LLM ingestion cost scales with),
    distinct pre-tokens, and the longest single pre-token."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(PRETOKEN_PATTERN), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_pretokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_max(F.transform(toks, F.length)).alias("max_token_len"),
    )


TOP_PAIRS = 20


def bpe_merge_pair_counts(docs: DataFrame, top_k: int = TOP_PAIRS) -> DataFrame:
    """Corpus-wide adjacent-symbol-pair frequencies at the character
    stage of BPE training — the statistic whose argmax IS the first
    BPE merge (Sennrich et al. 2016, alg. 1, iteration 1).

    Scale posture (100 TB corpus): the naive plan explodes every
    character position of every document (O(chars) shuffle rows). This
    plan exploits Zipf instead — aggregate pre-tokens to (token,
    count) FIRST (one shuffle whose row count is the VOCABULARY of
    pre-tokens, not the corpus size), then expand only each DISTINCT
    token into its pairs and weight by the count. The expansion input
    is the vocabulary table — millions of rows regardless of corpus
    size — so iteration cost is corpus-size-independent after the
    first count pass, exactly why production BPE trainers keep a
    word-frequency dict. All JVM expressions (substring over a
    position sequence); no Python in the data path.
    """
    toks = F.explode(
        F.regexp_extract_all("text", F.lit(PRETOKEN_PATTERN), F.lit(0))
    ).alias("tok")
    tc = docs.select(toks).groupBy("tok").agg(F.count("*").alias("c"))
    pairs = F.when(
        F.length("tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("tok") - 1),
            lambda i: F.substring(F.col("tok"), i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        tc.select(F.explode(pairs).alias("pair"), "c")
        .groupBy("pair")
        .agg(F.sum("c").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(top_k)
    )


@query(
    "text_bpe_merge_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '{_SQL_PATTERN}')) AS tok
      FROM documents
    ),
    tc AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
    pairs AS (
      SELECT tok[i:i+1] AS pair, c
      FROM tc, LATERAL (
        SELECT unnest(generate_series(1, len(tok)-1)) AS i
      ) t
    )
    SELECT pair, CAST(sum(c) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1
    ORDER BY pair_count DESC, pair LIMIT {TOP_PAIRS}
    """,
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{20} adjacent character pairs across the corpus under the
    GPT-2-style pre-tokenization, weighted by pre-token frequency —
    BPE training iteration 1. Ties broken by pair text so the top-k
    SET is deterministic across engines."""
    return bpe_merge_pair_counts(load_table(spark, sf_dir, "documents"))
