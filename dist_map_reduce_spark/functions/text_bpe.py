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
