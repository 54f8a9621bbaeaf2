"""Character-entropy quality signal over the documents table.

A standard corpus-curation filter (the Gopher/C4 rule family in
``text_quality_scores`` measures token shape; this measures symbol
diversity): documents whose character distribution has very low
Shannon entropy are boilerplate, padding, or degenerate repetition
(e.g. "aaaa…" scores 0 bits/char), while natural language sits around
4–5 bits/char. Encoding-noise blobs score anomalously HIGH — so the
signal filters both tails.

Single-pass algebra: H = log₂N − (Σ n·log₂n)/N over the per-character
counts n (N = Σn), so one (doc_id, char) aggregation followed by one
per-doc aggregation computes everything — no join-back of the doc
total, two shuffles total, both key-bounded. Characters are extracted
codepoint-wise with ``(?s).`` (identical in Java regex and RE2; DOTALL
so newlines count). Float discipline: both engines evaluate the same
ln-based expression and the 6-dp round absorbs association-order ULPs
(the ``lm_score`` rule); ``+ 0.0`` normalizes the −0.0 that a
single-character document (H = 0) can produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "text_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
      FROM documents
    ),
    cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_chars_counted,
           count(*) AS n_unique_chars,
           round((ln(CAST(sum(n) AS DOUBLE))
                  - sum(n * ln(CAST(n AS DOUBLE))) / sum(n)) / ln(2), 6)
             + 0.0 AS entropy_bits
    FROM cc
    GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character Shannon entropy in bits/char, with the
    character count and alphabet size it was computed from. Empty
    documents produce no row (no characters to measure) in both
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit("(?s)."), F.lit(0))
        ).alias("c"),
    )
    cc = ch.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    nn = F.sum("n")
    s_nlnn = F.sum(F.col("n") * F.log(F.col("n").cast("double")))
    return cc.groupBy("doc_id").agg(
        nn.alias("n_chars_counted"),
        F.count("*").alias("n_unique_chars"),
        (
            F.round(
                (F.log(nn.cast("double")) - s_nlnn / nn) / F.log(F.lit(2.0)), 6
            )
            + F.lit(0.0)
        ).alias("entropy_bits"),
    )
