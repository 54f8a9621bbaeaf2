"""Weighted sampling without replacement (Efraimidis–Spirakis).

`importance_resample_docs` draws documents WITH replacement,
proportional to token count (systematic resampling). The other
sampling primitive a curation pipeline needs is weighted sampling
WITHOUT replacement — "pick K documents, heavier docs more likely,
each at most once". The distributed-canonical algorithm is
Efraimidis–Spirakis (A-ES): give every item an independent
exponential race clock with rate = its weight and keep the K
smallest arrival times; equivalently keep the K largest u^(1/w).
It is a single top-K over a narrow projection — embarrassingly
parallel, no sequential pass, which is why it is THE weighted
reservoir algorithm at scale.

Determinism: the "random" uniform is salted-md5-derived
(u = (m + 1) / 2³², m the first 8 hex digits of
md5('aes:' || doc_id) — exactly representable, never 0), the clock
is -ln(u) / w (two IEEE ops on identical doubles; ln-identity is
the same discipline lm_score relies on), and the ORDER BY
tie-breaks on doc_id, so both engines select the identical sample.

Scale shape: narrow projection (md5 + ln + divide) into a global
top-K — Spark plans TakeOrderedAndProject (per-partition heaps, K
rows to the driver-side merge), never a full sort of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

K = 100  # sample size
_POW32 = float(2**32)


@query(
    "weighted_sample_aes",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             ('0x' || substring(md5('aes:' || CAST(doc_id AS VARCHAR)),
                                1, 8))::BIGINT AS m
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             -ln((m + 1) / {_POW32}) / n_tokens + 0.0 AS raw_clock
      FROM w
    )
    SELECT doc_id, n_tokens, round(raw_clock, 10) AS clock
    FROM c
    ORDER BY raw_clock ASC, doc_id ASC
    LIMIT {K}
    """,
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-document weighted sample without replacement (A-ES):
    exponential race clocks -ln(u)/w with salted-md5 uniforms,
    keep the K smallest. Selection (ORDER BY ... LIMIT) runs on the
    RAW clock doubles in BOTH engines — the oracle's CTE orders by
    raw_clock and rounds only in the projection, mirroring the Spark
    plan, so a boundary pair that rounds equal at 10 dp but differs
    raw cannot diverge the sample. The ``+ 0.0`` normalizes the
    -0.0 that -ln(1)/w yields when m = 0xFFFFFFFF (both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    m = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("aes:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.size(F.split("text", " "))
    # + 0.0 turns the -0.0 from -ln(1)/w (m = 0xFFFFFFFF) into +0.0
    clock = -F.log((m + F.lit(1)) / F.lit(_POW32)) / w + F.lit(0.0)
    return (
        docs.select(
            "doc_id",
            w.alias("n_tokens"),
            clock.alias("raw_clock"),
        )
        .orderBy(F.col("raw_clock").asc(), F.col("doc_id").asc())
        .limit(K)
        .select(
            "doc_id",
            "n_tokens",
            F.round("raw_clock", 10).alias("clock"),
        )
    )
