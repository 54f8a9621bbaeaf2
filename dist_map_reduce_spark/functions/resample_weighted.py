"""Weighted systematic resampling (importance sampling for corpus
mixing).

Training-data pipelines re-weight corpora by importance — sample
documents proportional to a weight (token count, quality score,
domain temperature) rather than uniformly per document. The
deterministic, exactly-reproducible way to do that at scale is
SYSTEMATIC sampling over the cumulative weight axis: lay documents
on a line where each occupies an interval of its weight, then pick
every S-th point; a document is emitted once per sampling point its
interval covers (``n_copies`` — importance resampling naturally
repeats heavy documents and skips light ones). Every selection is
pure integer arithmetic — no RNG, no float accumulation — so the
sample is bit-identical across engines, runs, and partitionings of
the same ordered input.

Weights here are token counts (the sample is uniform over the TOKEN
stream rather than the document stream — what you want when auditing
or mixing by token budget); any non-negative integer weight works.

Scale posture (100 TB): the cumulative sum is sharded exactly like
sequence packing (functions/packing.py) — hash shards, ORDER BY
doc_id windows WITHIN shards — so no global single-reducer sort
exists; each shard is an independent systematic sample, which is
stratified systematic sampling. The true-global-axis variant is the
standard two-phase distributed scan (per-partition totals -> prefix
offsets broadcast back); the sharded form is the same cost shape with
the offsets fixed at zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

STEP = 997  # sampling stride on the token axis (prime: avoids
# beating against round-number document lengths)
N_SHARDS = 8


def systematic_resample(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    step: int = STEP,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Append (shard, cum_w, n_copies): ``n_copies`` = how many
    sampling points (multiples of ``step``, exclusive of 0) fall in
    the document's weight interval (cum_w - w, cum_w]. Integer-exact:
    n_copies = cum div step - (cum - w) div step."""
    shard = F.col(order_col) % n_shards
    w = F.col(weight_col)
    win = (
        Window.partitionBy(shard)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(w).over(win)
    return df.withColumn("shard", shard.cast("bigint")).withColumn(
        "cum_w", cum
    ).withColumn(
        "n_copies",
        F.expr(f"cum_w div {step}") - F.expr(f"(cum_w - {weight_col}) div {step}"),
    )


@query(
    "importance_resample_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             doc_id % {N_SHARDS} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT *, sum(n_tok) OVER (
        PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
      FROM t
    )
    SELECT doc_id, shard, n_tok,
           CAST(cum_w AS BIGINT) AS cum_w,
           CAST(cum_w // {STEP} - (cum_w - n_tok) // {STEP} AS BIGINT)
             AS n_copies
    FROM c
    """,
)
def importance_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-proportional systematic resample of the documents
    corpus: every ~STEP (997) tokens of the concatenated per-shard
    stream emits the covering document once. Full output (n_copies
    may be 0); a pipeline keeps rows where n_copies > 0, repeated
    n_copies times."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    out = systematic_resample(docs, "n_tok", "doc_id")
    return out.select("doc_id", "shard", "n_tok", "cum_w", "n_copies")
