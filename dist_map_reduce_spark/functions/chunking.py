"""Document chunking: fixed-size sliding word windows with overlap —
the standard segmentation step of an LLM training / RAG ingestion
pipeline (long document → bounded-size chunks, consecutive chunks
sharing `CHUNK - STRIDE` words of context).

Pure array expressions (sequence → transform → explode): a narrow,
JVM-side op that scales as one pass over the corpus with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

CHUNK = 32   # words per chunk
STRIDE = 24  # words between chunk starts (CHUNK - STRIDE = 8 overlap)


def chunk_documents(docs: DataFrame, chunk: int = CHUNK, stride: int = STRIDE) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_words): sliding windows over
    the word array; the last window may be shorter. Start positions
    are 0, stride, 2·stride, … up to the last index that begins a
    non-empty window."""
    ws = F.split("text", " ")
    return (
        docs.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, greatest(size(ws) - 1, 0), {stride}),"
                    f" s -> concat_ws(' ', slice(ws, s + 1, {chunk})))"
                )
            ).alias("chunk_id", "chunk_text"),
        )
        .withColumn("n_words", F.size(F.split("chunk_text", " ")))
    )


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    c AS (
      SELECT doc_id,
             (s / {STRIDE})::BIGINT AS chunk_id,
             array_to_string(ws[s + 1 : s + {CHUNK}], ' ') AS chunk_text
      FROM w, LATERAL (
        SELECT unnest(generate_series(0, greatest(len(ws) - 1, 0), {STRIDE})) AS s
      ) t
    )
    SELECT doc_id, chunk_id, chunk_text,
           len(string_split(chunk_text, ' ')) AS n_words
    FROM c
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of documents ({CHUNK}-word chunks,
    {STRIDE}-word stride → 8-word overlap)."""
    return chunk_documents(load_table(spark, sf_dir, "documents"))
