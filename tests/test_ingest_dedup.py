"""Incremental ingestion dedup (streaming/ingest_dedup.py).

Two contracts: the shuffle-free row-wise banding is bit-identical to
the batch groupBy arm, and the multi-micro-batch foreachBatch
ingestion reproduces the batch-computed accepted set exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.streaming.ingest_dedup import (
    corpus_band_index,
    minhash_bands_rowwise,
    run_ingest_dedup,
    split_corpus_arrivals,
)
from tests.conftest import SF_SMOKE


def test_rowwise_bands_equal_batch_groupby_bands(spark):
    """Zero-shuffle row-wise banding must produce the EXACT
    (doc_id, band_id, band_key) set of the batch MinHash pipeline —
    same shingles, same salted md5 slices, same band md5s."""
    from dist_map_reduce_spark.functions.dedup import minhash_bands

    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    batch = {
        (r.doc_id, r.band_id, r.band_key)
        for r in minhash_bands(docs).collect()
    }
    rowwise = {
        (r.doc_id, *r.band.split(":", 1))
        for r in minhash_bands_rowwise(docs)
        .select("doc_id", F.explode("bands").alias("band"))
        .collect()
    }
    assert rowwise == batch


def test_rowwise_bands_plan_has_no_exchange(spark):
    """The whole point of the row-wise arm: banding an arrival batch
    is one projection — no Exchange anywhere in the plan."""
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = minhash_bands_rowwise(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ingest_matches_batch_answer(spark, tmp_path):
    """End-to-end replay: 3 arrival waves through foreachBatch must
    accept exactly one row per distinct arrival fingerprint, never a
    fingerprint twice (cross-batch anti-join), and flag precisely
    the arrivals sharing a band key with the corpus."""
    out = run_ingest_dedup(spark, SF_SMOKE, str(tmp_path))
    accepted = out.collect()

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus, arrivals = split_corpus_arrivals(docs)
    arrivals = arrivals.drop("bucket")

    # one row per distinct arrival fingerprint, no repeats
    exp_fps = {
        r.fp
        for r in arrivals.select(
            F.md5(F.col("text").cast("binary")).alias("fp")
        )
        .distinct()
        .collect()
    }
    assert len(accepted) == len(exp_fps)
    assert {r.fp for r in accepted} == exp_fps

    # every accepted doc_id carries its own fingerprint
    fp_by_doc = {
        r.doc_id: r.fp
        for r in arrivals.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
        ).collect()
    }
    assert all(fp_by_doc[r.doc_id] == r.fp for r in accepted)

    # near-dup flags == batch band-intersection answer (flag is a
    # function of text, so it is fingerprint-stable across keepers)
    idx = corpus_band_index(corpus)
    flagged_docs = {
        r.doc_id
        for r in minhash_bands_rowwise(arrivals)
        .select("doc_id", F.explode("bands").alias("band"))
        .join(idx, "band")
        .select("doc_id")
        .distinct()
        .collect()
    }
    exp_flagged_fps = {fp_by_doc[d] for d in flagged_docs}
    got_flagged_fps = {r.fp for r in accepted if r.corpus_neardup}
    assert got_flagged_fps == exp_flagged_fps
    assert any(not r.corpus_neardup for r in accepted)
