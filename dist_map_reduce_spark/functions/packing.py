"""Privacy scrubbing and sequence packing — the last-mile operators
of a pretraining-data pipeline (after dedup/quality filtering, before
tokenized shards are written).

Reference parity note: the reference has no text pipeline beyond
word count (src/worker/worker.go:270-288); these extend the engine's
LLM-data surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

# Patterns restricted to syntax Java regex and RE2 (DuckDB) agree on:
# character classes + bounded quantifiers, no backrefs/lookaround.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "[+][0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}"

# The fixture corpus is synthetic word soup with no PII, so the query
# deterministically plants contact strings in a subset of documents
# (every 3rd an email, every 5th a phone) before scrubbing — the
# plumbing under test is the scrub, and the oracle mirrors the
# planting exactly.
_PLANT_SQL = """
    concat(
      text,
      CASE WHEN doc_id % 3 = 0
           THEN concat(' reach me at user', CAST(doc_id AS STRING),
                       '@example.com')
           ELSE '' END,
      CASE WHEN doc_id % 5 = 0
           THEN concat(' call +1 555-010-', lpad(CAST(doc_id % 10000
                       AS STRING), 4, '0'))
           ELSE '' END
    )
"""


@query(
    "pii_redact_docs",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, {_PLANT_SQL} AS text FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM planted
    """,
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact email/phone matches per document.
    Pure JVM regex projection — no shuffle, no Python; at 100 TB this
    is a free pass over the scan like any other narrow transform."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select("doc_id", F.expr(_PLANT_SQL).alias("text"))
    return planted.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{_EMAIL_RE}', 0)")).alias(
            "n_emails"
        ),
        F.size(F.expr(f"regexp_extract_all(text, '{_PHONE_RE}', 0)")).alias(
            "n_phones"
        ),
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    )


# Tokens per packed sequence. Documents are concatenated in doc_id
# order and split at exact budget boundaries (straddling allowed),
# the standard pretraining packing layout.
_PACK_BUDGET = 512
_N_SHARDS = 8


@query(
    "sequence_pack_docs",
    oracle=f"""
    SELECT doc_id,
           CAST(doc_id % {_N_SHARDS} AS BIGINT) AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
                  PARTITION BY doc_id % {_N_SHARDS}
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS start_tok,
           CAST(floor(coalesce(sum(len(string_split(text, ' '))) OVER (
                  PARTITION BY doc_id % {_N_SHARDS}
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id
    FROM documents
    """,
)
def sequence_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign every document a deterministic token
    offset and 512-token pack bin within its shard (documents are
    concatenated in doc_id order; sequences split at bin boundaries).

    Scale design: packing is sequential by nature, so a single global
    prefix sum would serialize on one partition. Instead documents
    are sharded deterministically (doc_id mod N) and packed WITHIN
    shards — each shard's window prefix sum runs in parallel, which
    is how production packing works (one packer per output shard).
    N_SHARDS scales with the cluster; the oracle replicates the
    exact same layout."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (F.col("doc_id") % _N_SHARDS).cast("bigint")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            "doc_id", shard.alias("shard"), n_tok.alias("n_tok")
        )
        .withColumn(
            "start_tok", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("bigint")
        )
        .withColumn(
            "bin_id", F.floor(F.col("start_tok") / float(_PACK_BUDGET)).cast("bigint")
        )
    )


def pack_ffd(
    docs: DataFrame,
    budget: int = _PACK_BUDGET,
    n_shards: int = _N_SHARDS,
) -> DataFrame:
    """No-straddle packing by first-fit-decreasing: every document
    lands WHOLE in exactly one bin of ``budget`` tokens (documents
    longer than the budget get a dedicated oversize bin). This is the
    other standard layout — ``sequence_pack_docs`` concatenates and
    splits (zero waste, documents may straddle bins; right for
    pretraining), FFD never splits a document (right for SFT-style
    training where truncating an example corrupts it) and minimizes
    the padding waste that no-straddle forces — classically within
    11/9·OPT + 6/9, in practice a few percent.

    Scale shape: bin assignment is inherently sequential WITHIN a
    packer, so documents shard deterministically (doc_id mod
    n_shards) and each shard packs independently inside one
    ``applyInPandas`` group — the sanctioned Arrow path for
    per-group imperative logic the built-ins cannot express; state
    is one Python list of open-bin capacities per shard, bounded by
    bins-per-shard. Deterministic: FFD order is (n_tok DESC, doc_id
    ASC), so the layout is reproducible run-to-run and
    cluster-size-independent.

    Returns (doc_id, shard, bin_id, offset_in_bin, n_tok); bins are
    numbered per shard in creation order.
    """
    import pandas as pd

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        caps: list[int] = []  # remaining capacity per open bin
        offs: list[int] = []  # next write offset per bin
        bin_ids, offsets = [], []
        for n in pdf["n_tok"]:
            n = int(n)
            placed = False
            if n <= budget:
                for i, cap in enumerate(caps):
                    if cap >= n:
                        bin_ids.append(i)
                        offsets.append(offs[i])
                        caps[i] -= n
                        offs[i] += n
                        placed = True
                        break
            if not placed:
                # new bin; oversize docs occupy one alone (cap 0)
                bin_ids.append(len(caps))
                offsets.append(0)
                caps.append(max(budget - n, 0))
                offs.append(n)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["offset_in_bin"] = pd.Series(offsets, dtype="int64")
        return pdf[["doc_id", "shard", "n_tok", "bin_id", "offset_in_bin"]]

    base = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("bigint").alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    return base.groupBy("shard").applyInPandas(
        pack_shard,
        "doc_id bigint, shard bigint, n_tok bigint,"
        " bin_id bigint, offset_in_bin bigint",
    )
