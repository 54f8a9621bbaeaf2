"""Deduplication operators over the documents table.

The LLM-data-pipeline dedup stack (BASELINE.json north star):
  - exact dedup       : content-hash groupBy
  - MinHash + LSH     : shingle → minhash signature → banded buckets
                        → candidate pairs (near-dup at corpus scale)
  - SimHash           : bit-vote fingerprint (Hamming-style near-dup)
  - n-gram Jaccard    : exact set similarity on candidate pairs

Portability design: every hash is md5 (identical in Spark and
DuckDB), and MinHash minimizes the *lexicographic* md5 hex string —
engine-neutral, so the full LSH pipeline is oracle-checkable.
At 100 TB the only shuffles are the per-doc signature aggregation and
the band-key join; no pairwise n² stage ever materializes (pairs are
generated only within LSH buckets / shared shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

N_HASHES = 8   # minhash signature length
N_BANDS = 4    # bands of r = N_HASHES / N_BANDS rows each
_R = N_HASHES // N_BANDS


def _tune_cached_plans(df: DataFrame) -> None:
    """Persisted subtrees keep their raw shuffle-partition count
    unless AQE is allowed to re-plan cached output partitioning —
    set it for caller-owned sessions (engine sessions already do,
    session.py)."""
    df.sparkSession.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )


def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) with distinct k-word shingles per document.

    The word array is projected ONCE before the transform — an
    expression referencing split() inside the lambda re-tokenizes the
    document per element, turning shingling O(words) into O(words²).
    """
    idx = " , ".join(f"ws[i - {k - 1 - j}]" for j in range(k))
    expr = f"""
    CASE WHEN size(ws) >= {k} THEN
      transform(sequence({k - 1}, size(ws) - 1),
                i -> concat_ws(' ', {idx}))
    ELSE array(text) END
    """
    return docs.select(
        "doc_id", "text", F.split("text", " ").alias("ws")
    ).select("doc_id", F.explode(F.array_distinct(F.expr(expr))).alias("shingle"))


_SHINGLE_SQL = """
    SELECT doc_id, unnest(list_distinct(sh)) AS shingle
    FROM (
      SELECT doc_id,
             CASE WHEN len(ws) >= 3 THEN
               [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                FOR i IN generate_series(1, len(ws) - 2)]
             ELSE [text] END AS sh
      FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
    )
"""


@query(
    "dedup_exact_docs",
    oracle="""
    SELECT md5(text) AS fp, count(*) AS n_copies, min(doc_id) AS keep_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash: one partial-agg'd shuffle on the
    hash; keeper chosen deterministically (min doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.col("text").cast("binary")).alias("fp")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id")
    )


def _minhash_signature(sh: DataFrame) -> DataFrame:
    """doc_id → N_HASHES lexicographic-min md5 minhashes."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")).cast("binary"))).alias(
            f"h{j}"
        )
        for j in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key): LSH banding of the minhash
    signature — docs sharing any band key are near-dup candidates."""
    sig = _minhash_signature(shingles(docs))
    band_cols = []
    for b in range(N_BANDS):
        parts = [F.col(f"h{b * _R + i}") for i in range(_R)]
        band_cols.append(F.md5(F.concat(*parts).cast("binary")).alias(f"b{b}"))
    banded = sig.select("doc_id", *band_cols)
    stack_args = ", ".join(f"'{b}', b{b}" for b in range(N_BANDS))
    return banded.selectExpr(
        "doc_id", f"stack({N_BANDS}, {stack_args}) AS (band_id, band_key)"
    )


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"min(md5('{j}:' || shingle)) AS h{j}" for j in range(N_HASHES)
    )
    return f"SELECT doc_id, {mins} FROM ({_SHINGLE_SQL}) GROUP BY doc_id"


def _minhash_bands_sql() -> str:
    bands = ", ".join(
        "md5(" + " || ".join(f"h{b * _R + i}" for i in range(_R)) + f") AS b{b}"
        for b in range(N_BANDS)
    )
    arms = " UNION ALL ".join(
        f"SELECT doc_id, '{b}' AS band_id, b{b} AS band_key FROM banded"
        for b in range(N_BANDS)
    )
    return f"WITH sig AS ({_minhash_sig_sql()}), banded AS (SELECT doc_id, {bands} FROM sig) {arms}"


@query(
    "minhash_band_candidates",
    oracle=f"""
    WITH bands AS ({_minhash_bands_sql()})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """,
)
def minhash_band_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate candidates: 8-hash signatures in 4
    bands of 2; pairs sharing any band bucket. The pair join is on
    (band_id, band_key) — work is proportional to bucket collisions,
    never to n² of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    # Persist the banded signatures: they are tiny relative to the
    # corpus (N_BANDS rows of fixed-width hashes per doc) and feed
    # BOTH sides of the self-join — without this Spark recomputes the
    # whole shingle→md5→min pipeline twice.
    _tune_cached_plans(docs)
    bands = minhash_bands(docs).persist()
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _simhash_bit_sql(i: int) -> str:
    return (
        f"sum(CASE WHEN substring(md5(word), {i + 1}, 1) >= '8' "
        f"THEN 1 ELSE -1 END)"
    )


@query(
    "simhash16_fingerprints",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    votes AS (
      SELECT doc_id,
             {", ".join(f"{_simhash_bit_sql(i)} AS s{i}" for i in range(16))}
      FROM tokens GROUP BY doc_id
    )
    SELECT doc_id,
           {" + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))}
             AS simhash16
    FROM votes
    """,
)
def simhash16_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit): per-token md5 hex digits vote each bit up or
    down; fingerprint = sign bits. Near-dup docs land within small
    Hamming distance. One explode + one aggregation shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    votes = tokens.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.substring(F.md5(F.col("word").cast("binary")), i + 1, 1) >= "8",
                    1,
                ).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(16)
        ]
    )
    fp = None
    for i in range(16):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return votes.select("doc_id", fp.cast("long").alias("simhash16"))


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_inter,
           round(n_inter * 1.0 / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter >= 2
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity for candidate pairs — pairs
    are generated by the shared-shingle join (inverted-index style),
    so cost scales with actual shingle collisions, not n²."""
    docs = load_table(spark, sf_dir, "documents")
    # shingle set feeds three plan branches (a-side, b-side, sizes)
    _tune_cached_plans(docs)
    sh = shingles(docs).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
        .filter(F.col("n_inter") >= 2)
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.round(
                F.col("n_inter")
                * 1.0
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
