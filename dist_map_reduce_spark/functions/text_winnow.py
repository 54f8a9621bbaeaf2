"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
SIGMOD 2003 — the MOSS algorithm).

``text_fingerprint`` hashes whole documents; winnowing selects a
GUARANTEED-coverage subset of local k-gram hashes: from every window
of W consecutive char-k-gram hashes keep the minimum (rightmost on
ties), so any shared substring of length ≥ K + W − 1 between two
documents shares at least one selected fingerprint. That local
guarantee is what makes it the standard index for partial-overlap /
plagiarism-style near-dup detection, complementing MinHash (whole-doc
similarity) and the duplicated-span detector (corpus-frequency
based).

Implementation is one narrow projection — per document: k-gram
hashes (md5-derived 32-bit ints, the engine-portable hash used by
A-ES sampling), per-window min via array expressions, rightmost-tie
position arithmetic (s + W − position-in-reversed-slice), and each
selected (pos, fp) packed into pos·2³² + fp — struct-free, so the
identical formula runs in Spark higher-order functions and DuckDB
list functions and sorts deterministically as plain integers. Zero
shuffles before the per-doc summary; the exploded (doc_id, pos, fp)
index form is one ``explode`` away and joins
fingerprint-to-fingerprint for match detection at corpus scale.

Output is the per-doc summary (n_grams, n_fingerprints, the md5 of
the position-ordered fingerprint list) — every selected fingerprint
and its position participates in the hash, so a single mis-selected
window anywhere mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

K_GRAM = 16  # char k-gram length
W_WIN = 8  # winnowing window (guarantee threshold = K_GRAM + W_WIN - 1)
_P32 = 4294967296  # 2^32: (pos, fp) packs as pos * 2^32 + fp


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, fps) — the selected fingerprint set per
    document, each as pos·2³² + fp (1-based gram position, 32-bit
    md5-derived gram hash). Pure array expressions, zero shuffles;
    the guarantee property (any shared substring of length
    ≥ K+W−1 shares a fingerprint) is pinned against a Python
    reference in tests/test_bpe_encode.py."""
    docs = docs.where(F.length("text") >= K_GRAM + W_WIN - 1)
    hs = F.transform(
        F.sequence(F.lit(1), F.length("text") - K_GRAM + 1),
        lambda i: F.conv(
            F.substring(F.md5(F.col("text").substr(i, F.lit(K_GRAM))), 1, 8),
            16,
            10,
        ).cast("bigint"),
    )
    h = docs.select("doc_id", hs.alias("hs"))
    sl = lambda s: F.slice(F.col("hs"), s, W_WIN)  # noqa: E731
    packed = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - W_WIN + 1),
            lambda s: (
                s.cast("bigint")
                + F.lit(W_WIN)
                - F.array_position(F.reverse(sl(s)), F.array_min(sl(s)))
            )
            * F.lit(_P32)
            + F.array_min(sl(s)),
        )
    )
    return h.select(
        "doc_id", F.size("hs").alias("n_grams"), packed.alias("fps")
    )


@query(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, len(text) - {K_GRAM} + 1),
               i -> ('0x' || substring(md5(text[i : i + {K_GRAM} - 1]),
                                       1, 8))::BIGINT
             ) AS hs
      FROM documents
      WHERE len(text) >= {K_GRAM} + {W_WIN} - 1
    ),
    sel AS (
      SELECT doc_id, len(hs) AS n_grams,
             list_distinct(list_transform(
               generate_series(1, len(hs) - {W_WIN} + 1),
               s -> (s + {W_WIN}
                     - list_position(list_reverse(hs[s : s + {W_WIN} - 1]),
                                     list_min(hs[s : s + {W_WIN} - 1])))
                    * {_P32} + list_min(hs[s : s + {W_WIN} - 1])
             )) AS fps
      FROM h
    )
    SELECT doc_id,
           n_grams,
           len(fps) AS n_fingerprints,
           md5(array_to_string(
             list_transform(
               list_sort(fps),
               v -> CAST(v // {_P32} AS VARCHAR) || ':'
                    || CAST(v % {_P32} AS VARCHAR)),
             ',')) AS fingerprints_md5
    FROM sel
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing summary: k-gram count, selected
    fingerprint count, and the md5 over the position-ordered
    ``pos:fp`` list. Documents shorter than K+W−1 chars have no full
    window and produce no row (both engines). Positions are 1-based
    gram indexes; fp values are 32-bit, so the pack/unpack arithmetic
    is exact in BIGINT."""
    docs = load_table(spark, sf_dir, "documents")
    sel = winnow_fingerprints(docs)
    return sel.select(
        "doc_id",
        "n_grams",
        F.size("fps").alias("n_fingerprints"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort("fps"),
                    lambda v: F.concat(
                        F.shiftright(v, 32).cast("string"),
                        F.lit(":"),
                        (v % F.lit(_P32)).cast("string"),
                    ),
                ),
            )
        ).alias("fingerprints_md5"),
    )
