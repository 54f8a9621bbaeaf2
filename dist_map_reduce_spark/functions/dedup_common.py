"""Shared dedup primitives (registration-free).

Extracted from ``functions/dedup.py`` so sibling modules
(``dedup_simhash``) can reuse the hot-key cap and pair generation
WITHOUT triggering dedup's query registrations at import time — the
registry's 50-slot correctness window is ordered by first import
(registry.load_all), so helper reuse must not drag registrations in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Drop join keys shared by more than this many documents (see
# functions/dedup.py module docstring; normative cap-policy table:
# SCALE.md §"Cap policy"). Far above anything in the fixtures (max
# shingle DF at sf0.01 is 7) and far below a 100 TB hot key.
MAX_KEY_DOCS = 100


def _simhash_bit_sql(i: int) -> str:
    return (
        f"sum(CASE WHEN substring(md5(word), {i + 1}, 1) >= '8' "
        f"THEN 1 ELSE -1 END)"
    )


def _pairs_within_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs of doc_ids sharing a key, with
    the hot-key cap applied BEFORE any per-key doc list materializes:
    a count window partitioned by the key prunes over-cap keys in the
    same exchange the posting-list groupBy then reuses — ONE shuffle
    total, and a hot key costs WindowExec disk spill, never an
    unbounded collect_list buffer. Pair generation is a per-key list
    self-product, so a shuffle of the input replaces a two-sided
    self-join shuffle."""
    grouped = (
        df.withColumn(
            "n_docs", F.count("*").over(Window.partitionBy(*key_cols))
        )
        .filter(F.col("n_docs") <= MAX_KEY_DOCS)
        .groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        # singleton keys produce no pairs — skip them BEFORE the
        # O(k²) pair expression (most keys are singletons, so this
        # removes the bulk of the explode input)
        .filter(F.size("ds") >= 2)
    )
    # sorted postings → emit only the (i < j) index pairs: exactly
    # k(k-1)/2 structs, not k² filtered down
    return (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(ds) - 2), "
                    "i -> transform(sequence(i + 1, size(ds) - 1), "
                    "j -> struct(ds[i] AS doc_a, ds[j] AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
