"""Iterative dedup clustering: connected components over the
near-duplicate candidate graph.

The last stage of a corpus-dedup pipeline: MinHash/LSH emits
candidate PAIRS; turning pairs into KEEP/DROP decisions requires the
transitive closure (doc A ~ B, B ~ C ⇒ one cluster). Connected
components is inherently iterative — the canonical example of an op
the reference's two-phase MapReduce cannot express in one job but
Spark runs as a loop of joins with AQE replanning each pass.

Algorithm: label propagation to the minimum doc_id. Each iteration
joins every node's current label against its neighbors' and takes
the min; converges in O(graph diameter) passes. Each pass is one
shuffle on doc_id; state stays distributed (only the convergence
flag — one boolean — reaches the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.registry import query


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """pairs(doc_a, doc_b) → (doc_id, component) with component =
    min doc_id reachable. Deterministic, rows-only-checkable."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    prev_persisted = None
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .persist()
        )
        # convergence check: one scalar to the driver, not the data
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        # new_labels is materialized by the count above; the previous
        # snapshot (and its lineage) is no longer needed
        if prev_persisted is not None:
            prev_persisted.unpersist()
        prev_persisted = labels = new_labels
        if changed == 0:
            break
    return labels


@query("dedup_clusters")  # rows-only: iterative, not SQL-expressible
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters from MinHash candidates: connected
    components + per-cluster keeper (min doc_id) and size. Validated
    against a driver-side union-find on the (small) candidate edge
    list in tests/test_clustering.py."""
    from dist_map_reduce_spark.functions.dedup import minhash_band_candidates

    pairs = minhash_band_candidates(spark, sf_dir)
    comps = connected_components(pairs)
    return comps.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.min("doc_id").alias("keep_id"),
        F.sort_array(F.collect_list("doc_id")).alias("members"),
    )
