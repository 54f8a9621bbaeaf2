"""Iterative dedup clustering: connected components over the
near-duplicate candidate graph.

The last stage of a corpus-dedup pipeline: MinHash/LSH emits
candidate PAIRS; turning pairs into KEEP/DROP decisions requires the
transitive closure (doc A ~ B, B ~ C ⇒ one cluster). Connected
components is inherently iterative — the canonical example of an op
the reference's two-phase MapReduce cannot express in one job but
Spark runs as a loop of joins with AQE replanning each pass.

Two algorithms, same answer:

- ``connected_components`` — label propagation to the minimum
  doc_id. Each iteration joins every node's current label against
  its neighbors' and takes the min; converges in O(graph diameter)
  passes. Each pass is one shuffle on doc_id; state stays
  distributed (only the convergence flag — one boolean — reaches
  the driver). Right when the candidate graph is shallow (near-dup
  clusters usually are).
- ``connected_components_logn`` — the alternating
  large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14): each round
  rewires edges toward neighborhood minima, halving the effective
  diameter, so convergence is O(log n) rounds regardless of graph
  shape. The scale-safe default: a pathological chain (diameter >
  any fixed iteration cap) converges where label propagation's cap
  would split components. Exercised on exactly such a chain in
  tests/test_clustering.py.

Oracle (both): DuckDB computes the same closure with a recursive
CTE (node reaches itself ∪ whatever its neighbors reach; component
= min reachable id) — exact, so the whole iterative pipeline is
hash-checked end to end, not just rows-only.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.functions.dedup import _CANDIDATE_PAIRS_SQL
from dist_map_reduce_spark.registry import query
from dist_map_reduce_spark.session import iter_checkpoint


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """pairs(doc_a, doc_b) → (doc_id, component) with component =
    min doc_id reachable. Deterministic.

    Warns (and returns the partial labels) if ``max_iter`` passes
    did not reach a fixpoint — a chain with graph diameter >
    ``max_iter`` would otherwise silently yield split components.
    """
    # both edge directions in ONE pass over the candidate plan — a
    # union of two selects would scan (and recompute) it twice before
    # the persist materializes
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    # iteration 0 fused into the init: component = min(self, direct
    # neighbors) — one aggregation instead of a full propagate pass
    # (every node appears as src because edges are symmetric)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("md"))
        .select(
            F.col("src").alias("doc_id"),
            F.least(F.col("src"), F.col("md")).alias("component"),
        )
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        # carry the old component through the propagate step so the
        # convergence check is a filter on the SAME materialized
        # snapshot, not an extra join of new vs old labels. Eager
        # checkpointing materializes AND truncates the lineage
        # (SCALE.md iterative-lineage rule; reliable dir when the app
        # set one, else local — session.iter_checkpoint); snapshot
        # blocks release via the context cleaner once unreferenced.
        stepped = iter_checkpoint(
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                labels.doc_id,
                F.col("component").alias("old_component"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("new_component"),
            )
        )
        # convergence check: one scalar to the driver, not the data
        changed = (
            stepped.filter(F.col("new_component") != F.col("old_component"))
            .limit(1)
            .count()
        )
        labels = stepped.select("doc_id", F.col("new_component").alias("component"))
        if changed == 0:
            converged = True
            break
    # the labels snapshot is materialized; the edge cache is dead
    edges.unpersist()
    if not converged:
        warnings.warn(
            f"connected_components: no fixpoint after {max_iter} iterations "
            "(graph diameter exceeds max_iter); components may be split",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def connected_components_logn(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """pairs(doc_a, doc_b) → (doc_id, component) via alternating
    large-star/small-star (Kiveris et al., SoCC'14). Deterministic;
    converges in O(log n) rounds on ANY graph shape — the 100 TB
    replacement for label propagation's O(diameter).

    Per round (4 bounded shuffles, edge count monotonically shrinks
    toward one edge per non-root node):

    - large-star: every node u attaches each LARGER neighbor v to
      m(u) = min(N(u) ∪ {u}) — a groupBy-min on the symmetrized
      edges plus one equi-join;
    - small-star: on the resulting hi→lo edges, every node u
      attaches its smaller neighbors (and itself) to their min —
      another groupBy-min + equi-join.

    Each round's edge set is eagerly checkpointed (lineage would
    otherwise double per round), and the convergence probe sends two
    scalars to the driver (count + first-difference), never rows.
    At the fixpoint the graph is a union of stars rooted at each
    component's minimum, so labels read directly off the edges.
    Nodes isolated in ``pairs`` (self-loops only) get no row, same
    contract as ``connected_components``.

    Warns (and returns the partial labels) if ``max_iter`` rounds
    did not reach the fixpoint; unlike label propagation the bound
    is logarithmic, so 30 rounds covers any feasible corpus
    (2³⁰ components-worth of chaining).
    """
    edges = iter_checkpoint(
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("hi"),
            F.least("doc_a", "doc_b").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )
    converged = False
    for _ in range(max_iter):
        sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(smins, "hi")
            .select(F.col("lo").alias("a"), F.col("m").alias("b"))
            .union(smins.select(F.col("hi").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("hi"),
                F.least("a", "b").alias("lo"),
            )
            .distinct()
        )
        new_edges = iter_checkpoint(small)
        unchanged = (
            new_edges.count() == edges.count()
            and new_edges.exceptAll(edges).limit(1).count() == 0
        )
        edges = new_edges
        if unchanged:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components_logn: no fixpoint after {max_iter} "
            "rounds; components may be split",
            RuntimeWarning,
            stacklevel=2,
        )
    labels = (
        edges.groupBy("hi")
        .agg(F.min("lo").alias("component"))
        .select(F.col("hi").alias("doc_id"), "component")
    )
    roots = (
        edges.select(F.col("lo").alias("doc_id"))
        .distinct()
        .join(labels, "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("component"))
    )
    return labels.union(roots)


# shared by dedup_clusters and dedup_clusters_logn: the two Spark
# algorithms must agree with the same exact transitive closure
_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_CANDIDATE_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.r FROM edges e JOIN reach w ON w.node = e.dst
    ),
    comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node)
    SELECT component,
           count(*) AS cluster_size,
           min(doc_id) AS keep_id,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
    FROM comp
    GROUP BY component
    """


@query("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters from MinHash candidates: connected
    components + per-cluster keeper (min doc_id), size, and the
    member list flattened to a comma-joined string (scalar output
    columns only — the harness canonicalizer rejects nested types).
    Cross-checked against a driver-side union-find in
    tests/test_clustering.py and the recursive-CTE oracle above.

    Repeat invocations on the same fixture dir return the cached
    cluster table (materialized-view reuse via caching.peek): the
    label-propagation loop runs Spark jobs at plan-CONSTRUCTION
    time, so output-level persist alone could not skip the rebuild.
    Same staleness contract as every persist_tracked slot — the
    fixture parquet is immutable between invocations."""
    from dist_map_reduce_spark import caching
    from dist_map_reduce_spark.functions.dedup import minhash_band_candidates

    hit = caching.peek("dedup_clusters_out", sf_dir, session=spark)
    if hit is not None:
        return hit

    pairs = minhash_band_candidates(spark, sf_dir)
    comps = connected_components(pairs)
    out = comps.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.min("doc_id").alias("keep_id"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
        ).alias("members"),
    )
    return caching.persist_tracked(out, "dedup_clusters_out", sf_dir)


@query(
    "dedup_keep_drop_list",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_CANDIDATE_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.r FROM edges e JOIN reach w ON w.node = e.dst
    ),
    comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    ),
    ranked AS (
      SELECT doc_id, component,
             row_number() OVER (
               PARTITION BY component
               ORDER BY n_chars DESC, doc_id ASC
             ) AS rn
      FROM labeled
    )
    SELECT r.doc_id, r.component,
           k.doc_id AS canonical_id,
           CASE WHEN r.rn = 1 THEN 'keep' ELSE 'drop' END AS action
    FROM ranked r JOIN ranked k ON k.component = r.component AND k.rn = 1
    """,
)
def dedup_keep_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable end of the dedup pipeline: a KEEP/DROP decision
    for EVERY document in the corpus. Documents in a near-dup cluster
    keep only the canonical member — the longest text (n_chars desc,
    doc_id tiebreak), the standard content-preserving choice, NOT
    simply min doc_id; singletons (no candidate pair) keep themselves.

    Scale shape: the cluster labels come from the cached
    ``dedup_clusters`` run (connected components over the MinHash
    candidate graph — O(diameter) shuffles on the sparse pair set);
    this adds one left join of the corpus against the (small) member
    list, then ONE window exchange on component computing both the
    keep rank and the canonical id (``first`` over the same ordered
    spec — no corpus-sized join-back; components are mostly
    singletons, so a "canonical per component" table would be
    corpus-sized and never broadcastable). The decision list streams
    straight to a sink at 100 TB."""
    from dist_map_reduce_spark.catalog import load_table
    from pyspark.sql import Window as W

    # reuse the cached cluster table (members already flattened);
    # explode back to one row per clustered doc
    members = (
        dedup_clusters(spark, sf_dir)
        .select(
            "component",
            F.explode(F.split("members", ",")).alias("doc_id_str"),
        )
        .select(F.col("doc_id_str").cast("long").alias("doc_id"), "component")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = (
        docs.join(members, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    w = W.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        labeled.select(
            "doc_id",
            "component",
            F.first("doc_id").over(w).alias("canonical_id"),
            F.row_number().over(w).alias("rn"),
        )
        .select(
            "doc_id",
            "component",
            "canonical_id",
            F.when(F.col("rn") == 1, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("action"),
        )
    )


@query("dedup_clusters_logn", oracle=_CLUSTERS_ORACLE)
def dedup_clusters_logn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same near-duplicate cluster table as ``dedup_clusters``
    (identical oracle — the two algorithms must agree exactly), built
    with the O(log n) alternating large-star/small-star algorithm
    instead of O(diameter) label propagation. This is the variant to
    run at 100 TB, where the candidate graph's shape is not under
    your control: a long chain of pairwise near-dups converges here
    in ~log₂(chain) rounds where a fixed label-propagation cap would
    split the component (property test on a 200-link chain:
    tests/test_clustering.py).

    Cached per fixture dir like its sibling (the star-contraction
    loop runs Spark jobs at plan-construction time)."""
    from dist_map_reduce_spark import caching
    from dist_map_reduce_spark.functions.dedup import minhash_band_candidates

    hit = caching.peek("dedup_clusters_logn_out", sf_dir, session=spark)
    if hit is not None:
        return hit

    pairs = minhash_band_candidates(spark, sf_dir)
    comps = connected_components_logn(pairs)
    out = comps.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.min("doc_id").alias("keep_id"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
        ).alias("members"),
    )
    return caching.persist_tracked(out, "dedup_clusters_logn_out", sf_dir)
