"""Connected-components correctness vs a reference union-find on the
collected candidate edges (the edge list is tiny; the distributed
algorithm must agree with it exactly)."""

from __future__ import annotations

from dist_map_reduce_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def test_dedup_clusters_match_union_find(spark):
    pairs = registry.QUERIES["minhash_band_candidates"](spark, SF_SMOKE).collect()
    edges = [(r.doc_a, r.doc_b) for r in pairs]
    expected = _union_find(edges)
    exp_clusters = {}
    for node, root in expected.items():
        exp_clusters.setdefault(root, set()).add(node)

    got = registry.QUERIES["dedup_clusters"](spark, SF_SMOKE).collect()
    # members is a comma-joined string (scalar output contract)
    got_clusters = {
        r.component: set(int(m) for m in r.members.split(",")) for r in got
    }

    assert got_clusters == exp_clusters
    for r in got:
        assert r.keep_id == min(got_clusters[r.component])
        assert r.cluster_size == len(got_clusters[r.component])


def test_dedup_clusters_logn_match_union_find(spark):
    pairs = registry.QUERIES["minhash_band_candidates"](spark, SF_SMOKE).collect()
    edges = [(r.doc_a, r.doc_b) for r in pairs]
    expected = _union_find(edges)
    exp_clusters = {}
    for node, root in expected.items():
        exp_clusters.setdefault(root, set()).add(node)

    got = registry.QUERIES["dedup_clusters_logn"](spark, SF_SMOKE).collect()
    got_clusters = {
        r.component: set(int(m) for m in r.members.split(",")) for r in got
    }
    assert got_clusters == exp_clusters


def test_logn_converges_on_long_chain(spark):
    """A 200-link chain has diameter 200 — beyond label propagation's
    default cap (20). The alternating algorithm must reach the exact
    fixpoint in its logarithmic budget with NO convergence warning."""
    import warnings as w

    from dist_map_reduce_spark.functions.clustering import (
        connected_components_logn,
    )

    n = 201  # nodes 0..200 chained: diameter 200
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)
        labels = {
            r.doc_id: r.component
            for r in connected_components_logn(chain, max_iter=15).collect()
        }
    assert labels == {i: 0 for i in range(n)}


def test_logn_multiple_components_and_isolated(spark):
    """Two disjoint chains + a self-loop pair: components resolve to
    their minima; the self-loop node is isolated (no row)."""
    from dist_map_reduce_spark.functions.clustering import (
        connected_components_logn,
    )

    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (50, 50)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels = {
        r.doc_id: r.component
        for r in connected_components_logn(pairs).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_logn_empty_and_selfloop_only_graphs(spark):
    """Empty edge set and self-loop-only sets converge immediately to
    empty labels, without warnings."""
    import warnings as w

    from dist_map_reduce_spark.functions.clustering import (
        connected_components_logn,
    )

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    loops = spark.createDataFrame([(7, 7), (9, 9)], "doc_a long, doc_b long")
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)
        assert connected_components_logn(empty).count() == 0
        assert connected_components_logn(loops).count() == 0
