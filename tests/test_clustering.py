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
