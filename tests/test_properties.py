"""Property-based tests (hypothesis) for the composed operators whose
semantics we hand-built: generic as-of join and sessionization —
plus deterministic behavioral properties of the MinHash/LSH stack
(S-curve recall, hot-key-cap no-op on fixtures).
Reference strategy per SURVEY.md §5.2 — randomized inputs, compare
against an independent straightforward implementation.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from dist_map_reduce_spark.operators.timeseries import asof_join
from tests.conftest import SF_SMOKE

_ts = st.integers(min_value=0, max_value=10_000)
_key = st.integers(min_value=0, max_value=3)

_events = st.lists(st.tuples(_key, _ts), min_size=1, max_size=25)


def _to_time(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@settings(max_examples=12, deadline=None)
@given(left=_events, right=_events)
def test_asof_join_matches_naive(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, _to_time(t), i) for i, (k, t) in enumerate(left)],
        "k int, lts timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, _to_time(t), float(t)) for k, t in right],
        "k int, rts timestamp, rv double",
    )
    got = {
        r.lid: r.rv_asof
        for r in asof_join(ldf, rdf, "k", "lts", "rts", "rv", "rv_asof").collect()
    }
    # naive: per left row, max rv among right rows (same key, rts <= lts);
    # rv == seconds, so the latest rts has the max rv only if times are
    # unique per key — use max(rts) then its rv; ties in rts share rv.
    for i, (k, t) in enumerate(left):
        cands = [rt for rk, rt in right if rk == k and rt <= t]
        expected = float(max(cands)) if cands else None
        assert got[i] == expected, (i, k, t, got[i], expected)


@settings(max_examples=10, deadline=None)
@given(gaps=st.lists(st.integers(min_value=1, max_value=1200), min_size=1, max_size=30))
def test_session_window_matches_gap_islands(spark, gaps):
    """session_window(10 min) must equal the classic lag/cumsum
    islands on any monotone event sequence."""
    from pyspark.sql import functions as F

    times, acc = [], 0
    for g in gaps:
        acc += g
        times.append(acc)
    df = spark.createDataFrame(
        [(1, _to_time(t)) for t in times], "user_id int, ts timestamp"
    )
    spark_sessions = (
        df.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("s"), "n")
        .collect()
    )
    got = sorted((r.s, r.n) for r in spark_sessions)

    # islands reference implementation in plain python
    sessions, start, n = [], times[0], 1
    for prev, cur in zip(times, times[1:]):
        # strictly greater: session_window MERGES an event at exactly
        # gap distance (hypothesis-found boundary, gaps=[1, 600])
        if cur - prev > 600:
            sessions.append((start, n))
            start, n = cur, 1
        else:
            n += 1
    sessions.append((start, n))
    expected = sorted((_to_time(s), n) for s, n in sessions)
    assert got == expected


def _band_pairs(spark, docs_df):
    """Candidate pairs via the same banding used by the engine."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.functions.dedup import minhash_bands

    bands = minhash_bands(docs_df)
    a, b = bands.alias("a"), bands.alias("b")
    return {
        (r.doc_a, r.doc_b)
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }


def test_minhash_scurve_recall(spark):
    """16 hashes in 4 bands of 4: pairs with shingle-Jaccard ~0.9
    must almost always be candidates; disjoint pairs never (the LSH
    S-curve, deterministic given the fixed md5 hash family)."""
    n_pairs, n_words = 25, 50
    rows = []
    for i in range(n_pairs):
        words = [f"p{i}w{j}" for j in range(n_words)]
        near = list(words)
        near[20] = f"p{i}REPL"  # 1 of 50 words → shingle J ≈ 0.88
        rows.append((2 * i, " ".join(words)))
        rows.append((2 * i + 1, " ".join(near)))
        # disjoint control doc: shares nothing with anyone
        rows.append((10_000 + i, " ".join(f"x{i}w{j}" for j in range(n_words))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = _band_pairs(spark, docs)
    near_hits = sum((2 * i, 2 * i + 1) in pairs for i in range(n_pairs))
    false_pairs = {p for p in pairs if p not in {(2 * i, 2 * i + 1) for i in range(n_pairs)}}
    assert near_hits >= int(0.8 * n_pairs), f"recall {near_hits}/{n_pairs}"
    assert not false_pairs, f"disjoint docs became candidates: {false_pairs}"


def test_hotkey_caps_are_noop_on_fixture(spark):
    """The MAX_KEY_DOCS caps in the dedup self-joins must not touch
    the fixture corpora (no stop-shingle pathology there) — the
    fixture results are therefore identical with and without the
    caps, while the caps bound worst-case pair explosion at scale."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.functions.dedup import (
        MAX_KEY_DOCS,
        minhash_bands,
        shingles,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    max_bucket = (
        minhash_bands(docs)
        .groupBy("band_id", "band_key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    max_df = shingles(docs).groupBy("shingle").count().agg(F.max("count")).first()[0]
    assert max_bucket <= MAX_KEY_DOCS
    assert max_df <= MAX_KEY_DOCS

    from dist_map_reduce_spark.functions.similarity import (
        MAX_BUCKET_VECS,
        bucket_col,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    max_lsh_bucket = (
        emb.groupBy(bucket_col("embedding").alias("b"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_lsh_bucket <= MAX_BUCKET_VECS


def test_hotkey_cap_drops_overcap_keys(spark):
    """Directly exercise the cap: a key shared by > MAX_KEY_DOCS docs
    must produce NO pairs, while an under-cap key still does."""
    from dist_map_reduce_spark.functions.dedup import (
        MAX_KEY_DOCS,
        _pairs_within_keys,
    )

    hot = [(i, "hot") for i in range(MAX_KEY_DOCS + 1)]
    cold = [(i, "cold") for i in range(3)]
    df = spark.createDataFrame(hot + cold, ["doc_id", "key"])
    pairs = _pairs_within_keys(df, ["key"]).collect()
    # only the 3-doc cold key pairs survive: C(3,2) = 3
    assert len(pairs) == 3
    assert all(p.doc_a < p.doc_b for p in pairs)


def test_capped_postings_drops_overcap_shingles(spark):
    """Same for the n-gram inverted index builder."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.functions.dedup import (
        MAX_KEY_DOCS,
        _capped_postings,
    )

    rows = [(i, "stop shingle") for i in range(MAX_KEY_DOCS + 1)]
    rows += [(i, "rare shingle") for i in range(5)]
    sh = spark.createDataFrame(rows, ["doc_id", "shingle"])
    got = _capped_postings(sh).select(F.size("ds").alias("k")).collect()
    assert [r.k for r in got] == [5]


def test_scd2_versions_partition_time(spark):
    """SCD2 invariants: per key, exactly one current row; version
    ranges chain (each valid_to equals the next valid_from) with no
    gaps or overlaps."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark import registry

    df = registry.QUERIES["scd2_customer_segments"](spark, SF_SMOKE)
    cur = (
        df.groupBy("c_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
        .filter(F.col("n_cur") != 1)
        .count()
    )
    assert cur == 0, "a key has != 1 current row"
    from pyspark.sql import Window as W

    w = W.partitionBy("c_custkey").orderBy("valid_from")
    chained = df.withColumn("next_from", F.lead("valid_from").over(w)).filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert chained.count() == 0, "version ranges do not chain"


def test_sequence_packing_offsets_are_contiguous(spark):
    """Packing invariant: within a shard, each document's start_tok
    equals the previous document's start_tok + n_tok (doc_id order)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dist_map_reduce_spark import registry

    df = registry.QUERIES["sequence_pack_docs"](spark, SF_SMOKE)
    w = W.partitionBy("shard").orderBy("doc_id")
    broken = (
        df.withColumn("prev_end", F.lag(F.col("start_tok") + F.col("n_tok")).over(w))
        .filter(
            F.coalesce(F.col("prev_end"), F.lit(0)) != F.col("start_tok")
        )
        .count()
    )
    assert broken == 0


def test_pagerank_conserves_mass(spark):
    """On a dangling-free graph (symmetric edges → every node has
    out-degree ≥ 1), PageRank conserves total mass: after any number
    of iterations the ranks sum to 1 (0.15 teleport + 0.85 of the
    previous total). A lineage or per-edge-contribution bug breaks
    this immediately."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark import registry

    df = registry.QUERIES["pagerank_dedup_graph"](spark, SF_SMOKE)
    total = df.agg(F.sum("pagerank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6, total


@settings(max_examples=10, deadline=None)
@given(
    changes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 50)),
        min_size=0,
        max_size=10,
        unique_by=lambda c: c,  # unique (key, ts): SCD2 versions
        # must have distinct timestamps per key
    )
)
def test_scd2_history_properties(spark, changes):
    """Generic scd2_history invariants on random change logs: row
    count = base + changes; per key exactly one open (current)
    version; ranges chain in timestamp order."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.operators.scd import scd2_history

    keys = [0, 1, 2, 3]
    base = spark.createDataFrame(
        [(k, f"seg{k}", _to_time(0)) for k in keys],
        "k int, attr string, valid_from timestamp",
    )
    ch = spark.createDataFrame(
        [(k, f"chg{t}", _to_time(t)) for k, t in changes],
        "k int, attr string, valid_from timestamp",
    )
    hist = scd2_history(base, ch, "k", "valid_from").collect()
    assert len(hist) == len(keys) + len(changes)
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in rows if r.is_current) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from, (k, a, b)

def test_neardup_bucket_cap_drops_overcap_bucket(spark, tmp_path):
    """An over-cap LSH bucket (a degenerate cluster of identical
    vectors) must contribute NO near-dup pairs, while an under-cap
    bucket still does — the windowed hot-bucket cap mirrors
    dedup's MAX_KEY_DOCS policy."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.functions.similarity import (
        MAX_BUCKET_VECS,
        bucket_col,
        dedup_embedding_neardup,
    )

    a_vec = [1.0] * 64
    b_vec = [-1.0] * 64
    rows = [(i, a_vec, 0) for i in range(MAX_BUCKET_VECS + 1)]
    rows += [(1000, b_vec, 1), (1001, b_vec, 1)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    # precondition: the two clusters land in different buckets
    buckets = {
        r.b
        for r in df.select(bucket_col("embedding").alias("b")).distinct().collect()
    }
    assert len(buckets) == 2
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    pairs = dedup_embedding_neardup(spark, str(tmp_path)).collect()
    # only the 2-vector cold bucket pairs survive: C(2,2) = 1, cos 1.0
    assert [(p.vec_a, p.vec_b, p.cos) for p in pairs] == [(1000, 1001, 1.0)]


def test_n_planes_scales_with_corpus():
    """Plane count grows log2 with corpus size (fixed planes make
    probe cost linear in the corpus), floored at the fixture pin."""
    import math

    from dist_map_reduce_spark.functions.similarity import N_PLANES, n_planes_for

    assert n_planes_for(500) == N_PLANES
    assert n_planes_for(1024) == N_PLANES
    # 10⁹ vectors / 1024-target → 2²⁰ buckets
    assert n_planes_for(10**9) == 20
    assert n_planes_for(10**12) == 30
    sizes = [10**k for k in range(2, 13)]
    planes = [n_planes_for(n) for n in sizes]
    assert planes == sorted(planes)
    for n, p in zip(sizes, planes):
        if p > N_PLANES:
            assert n / 2**p <= 1024 < n / 2 ** (p - 1)


def test_ann_lsh_scaled_matches_fixture_pin_at_small_corpus(spark):
    """At fixture scale n_planes_for keeps the 8-plane layout, so the
    scaled entry point returns the registered query's exact result;
    with more planes it still runs and respects the top-k contract."""
    from dist_map_reduce_spark.functions.similarity import (
        ann_lsh_topk_scaled,
        similarity_ann_lsh_topk,
    )

    pinned = sorted(
        map(tuple, similarity_ann_lsh_topk(spark, SF_SMOKE).collect())
    )
    scaled = sorted(map(tuple, ann_lsh_topk_scaled(spark, SF_SMOKE, 500).collect()))
    assert scaled == pinned

    wide = ann_lsh_topk_scaled(spark, SF_SMOKE, 500, target_bucket_size=4).collect()
    per_query: dict[int, int] = {}
    for r in wide:
        assert 0 <= r.query_id < 5
        per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
    assert all(n <= 5 for n in per_query.values())


def test_simhash_banding_exact_under_cap(spark):
    """Independent re-derivation of simhash_hamming_neardup's CAPPED
    semantics: brute-force the fingerprints in Python — the result
    must be exactly {pairs with Hamming<=3 sharing >=1 under-cap
    band}, and pigeonhole guarantees banding misses nothing among
    under-cap docs (unlike the MinHash caps, THIS cap is active on
    the word-soup fixtures — the degenerate-cluster case it exists
    for; see SCALE.md cap policy)."""
    from collections import defaultdict

    from dist_map_reduce_spark import registry
    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.functions.dedup_common import MAX_KEY_DOCS
    from dist_map_reduce_spark.functions.dedup_simhash import (
        BAND_BITS,
        MAX_HAMMING,
        N_BANDS,
        simhash32,
    )

    fp = {
        r.doc_id: r.simhash32
        for r in simhash32(load_table(spark, SF_SMOKE, "documents")).collect()
    }
    buckets = defaultdict(list)
    mask = (1 << BAND_BITS) - 1
    for d, f in fp.items():
        for i in range(N_BANDS):
            buckets[(i, (f >> (BAND_BITS * i)) & mask)].append(d)
    # the cap must be ACTIVE on this fixture (the behavior under test)
    assert max(len(v) for v in buckets.values()) > MAX_KEY_DOCS
    expected = set()
    for docs in buckets.values():
        if len(docs) > MAX_KEY_DOCS:
            continue
        docs = sorted(docs)
        for ii in range(len(docs)):
            for jj in range(ii + 1, len(docs)):
                a, b = docs[ii], docs[jj]
                if bin(fp[a] ^ fp[b]).count("1") <= MAX_HAMMING:
                    expected.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["simhash_hamming_neardup"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expected and len(got) > 0
    # pigeonhole: any Hamming<=MAX_HAMMING pair shares a band exactly
    # (N_BANDS bands, <=N_BANDS-1 differing bits can touch <=N_BANDS-1
    # bands) — spot-check on the found pairs
    for a, b in list(got)[:50]:
        assert any(
            (fp[a] >> (BAND_BITS * i)) & mask == (fp[b] >> (BAND_BITS * i)) & mask
            for i in range(N_BANDS)
        )


def test_resample_spine_invariants(spark):
    """Structural invariants of the gap-filled resample: per-series
    contiguous 5-min spine, observed counts sum to the raw event
    count, empty buckets carry the last observed sum (LOCF non-null
    everywhere after the first bucket, which is observed by
    construction)."""
    from collections import defaultdict

    from dist_map_reduce_spark import registry
    from dist_map_reduce_spark.catalog import load_table

    rows = registry.QUERIES["events_resample_5m_locf"](
        spark, SF_SMOKE
    ).collect()
    total_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n for r in rows) == total_events
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.bucket_start)
        # contiguous 5-minute grid
        for a, b in zip(series, series[1:]):
            assert (b.bucket_start - a.bucket_start).total_seconds() == 300
        # first bucket holds the series' first event; LOCF therefore
        # never leaves a null behind it
        assert series[0].n > 0
        assert all(r.sum_locf is not None for r in series)
        # gaps must actually exist for the fill to mean anything
        assert any(r.n == 0 for r in series)
        # LOCF: an empty bucket repeats the previous bucket's fill
        for a, b in zip(series, series[1:]):
            if b.n == 0:
                assert b.sum_locf == a.sum_locf


def test_resample_interp_matches_independent_recompute(spark):
    """Linear-interp gap fill re-derived independently in Python from
    the observed buckets: observed buckets keep their sum, interior
    gaps lie on the straight line between neighbors, tail gaps LOCF."""
    from dist_map_reduce_spark.operators.timeseries_fill import (
        _filled_spine,
        resample_5m_interp,
    )

    got = {
        (r.event_type, r.bucket_start): (r.n, r.sum_interp)
        for r in resample_5m_interp(spark, SF_SMOKE).collect()
    }
    spine = _filled_spine(spark, SF_SMOKE).collect()
    series: dict[str, list] = {}
    for r in sorted(spine, key=lambda r: (r.event_type, r.bucket)):
        series.setdefault(r.event_type, []).append(r)
    n_checked = 0
    for et, rows in series.items():
        obs = [(k, r.s) for k, r in enumerate(rows) if r.n_obs is not None]
        for k, r in enumerate(rows):
            n, val = got[(et, r.bucket)]
            if r.n_obs is not None:
                assert (n, val) == (r.n_obs, r.s)
                continue
            assert n == 0
            prev = max((o for o in obs if o[0] < k), key=lambda o: o[0])
            nxt = [o for o in obs if o[0] > k]
            if not nxt:
                expect = prev[1]  # tail LOCF
            else:
                nx = min(nxt, key=lambda o: o[0])
                expect = prev[1] + (nx[1] - prev[1]) * (
                    (k - prev[0]) / (nx[0] - prev[0])
                )
            assert val == expect, (et, r.bucket, val, expect)
            n_checked += 1
    assert n_checked > 0  # gaps existed and were verified


def test_abc_classification_invariants(spark):
    """ABC classification re-derived independently: rank customers by
    account balance within market segment; cumulative shares must be
    monotone per segment, class boundaries at 80%/95% inclusive, and
    every segment's top entity is class A."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.operators.contribution import abc_classification

    cust = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    out = abc_classification(
        cust, "c_acctbal", "c_custkey", by=["c_mktsegment"]
    ).collect()
    from collections import defaultdict

    by_seg = defaultdict(list)
    for r in out:
        by_seg[r.c_mktsegment].append(r)
    assert len(by_seg) > 1
    for rows in by_seg.values():
        rows.sort(key=lambda r: (-r.c_acctbal, r.c_custkey))
        total = sum(r.c_acctbal for r in rows)
        cum = 0.0
        for r in rows:
            cum += r.c_acctbal
            expect_share = cum / total
            assert abs(r.cum_share - expect_share) < 1e-9
            prev_share = expect_share - r.c_acctbal / total
            expect_class = (
                "A" if prev_share < 0.80
                else "B" if prev_share < 0.95 else "C"
            )
            assert r.abc_class == expect_class
        assert rows[0].abc_class == "A"
        assert rows[-1].abc_class == "C"
        assert abs(rows[-1].cum_share - 1.0) < 1e-9


def test_abc_classification_pareto_top_entity_is_A(spark):
    """On genuinely skewed data the entity covering 96% of the
    measure must be class A — the threshold-crossing row belongs to
    the class it completes (the bug an inclusive-share test misses
    on near-uniform fixtures)."""
    from dist_map_reduce_spark.operators.contribution import abc_classification

    df = spark.createDataFrame(
        [("w", 96.0), ("x", 2.0), ("y", 1.0), ("z", 1.0)], "k string, m double"
    )
    got = {r.k: r.abc_class for r in abc_classification(df, "m", "k").collect()}
    assert got == {"w": "A", "x": "C", "y": "C", "z": "C"}


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_morton_interleave_is_bijective(spark, pairs):
    """interleave_bits is a bijection on 16-bit pairs: distinct
    (x, y) -> distinct keys, and de-interleaving the key's even/odd
    bits recovers (x, y) exactly."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.operators.zorder import interleave_bits

    df = spark.createDataFrame(pairs, "x long, y long")
    rows = df.select(
        "x", "y", interleave_bits(F.col("x"), F.col("y")).alias("z")
    ).collect()
    assert len({r.z for r in rows}) == len(pairs)
    for r in rows:
        x = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        y = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x, y) == (r.x, r.y)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=30,
    )
)
def test_bucketize_is_monotone_and_total(spark, vals):
    """Histogram bucket ids are monotone in the value and always land
    in [0, n-1] — no value escapes the clamp."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.operators.histogram import bucketize

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select(
        "v", bucketize(F.col("v"), 0.0, 100.0, 10).alias("b")
    ).collect()
    assert all(0 <= r.b <= 9 for r in rows)
    by_v = sorted(rows, key=lambda r: r.v)
    assert all(a.b <= b.b for a, b in zip(by_v, by_v[1:]))


@settings(max_examples=8, deadline=None)
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    )
)
def test_triangle_count_matches_brute_force(spark, edges):
    """Degree-ordered adjacency-intersect triangle count equals the
    O(n^3) brute force on arbitrary small graphs (including dense,
    star, and disconnected shapes that stress the orientation and
    empty-intersection paths)."""
    from itertools import combinations

    from dist_map_reduce_spark.operators.sequences import (
        triangle_count,
        undirected_edges,
    )

    undirected = {tuple(sorted(e)) for e in edges}
    verts = sorted({v for e in undirected for v in e})
    expected = sum(
        1
        for a, b, c in combinations(verts, 3)
        if (a, b) in undirected and (b, c) in undirected and (a, c) in undirected
    )
    df = spark.createDataFrame(list(undirected), "s1 long, s2 long")
    got = (
        triangle_count(undirected_edges(df, "s1", "s2"))
        .collect()[0]
        .n_triangles
    )
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_matches_brute_force(spark, pts):
    """Two-phase skyline equals the O(n^2) dominance scan on
    arbitrary point sets (duplicates, ties on either axis, single
    points) — partitioning the local pass must never drop a
    frontier point."""
    from dist_map_reduce_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    uniq = set(pts)
    expected = {
        (x, y)
        for x, y in uniq
        if not any(
            (a >= x and b >= y and (a > x or b > y)) for a, b in uniq
        )
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "fast", "slow", "cat", "dog"]),
            min_size=3,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=6,
    )
)
def test_lexical_cosine_matches_brute_force(spark, texts):
    """Postings-based lexical cosine equals a direct Python
    computation of cosine over the df-banded 3-gram-shingle vectors
    (exercises duplicate docs, saturated shingles above the df cut,
    and docs with no qualifying shingle)."""
    import math
    from collections import Counter
    from itertools import combinations

    import pandas as pd

    from dist_map_reduce_spark.functions import curation_ext as ce

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    from dist_map_reduce_spark import caching

    orig = ce.load_table
    ce.load_table = lambda s, d, n: docs
    # the injected docs change under a CONSTANT slot key ("unused"),
    # which violates caching.py's staleness contract (the key is
    # assumed to fully determine the data) — clear the tracked slots
    # around each hypothesis case so lexcos_postings rebuilds
    caching.clear()
    try:
        got = {
            (r.doc_a, r.doc_b): r.cos
            for r in ce.lexical_cosine_pairs(spark, "unused").collect()
        }
    finally:
        ce.load_table = orig
        caching.clear()

    def shingles(t):
        w = t.split(" ")
        return [
            " ".join(w[i : i + ce.COS_N])
            for i in range(len(w) - ce.COS_N + 1)
        ]

    tf = {i: Counter(shingles(t)) for i, t in enumerate(texts)}
    df = Counter(term for c in tf.values() for term in c)
    band = {t for t, d in df.items() if 2 <= d <= ce.MAX_DF}
    ftf = {i: {t: c for t, c in cnt.items() if t in band} for i, cnt in tf.items()}
    expected = {}
    for a, b in combinations(sorted(ftf), 2):
        dot = sum(ftf[a][t] * ftf[b][t] for t in ftf[a].keys() & ftf[b].keys())
        if dot == 0:
            continue
        na, nb = (sum(v * v for v in ftf[x].values()) for x in (a, b))
        cos = round(dot / math.sqrt(float(na) * float(nb)), 6)
        if cos >= ce.MIN_COS:
            expected[(a, b)] = cos
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_logn_components_match_union_find_random(spark, edges):
    """Alternating large-star/small-star must agree with a union-find
    reference on arbitrary random graphs (multi-edges, self-loops,
    many components, any shape)."""
    from dist_map_reduce_spark.functions.clustering import (
        connected_components_logn,
    )

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.component
        for r in connected_components_logn(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
            nodes.update((a, b))
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    expect = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            expect[n] = m
    assert got == expect


@settings(max_examples=200, deadline=None)
@given(
    syms=st.lists(
        st.sampled_from(["a", "b", "c", "ab", "bc", "aa"]),
        min_size=1,
        max_size=14,
    ),
    pa=st.sampled_from(["a", "b", "c", "ab", "bc", "aa"]),
    pb=st.sampled_from(["a", "b", "c", "ab", "bc", "aa"]),
)
def test_wrapped_replace_is_textbook_bpe_merge_random(syms, pa, pb):
    """The separator-wrapped string replace (the BPE merge both
    engines execute — str.replace shares their left-to-right
    non-overlapping semantics) must equal the textbook greedy merge
    on arbitrary symbol sequences, including overlapping runs and
    multi-char symbols that embed the pair's text."""
    from tests.test_bpe_encode import _reference_bpe_merge

    sep = "\x1f"
    wrapped = "".join(f"{sep}{s}{sep}" for s in syms)
    merged = wrapped.replace(
        f"{sep}{pa}{sep}{sep}{pb}{sep}", f"{sep}{pa}{pb}{sep}"
    )
    expect = _reference_bpe_merge(syms, (pa, pb))
    assert merged == "".join(f"{sep}{s}{sep}" for s in expect)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bigram_lm_matches_naive(spark, texts):
    """Interpolated bigram LM vs an independent pure-Python model on
    random small corpora: same doc set (docs with <2 tokens produce
    no row), same n_bigrams, scores equal at the 6-dp round."""
    import math

    from dist_map_reduce_spark.functions.lm_bigram import (
        LAMBDA,
        bigram_scores,
    )

    docs = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    got = {
        r.doc_id: r
        for r in bigram_scores(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }

    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    for _, ws in enumerate(texts):
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    total = sum(uni.values())

    expect_ids = {i for i, ws in enumerate(texts) if len(ws) >= 2}
    assert set(got) == expect_ids
    for i, ws in enumerate(texts):
        if len(ws) < 2:
            continue
        # group to per-doc (w1, w2) counts first — the engine's sum
        # order; per-pair-type c * ln(p) matches the plan exactly
        pairs: dict[tuple[str, str], int] = {}
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
        lp = sum(
            c
            * math.log(
                LAMBDA * (big[p] / ctx[p[0]])
                + (1 - LAMBDA) * (uni[p[1]] / total)
            )
            for p, c in pairs.items()
        )
        n = sum(pairs.values())
        assert got[i].n_bigrams == n
        assert math.isclose(
            got[i].avg_logprob, round(lp / n, 6), abs_tol=2e-6
        ), (i, got[i].avg_logprob, lp / n)


def test_cdc_merge_invariants(spark):
    """MERGE algebra over the derived change set: result keys =
    (base − deletes) ∪ inserts; every updated row carries exactly
    +100.0; kept rows are untouched; inserted keys are the reserved
    negatives."""
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.operators.delta_merge import (
        _N_CDC_BUCKETS,
        cdc_merge_upsert_orders,
    )

    sf = SF_SMOKE
    merged = {
        r.o_orderkey: r for r in cdc_merge_upsert_orders(spark, sf).collect()
    }
    base = {
        r.o_orderkey: r
        for r in load_table(spark, sf, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cdc:"),
                                F.col("o_orderkey").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % _N_CDC_BUCKETS
            ).alias("bucket"),
        )
        .collect()
    }
    expect_deleted = {k for k, r in base.items() if r.bucket == 2}
    expect_updated = {k for k, r in base.items() if r.bucket in (0, 1)}
    expect_inserted = {-k for k, r in base.items() if r.bucket == 3}
    assert set(merged) == (set(base) - expect_deleted) | expect_inserted
    for k, r in merged.items():
        if k < 0:
            assert r.src == "inserted"
            assert r.o_totalprice == base[-k].o_totalprice
        elif k in expect_updated:
            assert r.src == "updated"
            assert r.o_totalprice == base[k].o_totalprice + 100.0
        else:
            assert r.src == "kept"
            assert r.o_totalprice == base[k].o_totalprice


def test_ccnet_buckets_partition_and_order(spark):
    """The three buckets partition the scored corpus, tercile sizes
    are balanced to within interpolation ties, and mean
    bits-per-token is monotone head < middle < tail (the whole point
    of the partition)."""
    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.functions.lm_bigram import bigram_scores
    from dist_map_reduce_spark.functions.quality_ccnet_buckets import (
        quality_ccnet_buckets,
    )

    sf = SF_SMOKE
    rows = {r.bucket: r for r in quality_ccnet_buckets(spark, sf).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    n_scored = bigram_scores(
        load_table(spark, sf, "documents"), cache_key=sf
    ).count()
    assert sum(r.n_docs for r in rows.values()) == n_scored
    third = n_scored / 3
    for r in rows.values():
        assert abs(r.n_docs - third) <= max(2, 0.02 * n_scored), rows
    assert rows["head"].avg_bpt < rows["middle"].avg_bpt < rows["tail"].avg_bpt
    assert rows["head"].max_bpt <= rows["middle"].min_bpt
    assert rows["middle"].max_bpt <= rows["tail"].min_bpt
