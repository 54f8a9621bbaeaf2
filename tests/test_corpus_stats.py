"""Unit tests for the round-6 corpus-statistic operators: cross-doc
duplicated n-gram fraction, unigram-LM scoring, and median/MAD
outliers — crafted inputs with hand-computed answers (the oracle
parity in test_parity.py checks the fixtures; these pin semantics).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dist_map_reduce_spark.functions.lm_score import unigram_vocab
from dist_map_reduce_spark.functions.text_dupngrams import doc_ngrams
from dist_map_reduce_spark.operators.stats_robust import mad_outliers


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestDupNgrams:
    def test_ngram_positions(self, spark):
        docs = _docs(spark, ["a b c d e f g h i"])  # 9 words -> 2 8-grams
        grams = doc_ngrams(docs).collect()
        assert [g.gram for g in grams] == [
            "a b c d e f g h",
            "b c d e f g h i",
        ]

    def test_short_doc_has_no_grams(self, spark):
        docs = _docs(spark, ["a b c"])
        assert doc_ngrams(docs).count() == 0

    def test_cross_doc_duplication_only(self, spark):
        shared = "one two three four five six seven eight"
        docs = _docs(
            spark,
            [
                shared + " tailA",  # grams: shared, two..tailA
                shared + " tailB",  # grams: shared, two..tailB
                # repeats its own 8-gram twice but shares nothing:
                # within-doc repetition must NOT count as duplication
                "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8",
            ],
        )
        gd = doc_ngrams(docs).groupBy("doc_id", "gram").agg(
            F.count("*").alias("c")
        )
        gs = gd.groupBy("gram").agg(F.count("*").alias("nd"))
        rows = {
            r.doc_id: (r.tot, r.dup)
            for r in gd.join(gs, "gram")
            .groupBy("doc_id")
            .agg(
                F.sum("c").alias("tot"),
                F.sum(F.when(F.col("nd") > 1, F.col("c")).otherwise(0)).alias(
                    "dup"
                ),
            )
            .collect()
        }
        assert rows[0] == (2, 1)  # shared gram dup, tailA gram unique
        assert rows[1] == (2, 1)
        # doc 2: 9 gram positions, the all-x gram occurs only in doc 2
        assert rows[2] == (9, 0)


class TestUnigramLM:
    def test_vocab_counts(self, spark):
        docs = _docs(spark, ["a a b", "b c"])
        counts = {r.token: r.cnt for r in unigram_vocab(docs).collect()}
        assert counts == {"a": 2, "b": 2, "c": 1}

    def test_rare_tokens_score_lower(self, spark):
        from dist_map_reduce_spark.functions.lm_score import (
            lm_unigram_doc_scores,
        )
        from tests.conftest import SF_SMOKE

        rows = lm_unigram_doc_scores(spark, SF_SMOKE).collect()
        assert all(r.avg_logprob < 0 for r in rows)
        assert all(
            math.isclose(
                r.bits_per_token, -r.avg_logprob / math.log(2), rel_tol=1e-4
            )
            for r in rows
        )


class TestMadOutliers:
    def test_known_outlier(self, spark):
        # nine points at 0..8 plus one at 1000: median 4.5, MAD 2.5,
        # cut 4.4478*2.5=11.12 -> only the 1000 point is outside
        vals = [(float(v), "g") for v in range(9)] + [(1000.0, "g")]
        df = spark.createDataFrame(vals, "value double, grp string")
        r = mad_outliers(df, "value", ["grp"]).collect()[0]
        assert r.med == 4.5
        assert r.mad == 2.5
        assert r.n == 10
        assert r.n_outliers == 1

    def test_groups_are_independent(self, spark):
        vals = [(float(v), "a") for v in range(5)] + [
            (float(v * 100), "b") for v in range(5)
        ]
        df = spark.createDataFrame(vals, "value double, grp string")
        rows = {r.grp: r for r in mad_outliers(df, "value", ["grp"]).collect()}
        assert rows["a"].med == 2.0 and rows["a"].mad == 1.0
        assert rows["b"].med == 200.0 and rows["b"].mad == 100.0
        assert rows["a"].n_outliers == 0 and rows["b"].n_outliers == 0


def test_hashed_gram_path_matches_string_path(spark):
    """The at-scale xxhash64 gram key must produce identical
    duplication statistics on the fixture corpus (no collisions at
    this size; a collision could only overcount n_dup)."""
    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.functions.text_dupngrams import dup_ngram_stats
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    a = sorted(map(tuple, dup_ngram_stats(docs).collect()))
    b = sorted(map(tuple, dup_ngram_stats(docs, hashed=True).collect()))
    assert a == b


class TestSystematicResample:
    def test_copy_counts_match_interval_coverage(self, spark):
        from dist_map_reduce_spark.functions.resample_weighted import (
            systematic_resample,
        )

        # one shard (n_shards=1): doc weights 5, 12, 3, 25 with
        # step 10 -> cum 5,17,20,45; points 10,20,30,40 covered by
        # docs 2 (10), 3 (20), 4 (30, 40)
        df = spark.createDataFrame(
            [(0, 5), (1, 12), (2, 3), (3, 25)], "doc_id long, w long"
        )
        got = {
            r.doc_id: r.n_copies
            for r in systematic_resample(
                df, "w", "doc_id", step=10, n_shards=1
            ).collect()
        }
        assert got == {0: 0, 1: 1, 2: 1, 3: 2}

    def test_total_copies_equals_floor_of_shard_totals(self, spark):
        from pyspark.sql import functions as F

        from dist_map_reduce_spark import registry
        from tests.conftest import SF_SMOKE

        out = registry.QUERIES["importance_resample_docs"](spark, SF_SMOKE)
        per_shard = (
            out.groupBy("shard")
            .agg(
                F.sum("n_copies").alias("copies"),
                F.max("cum_w").alias("total_w"),
            )
            .collect()
        )
        # telescoping: sum of per-doc coverage = floor(total/step)
        for r in per_shard:
            assert r.copies == r.total_w // 997


class TestCurationExt:
    def test_lexical_cosine_identical_docs_score_one(self, spark):
        """Two identical docs sharing mid-frequency shingles must
        score exactly 1.0; a doc with no shared mid-df shingle must
        not pair."""
        import pandas as pd

        from dist_map_reduce_spark.functions.curation_ext import (
            lexical_cosine_pairs,
        )
        from dist_map_reduce_spark.functions import curation_ext as ce

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "alpha beta gamma delta epsilon",
                        "alpha beta gamma delta epsilon",
                        "zeta eta theta iota kappa",
                    ],
                }
            )
        )
        # clear the slot store around the injection (ADVICE r16): the
        # lexcos postings slot is keyed by the sf_dir string, and the
        # "unused" key must neither read another injected table's
        # stale postings nor leave ours behind for a later test
        from dist_map_reduce_spark import caching

        orig = ce.load_table
        ce.load_table = lambda s, d, n: docs
        caching.clear()
        try:
            rows = lexical_cosine_pairs(spark, "unused").collect()
        finally:
            ce.load_table = orig
            caching.clear()
        assert [(r.doc_a, r.doc_b, r.cos) for r in rows] == [(1, 2, 1.0)]

    def test_dup_span_islands(self, spark):
        """A doc sharing one contiguous 9-word block with another doc
        yields a 2-gram run (= block_len - 8 + 1) and span of 9
        words; an unrelated doc reports 0."""
        import pandas as pd

        from dist_map_reduce_spark.functions.curation_ext import (
            text_dup_span_longest,
        )
        from dist_map_reduce_spark.functions import curation_ext as ce

        block = " ".join(f"w{i}" for i in range(9))
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        block + " tail1 tail2 tail3 tail4 tail5 tail6 tail7",
                        "head1 head2 head3 head4 head5 head6 head7 " + block,
                        "solo1 solo2 solo3 solo4 solo5 solo6 solo7 solo8 solo9",
                    ],
                }
            )
        )
        orig = ce.load_table
        ce.load_table = lambda s, d, n: docs
        try:
            out = {
                r.doc_id: (r.max_dup_gram_run, r.max_dup_span_words)
                for r in text_dup_span_longest(spark, "unused").collect()
            }
        finally:
            ce.load_table = orig
        assert out[1] == (2, 9)
        assert out[2] == (2, 9)
        assert out[3] == (0, 0)

    def test_per_source_cap_deterministic_cut(self, spark):
        """Ties on n_chars break by doc_id, so the kept set is
        stable."""
        import pandas as pd

        from dist_map_reduce_spark.functions.curation_ext import (
            CAP,
            per_source_doc_cap,
        )
        from dist_map_reduce_spark.functions import curation_ext as ce

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": list(range(15)),
                    "source": ["s"] * 15,
                    "n_chars": [100] * 15,  # all tied
                }
            )
        )
        orig = ce.load_table
        ce.load_table = lambda s, d, n: docs
        try:
            kept = sorted(
                r.doc_id
                for r in per_source_doc_cap(spark, "unused").collect()
            )
        finally:
            ce.load_table = orig
        assert kept == list(range(CAP))

    def test_kl_divergence_identical_distribution_is_zero(self, spark):
        """A source whose token distribution equals the corpus
        distribution has KL exactly 0 after rounding."""
        import pandas as pd

        from dist_map_reduce_spark.functions.curation_ext import (
            source_kl_divergence,
        )
        from dist_map_reduce_spark.functions import curation_ext as ce

        # both sources have identical distributions {a: 2/3, b: 1/3}
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2],
                    "source": ["s1", "s2"],
                    "text": ["a a b", "a a b"],
                }
            )
        )
        orig = ce.load_table
        ce.load_table = lambda s, d, n: docs
        try:
            out = {
                r.source: (r.kl_vs_corpus, r.n_tokens)
                for r in source_kl_divergence(spark, "unused").collect()
            }
        finally:
            ce.load_table = orig
        assert out == {"s1": (0.0, 3), "s2": (0.0, 3)}


class TestLinkageAndDiff:
    def test_fuzzy_match_identical_and_far_docs(self, spark):
        """Identical docs in one block match at distance 0; docs
        beyond MAX_DIST (or in singleton blocks) never pair."""
        import pandas as pd

        from dist_map_reduce_spark.operators import linkage

        same = "prefix " + "word " * 30
        far = "prefix " + "zzz " * 60
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [same, same, far, "loner unique text here"],
                }
            )
        )
        orig = linkage.load_table
        linkage.load_table = lambda s, d, n: docs
        try:
            rows = {
                (r.doc_a, r.doc_b): r.edit_dist
                for r in linkage.fuzzy_match_pairs(spark, "unused").collect()
            }
        finally:
            linkage.load_table = orig
        assert rows == {(1, 2): 0}

    def test_snapshot_diff_classification(self, spark):
        """Insert/update/delete classification against hand-built
        snapshots (keys chosen to hit every modular branch)."""
        import pandas as pd

        from dist_map_reduce_spark.operators import snapshot_diff

        cust = spark.createDataFrame(
            pd.DataFrame(
                {
                    # 17 -> deleted; 20 -> updated (MOVED); 13 -> also
                    # re-inserted under +1e6; 7 -> unchanged
                    "c_custkey": [17, 20, 13, 7],
                    "c_mktsegment": ["A", "B", "C", "D"],
                }
            )
        )
        orig = snapshot_diff.load_table
        snapshot_diff.load_table = lambda s, d, n: cust
        try:
            out = {
                r.c_custkey: r.change_type
                for r in snapshot_diff.snapshot_diff_customers(
                    spark, "unused"
                ).collect()
            }
        finally:
            snapshot_diff.load_table = orig
        assert out == {
            17: "delete",
            20: "update",
            1000013: "insert",
        }

    def test_weighted_sample_prefers_heavy_docs(self, spark):
        """With K smaller than the corpus, the heavy-token docs are
        overwhelmingly more likely to be sampled: make one doc's
        weight huge and every other tiny — the heavy doc must be in
        the sample (its clock is ~1/w of the light docs')."""
        import pandas as pd

        from dist_map_reduce_spark.functions import sampling_aes

        texts = ["one two"] * 300
        texts[42] = " ".join(["w"] * 100000)
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(300), "text": texts})
        )
        orig = sampling_aes.load_table
        sampling_aes.load_table = lambda s, d, n: docs
        try:
            sampled = {
                r.doc_id
                for r in sampling_aes.weighted_sample_aes(
                    spark, "unused"
                ).collect()
            }
        finally:
            sampling_aes.load_table = orig
        assert 42 in sampled
        assert len(sampled) == sampling_aes.K


from tests.conftest import SF_SMOKE  # noqa: E402


class TestR7Invariants:
    def test_partsupp_cache_reused_across_queries(self, spark):
        """The synthetic partsupp builds once per (session, sf_dir):
        after any partsupp query runs, the next one's plan reads the
        InMemory cache instead of re-aggregating lineitem."""
        from dist_map_reduce_spark import registry

        registry.QUERIES["q16_supplier_part_counts"](spark, SF_SMOKE).count()
        plan = (
            registry.QUERIES["q9_product_type_profit"](spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert ("InMemoryTableScan" in plan
                or "Scan ExistingRDD" in plan), plan  # slot snapshot read

    def test_source_kl_nonnegative(self, spark):
        """KL divergence is non-negative by Gibbs' inequality; a
        negative value would mean a sign/denominator bug."""
        from dist_map_reduce_spark import registry

        rows = registry.QUERIES["source_kl_divergence"](
            spark, SF_SMOKE
        ).collect()
        assert rows
        assert all(r.kl_vs_corpus >= 0.0 for r in rows), rows
        assert all(r.entropy >= 0.0 for r in rows), rows

    def test_equidepth_buckets_balanced(self, spark):
        """Equi-depth buckets hold ~n/8 rows each (exact up to
        boundary ties) and cover all rows exactly once."""
        from dist_map_reduce_spark import registry

        rows = registry.QUERIES["histogram_equidepth_prices"](
            spark, SF_SMOKE
        ).collect()
        total = sum(r.n_rows for r in rows)
        assert len(rows) == 8
        lo, hi = total // 8 - total // 16, total // 8 + total // 16
        assert all(lo <= r.n_rows <= hi for r in rows), rows

    def test_equidepth_approx_close_to_exact(self, spark):
        """The approx_percentile path's raw bucket COUNTS have no
        cross-engine oracle by construction (sketch doubles are
        engine-specific); the count-level check is against the exact
        path on the same data: every bucket count within 2% of the
        corpus, same bucket ids, same row coverage. The registered
        query wraps these counts in the driver-checkable contract —
        every depth_within_band flag must come back true."""
        from dist_map_reduce_spark import registry
        from dist_map_reduce_spark.catalog import load_table
        from dist_map_reduce_spark.operators.histogram import (
            equidepth_approx_counts,
        )

        exact = {
            r.bucket: r.n_rows
            for r in registry.QUERIES["histogram_equidepth_prices"](
                spark, SF_SMOKE
            ).collect()
        }
        approx = {
            r.bucket: r.n_rows
            for r in equidepth_approx_counts(
                load_table(spark, SF_SMOKE, "orders")
            ).collect()
        }
        total = sum(exact.values())
        assert sum(approx.values()) == total  # every row lands once
        assert set(approx) == set(exact)
        assert all(
            abs(approx[k] - v) <= max(2, total * 0.02)
            for k, v in exact.items()
        ), (exact, approx)

        contract = registry.QUERIES["histogram_equidepth_approx"](
            spark, SF_SMOKE
        ).collect()
        assert len(contract) == 8
        assert all(r.depth_within_band for r in contract), contract

    def test_quality_logreg_training_recovers_teacher_boundary(self, spark):
        """Distributed batch-GD logistic regression must fit: against
        a median-split teacher labeling (linear in the same features,
        hence learnable), loss drops >=5x from ln(2), the recovered
        decision boundary agrees with the teacher on >=93% of docs,
        and every learned weight carries the teacher's sign."""
        from pyspark.sql import functions as F

        from dist_map_reduce_spark.catalog import load_table
        from dist_map_reduce_spark.functions.quality_model import (
            quality_logit,
            score_with_weights,
            train_quality_logreg,
        )

        docs = load_table(spark, SF_SMOKE, "documents")
        tl = quality_logit(docs).select("doc_id", "logit")
        med = tl.agg(F.expr("percentile(logit, 0.5)").alias("m")).collect()[
            0
        ].m
        docs_t = docs.join(
            tl.select(
                "doc_id", (F.col("logit") > med).cast("double").alias("t")
            ),
            "doc_id",
        )
        w, hist = train_quality_logreg(docs_t, F.col("t"), iters=40, lr=1.0)
        assert hist[0] > 0.69 and hist[-1] < hist[0] / 5
        n = docs_t.count()
        acc = (
            score_with_weights(docs_t, w)
            .join(docs_t.select("doc_id", "t"), "doc_id")
            .filter(F.col("keep").cast("double") == F.col("t"))
            .count()
            / n
        )
        assert acc >= 0.93, (acc, w)
        # teacher direction: +ttr, +awl, +stop_frac, -len_k
        assert w["ttr"] > 0 and w["awl"] > 0 and w["stop_frac"] > 0
        assert w["len_k"] < 0

    def test_pack_ffd_no_straddle_and_beats_next_fit(self, spark):
        """FFD packing: no bin over budget (oversize docs alone),
        every doc packed exactly once, deterministic across runs, and
        total bins <= a naive next-fit baseline."""
        from dist_map_reduce_spark.catalog import load_table
        from dist_map_reduce_spark.functions.packing import (
            _PACK_BUDGET,
            pack_ffd,
        )

        docs = load_table(spark, SF_SMOKE, "documents")
        out = pack_ffd(docs).collect()
        assert len(out) == docs.count()
        for r in out:
            assert r.offset_in_bin >= 0
        singles = {}
        for r in out:
            singles.setdefault((r.shard, r.bin_id), []).append(r.n_tok)
        for members in singles.values():
            if sum(members) > _PACK_BUDGET:
                assert len(members) == 1  # oversize doc alone
        # determinism
        out2 = pack_ffd(docs).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
        # FFD uses no more bins than next-fit in doc_id order
        import collections

        by_shard = collections.defaultdict(list)
        for r in sorted(out, key=lambda r: r.doc_id):
            by_shard[r.shard].append(r.n_tok)
        nf_bins = 0
        for toks in by_shard.values():
            cap = 0
            for n in toks:
                if n > cap:
                    nf_bins += 1
                    cap = _PACK_BUDGET
                cap -= min(n, _PACK_BUDGET)
        ffd_bins = len(singles)
        assert ffd_bins <= nf_bins
