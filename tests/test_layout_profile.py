"""Unit tests for the round-6 layout/profiling/model operators:
Z-order keys, one-pass column profiling, the quality classifier, BPE
merge pairs, and boilerplate n-gram extraction — crafted inputs with
hand-computed answers (oracle parity in test_parity.py checks the
fixtures; these pin semantics and plan shape).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dist_map_reduce_spark.functions.quality_model import quality_logit
from dist_map_reduce_spark.functions.text_boilerplate import boilerplate_ngrams
from dist_map_reduce_spark.functions.text_bpe import bpe_merge_pair_counts
from dist_map_reduce_spark.operators.profiling import profile_table
from dist_map_reduce_spark.operators.zorder import interleave_bits, zorder_layout


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestZorder:
    def _z(self, spark, pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        return [
            r.z
            for r in df.select(
                interleave_bits(F.col("x"), F.col("y")).alias("z")
            ).collect()
        ]

    def test_known_interleavings(self, spark):
        # x bits land at even positions, y bits at odd positions
        assert self._z(
            spark, [(0, 0), (1, 0), (0, 1), (3, 1), (65535, 65535)]
        ) == [0, 1, 2, 0b0111, 2**32 - 1]

    def test_locality_beats_linear_sort(self, spark):
        """On a 16x16 grid cut into 16 equal runs, Z-order bounds the
        span of EVERY dimension (4x4 tiles), while y-major order
        spans all of x in each run — so an x-predicate prunes nothing
        under the single-column sort. That per-dimension bound is the
        file-skipping property the layout exists for."""
        pts = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(pts, "x long, y long")

        def max_spans(keyed):
            rows = keyed.collect()
            rows.sort(key=lambda r: r.k)
            xs, ys = [], []
            for i in range(0, 256, 16):
                run = rows[i : i + 16]
                xs.append(max(r.x for r in run) - min(r.x for r in run) + 1)
                ys.append(max(r.y for r in run) - min(r.y for r in run) + 1)
            return max(xs), max(ys)

        z = max_spans(
            df.select("x", "y", interleave_bits(F.col("x"), F.col("y")).alias("k"))
        )
        linear = max_spans(
            df.select("x", "y", (F.col("y") * 16 + F.col("x")).alias("k"))
        )
        assert z == (4, 4)  # every Z run is a 4x4 tile
        assert linear == (16, 1)  # y-major runs span all of x

    def test_layout_partitions_are_contiguous_segments(self, spark):
        pts = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(pts, "x long, y long")
        laid = zorder_layout(df, interleave_bits(F.col("x"), F.col("y")), 8)
        bounds = (
            laid.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
            .collect()
        )
        spans = sorted((r.lo, r.hi) for r in bounds)
        for (_, hi_prev), (lo, _) in zip(spans, spans[1:]):
            assert hi_prev < lo, "partition curve segments overlap"

    def test_zorder_query_is_shuffle_free(self, spark):
        from tests.conftest import SF_SMOKE
        from dist_map_reduce_spark import registry

        plan = (
            registry.QUERIES["zorder_events_keys"](spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan, plan


class TestProfile:
    def _df(self, spark):
        rows = [
            (1, "a", 1.5, datetime.datetime(2020, 1, 2, 3, 4, 5)),
            (2, None, -0.5, datetime.datetime(2021, 6, 7)),
            (2, "b", None, None),
        ]
        return spark.createDataFrame(
            rows, "k long, s string, v double, ts timestamp"
        )

    def test_exact_profile(self, spark):
        got = {r.col_name: r for r in profile_table(self._df(spark)).collect()}
        assert set(got) == {"k", "s", "v", "ts"}
        assert all(r.n_rows == 3 for r in got.values())
        k, s, v, ts = got["k"], got["s"], got["v"], got["ts"]
        assert (k.n_nulls, k.n_distinct, k.min_num, k.max_num) == (0, 2, 1.0, 2.0)
        assert (s.n_nulls, s.n_distinct, s.min_str, s.max_str) == (1, 2, "a", "b")
        assert (v.n_nulls, v.min_num, v.max_num) == (1, -0.5, 1.5)
        assert (ts.n_nulls, ts.min_str, ts.max_str) == (1, "2020-01-02", "2021-06-07")
        assert k.min_str is None and s.min_num is None

    def test_no_expand_in_either_mode(self, spark):
        """Neither mode may plan Catalyst's RewriteDistinctAggregates
        Expand (the ×N+1 row duplication a naive multi-column
        count(distinct) pays): exact uses the stacked single-distinct
        formulation, approx uses HLL++."""
        df = self._df(spark)
        for mode in (False, True):
            plan = (
                profile_table(df, approx=mode)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "Expand" not in plan, plan
        got = {
            r.col_name: r for r in profile_table(df, approx=True).collect()
        }
        # null/bound stats identical in approx mode; HLL on 3 rows exact
        assert got["k"].n_nulls == 0 and got["k"].n_distinct == 2


class TestQualityModel:
    def test_hand_computed_logit(self, spark):
        # "the the b": n_words=3, distinct=2, ttr=2/3, sum_len=7,
        # awl=7/3, stop_frac=2/3; n_chars column supplied as 9
        docs = spark.createDataFrame(
            [(1, "the the b", 9)], "doc_id long, text string, n_chars long"
        )
        r = quality_logit(docs).collect()[0]
        expected = -2.0 + 3.0 * (2 / 3) + 0.5 * (7 / 3) + 2.0 * (2 / 3) - 0.1 * (9 / 1000)
        assert abs(r.logit - expected) < 1e-6
        assert bool(r.keep) is (expected > 0)

    def test_scoring_is_shuffle_free(self, spark):
        from tests.conftest import SF_SMOKE
        from dist_map_reduce_spark import registry

        plan = (
            registry.QUERIES["quality_logreg_scores"](spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan, plan


class TestBpeMergePairs:
    def test_hand_computed_pairs(self, spark):
        # pre-tokens: "aab" x2 (one per doc) and " aab" tokenizes to
        # [' aab'] -> pairs ' a','aa','ab'; "aab" -> 'aa','ab'
        docs = _docs(spark, ["aab aab", "aab"])
        got = {
            r.pair: r.pair_count
            for r in bpe_merge_pair_counts(docs, top_k=10).collect()
        }
        # tokens: 'aab' (docs: first word of each doc) x2, ' aab' x1
        assert got["aa"] == 3 and got["ab"] == 3 and got[" a"] == 1

    def test_single_char_tokens_contribute_nothing(self, spark):
        docs = _docs(spark, ["a"])
        assert bpe_merge_pair_counts(docs).count() == 0


class TestBoilerplate:
    def test_shared_gram_extracted(self, spark):
        shared = "click here now"
        docs = _docs(
            spark,
            [f"{shared} unique{i} words{i} more{i}" for i in range(10)]
            + ["totally different text here"],
        )
        got = boilerplate_ngrams(docs, df_frac=0.5).collect()
        assert {r.gram for r in got} >= {"click here now"}
        row = next(r for r in got if r.gram == shared)
        assert row.n_docs_with == 10
        # repeated WITHIN one doc must not inflate df
        rep = _docs(spark, ["x y z x y z", "unrelated words entirely"])
        assert boilerplate_ngrams(rep, df_frac=0.6).count() == 0
