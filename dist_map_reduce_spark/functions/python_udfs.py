"""Python UDF surface: UDTF (table function) and grouped-map
applyInPandas — the two remaining rows of the reference's pluggable
mapFunc/reduceFunc generalization (reference: src/worker/worker.go:22-23)
not already covered by mapInPandas / applyInPandasWithState.

Both are THE SLOW PATH (SCALE.md): row-at-a-time UDTFs and per-group
pandas functions exist for semantics the built-ins can't express.
Here they run over bounded inputs (documents = corpus metadata scale;
per-customer groups) to demonstrate the surface; every hot-path
equivalent in this repo uses built-in expressions instead.

All functions/classes passed to Spark are local closures
(pickle-by-value rule — see functions/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "udtf_tokenize_docs",
    oracle="""
    SELECT doc_id, word, length(word) AS word_len
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
      WHERE doc_id < 20
    )
    WHERE word <> ''
    """,
)
def udtf_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (1 row → N rows table function): the reference's
    mapf signature as a first-class lateral-join operator. The
    built-in equivalent is explode(split(...)) — used everywhere
    else; this registers the official UDTF surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, word_len: int")
    class Tokenize:
        def eval(self, text: str):
            for w in (text or "").split(" "):
                if w:
                    yield w, len(w)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.lateralJoin(
        Tokenize(F.col("text").outer())
    ).select("doc_id", "word", "word_len")


@query(
    "grouped_map_zscore_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           -- + 0 normalizes -0.0 → 0.0: DuckDB round keeps the sign
           -- of a tiny negative; Spark's BigDecimal round does not
           round((o_totalprice - avg(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 4) + 0 AS z
    FROM orders
    WHERE o_custkey % 10 = 1
    WINDOW w AS (PARTITION BY o_custkey)
    """,
)
def grouped_map_zscore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the general `reducef`): per-customer
    z-score of order prices, one pandas DataFrame per group in/out.
    The oracle computes the same normalization with window functions —
    the built-in formulation that would be preferred in the hot path.
    (Single-order customers get NULL z on both sides: pandas std of
    one value is NaN, SQL stddev_samp is NULL.)

    Bounded to a deterministic 1-in-10 customer subset, the
    udtf_tokenize_docs discipline: grouped-map pays per-GROUP Python
    round-trip overhead, so running the surface demo over every tiny
    per-customer group was the slowest line in the whole sf0.1 sweep
    (24 s for ~100k two-row groups) while demonstrating nothing the
    subset doesn't. The hot-path formulation IS the oracle's window
    expression; SCALE.md's UDF rule stands."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .where(F.col("o_custkey") % 10 == 1)
    )

    def zscore(pdf):
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        out = pdf[["o_custkey", "o_orderkey"]].copy()
        # raw z; round JVM-side — pandas .round is half-even, the
        # oracle's SQL round is half-away-from-zero
        out["z"] = (pdf["o_totalprice"] - mu) / sd
        return out

    return orders.groupBy("o_custkey").applyInPandas(
        zscore, schema="o_custkey long, o_orderkey long, z double"
    ).withColumn("z", F.round("z", 4))


def window_zscore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in TWIN of ``grouped_map_zscore_orders`` — identical
    result, zero Python. This is the formulation the grouped-map
    demo's docstring tells you to use in a hot path, made executable
    so the advice is testable: avg/stddev_samp window expressions
    stay inside whole-stage codegen, the only exchange is the
    hash-partition on o_custkey, and there is no per-GROUP
    Arrow/pandas round-trip (the overhead that made the unbounded
    grouped-map demo the slowest line of the sf0.1 sweep — ~24 s for
    ~100k tiny groups vs sub-second here). At 100 TB the difference
    is a cluster-sized Python fleet doing serialization work the JVM
    expresses as one window operator.
    tests/test_udf_twins.py pins result equality with the
    grouped-map arm and the no-Python plan shape; PLANS.md
    "grouped-map vs window twin" records the plan comparison."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .where(F.col("o_custkey") % 10 == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
                / F.stddev_samp("o_totalprice").over(w),
                4,
            ).alias("z"),
        )
    )
