"""Approximate and exact-quantile aggregates.

Absent from the reference (SURVEY.md §2.2). The approximate sketches
(HLL++, GK quantiles) are engine-specific — their raw values can't
hash-match a DuckDB oracle — so each approximate query emits an
oracle-checkable CONTRACT instead: scalar columns carrying the exact
answer (computed in the same plan) plus a boolean asserting the
sketch landed within its documented error bound. The booleans are
deterministic given the sketch parameters, so the rows hash-match a
DuckDB oracle that emits the same shape with the boolean constant
true — the sketch is exercised for real AND the result is verifiable.

The exact interpolated percentile matches DuckDB's quantile_cont and
is oracle-checked directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

# percentile_approx accuracy parameter → rank error ≤ 1/_ACCURACY.
_ACCURACY = 10_000
# Contract slack: the approx value must land between the exact
# percentiles at pct ± _RANK_SLACK. 10× the sketch's guaranteed rank
# error, so the contract holds at any scale factor.
_RANK_SLACK = 0.001
_PCTS = (0.5, 0.9, 0.99)


@query(
    "approx_percentile_prices",
    oracle=f"""
    SELECT l_returnflag, pct, true AS within_band, n
    FROM (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag)
    CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in _PCTS)}]) AS pct)
    """,
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile sketch (single pass, mergeable — the
    100 TB path). Contract: one scalar row per (group, quantile); the
    GK sketch's value must land between the exact percentiles at
    pct ± 10× its guaranteed rank error (rank error ≤ 1/accuracy).
    Exploded to scalar columns — nested output crashes the harness
    canonicalizer."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = list(_PCTS)
    lo = [max(p - _RANK_SLACK, 0.0) for p in pcts]
    hi = [min(p + _RANK_SLACK, 1.0) for p in pcts]

    def arr(vals: list[float]) -> str:
        return "array(" + ", ".join(f"{v}D" for v in vals) + ")"

    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", pcts, _ACCURACY).alias("ap"),
        F.expr(f"percentile(l_extendedprice, {arr(lo)})").alias("ex_lo"),
        F.expr(f"percentile(l_extendedprice, {arr(hi)})").alias("ex_hi"),
        F.count("*").alias("n"),
    )
    z = F.arrays_zip(
        F.expr(arr(pcts)).alias("pct"),
        F.col("ap").alias("ap"),
        F.col("ex_lo").alias("lo"),
        F.col("ex_hi").alias("hi"),
    )
    return agg.select("l_returnflag", "n", F.explode(z).alias("s")).select(
        "l_returnflag",
        F.col("s.pct").alias("pct"),
        ((F.col("s.ap") >= F.col("s.lo")) & (F.col("s.ap") <= F.col("s.hi"))).alias(
            "within_band"
        ),
        "n",
    )


@query(
    "approx_count_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           true AS within_3sigma,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count sketch: single pass, fixed memory — the
    scale path when exact countDistinct's shuffle is too expensive.
    Contract: |approx − exact| ≤ max(3·rsd·exact, 5), with the exact
    count computed in the same plan (HLL++ standard error = rsd; 3σ
    plus a small absolute floor for tiny groups)."""
    rsd = 0.01
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count("*").alias("n"),
    )
    tol = F.greatest(3 * rsd * F.col("exact_users"), F.lit(5.0))
    return agg.select(
        "event_type",
        "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= tol).alias(
            "within_3sigma"
        ),
        "n",
    )


@query(
    "percentile_exact_event_values",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(min(value), 4)                 AS vmin,
           round(max(value), 4)                 AS vmax
    FROM events
    GROUP BY event_type
    """,
)
def percentile_exact_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`). Exact percentile requires a per-group
    sort — fine for bounded group counts; use percentile_approx for
    unbounded cardinality at scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


@query(
    "approx_topk_words",
    oracle="""
    SELECT word, n, true AS in_sketch
    FROM (
      SELECT word, CAST(count(*) AS BIGINT) AS n
      FROM (
        SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word
        FROM documents
      )
      WHERE word <> ''
      GROUP BY word
      ORDER BY n DESC, word ASC
      LIMIT 10
    )
    """,
)
def approx_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (approx_top_k) with a deterministic
    contract: output the EXACT top-10 words (unique tie-break) plus
    a boolean asserting each appears in the sketch's top-k set —
    both computed in ONE plan (the sketch enters as a 1-row
    aggregate crossJoin). The oracle emits the exact top-10 with
    `true`: the sketch tracks far more slots than the fixture
    vocabulary, so containment must hold; at real scale the same
    query degrades to a probabilistic containment check, which is
    the standard way to gate a sketch's usefulness."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", "[^a-zA-Z]+")).alias("word")
    ).filter(F.col("word") != "")
    exact = (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(10)
    )
    # k=30 > the exact cut of 10: when counts TIE at the exact
    # rank-10 boundary, the sketch's own tie-break may order equal
    # counts differently — a wider sketch window absorbs any tie run
    # shorter than 20, keeping the containment contract exact
    sketch = words.agg(
        F.expr("approx_top_k(word, 30)").alias("tk")
    ).select(F.expr("transform(tk, x -> x.item)").alias("sketch_words"))
    return (
        exact
        # 1-row aggregate: scalar-subquery crossJoin, not a data join
        .crossJoin(F.broadcast(sketch))
        .select(
            "word",
            "n",
            F.expr("array_contains(sketch_words, word)").alias("in_sketch"),
        )
    )
