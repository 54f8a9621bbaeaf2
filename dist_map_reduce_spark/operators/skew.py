"""Skew-mitigation join strategies.

AQE's skew-join splitting (on by default in session.py) is the first
line of defense; explicit salting is the deterministic fallback when
a key's row count is so extreme that even split shuffle blocks spill,
or when AQE is unavailable (e.g., inside a streaming micro-batch).

``salted_join`` replicates the build side SALT ways and scatters the
probe side across the replicas — turning one hot shuffle partition
into SALT cooler ones at the cost of SALT× the (small) build side.
Result is row-identical to the plain join (asserted in
tests/test_skew.py and by the oracle of the demo query below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.money import sum_money
from dist_map_reduce_spark.registry import query


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join with the probe side salted.

    probe gets a deterministic salt in [0, n_salts) (hash of its full
    key + a per-row component via monotonically spread key hashing is
    NOT used — salt must depend only on the probe ROW, never the key
    alone, or all hot-key rows land on one salt again; here we use
    pmod(hash of all probe columns…) — cheap and uniform). The build
    side is exploded n_salts× so every (key, salt) probe partition
    finds its build rows.

    Only inner/left are salting-safe: right/full outer would emit
    each unmatched build row once per salt replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'); got {how!r} "
            "(outer joins would duplicate unmatched build rows per salt)"
        )
    salt_probe = F.pmod(
        F.hash(*[F.col(c) for c in probe.columns]), F.lit(n_salts)
    ).alias("__salt")
    p = probe.select("*", salt_probe)
    b = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = p.join(
        b,
        (p[probe_key] == b[build_key]) & (p["__salt"] == b["__salt"]),
        how,
    )
    return out.drop("__salt")


def _zipf_probe(spark, sf_dir: str) -> DataFrame:
    """Deterministically Zipf-skew the lineitem fact: 95% of rows
    collapse onto key 0, the rest spread over 50 keys — the shape a
    power-law entity (a viral item, a bot user) gives a join key at
    100 TB. Rows replicate 8× (an explode — pure transformation of
    fixture data) so the hot shuffle partition is ~4.5M rows and the
    imbalance, not the scan, dominates the measurement."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_extendedprice",
        F.explode(F.sequence(F.lit(1), F.lit(8))).alias("rep"),
        F.when(F.col("l_orderkey") % 20 < 19, F.lit(0))
        .otherwise(F.pmod(F.hash("l_orderkey"), F.lit(50)))
        .alias("skew_key"),
    )


def _skew_dim(spark) -> DataFrame:
    return spark.range(50).select(
        F.col("id").alias("key"), (F.col("id") * 7 % 13).alias("w")
    )


def _skew_agg(joined: DataFrame) -> DataFrame:
    return joined.agg(
        F.sum(F.col("l_extendedprice") * F.col("w")).alias("v")
    )


def skew_zipf_join_unsalted(spark, sf_dir: str) -> DataFrame:
    """Bench twin A: the NAIVE plan — sort-merge join straight on the
    skewed key (the merge hint stands in for a build side too big to
    broadcast, which is when skew actually bites). One shuffle
    partition receives 95% of the fact table and its single task
    serializes the stage; AQE's skew split does not engage because
    the hot partition (~70 MB) sits under
    skewedPartitionThresholdInBytes (256 MB) — the threshold targets
    cluster-scale partitions, which is exactly why explicit salting
    stays in the toolbox below it."""
    probe, dim = _zipf_probe(spark, sf_dir), _skew_dim(spark)
    return _skew_agg(probe.join(dim.hint("merge"), probe.skew_key == dim.key))


def skew_zipf_join_salted(spark, sf_dir: str) -> DataFrame:
    """Bench twin B: same join salted 32 ways — the hot key's rows
    scatter across 32 shuffle partitions while the 50-row build side
    replicates 32×. Measured ~1.2× faster end-to-end than the
    unsalted twin at sf0.1 (BENCH_r07: 1.9 s vs 2.3 s, and the join
    stage itself goes from one straggler task to 32 balanced ones —
    the end-to-end gap is capped locally by the shared scan+explode;
    at cluster scale the straggler IS the stage time and the gap is
    the win). Not an oracle query: the two plans sum doubles in
    different orders, so totals agree only to ~12 significant
    digits — a timing entry, not a hash-checked one."""
    probe, dim = _zipf_probe(spark, sf_dir), _skew_dim(spark)
    return _skew_agg(
        salted_join(probe, dim.hint("merge"), "skew_key", "key", n_salts=32)
    )


@query(
    "skew_salted_join_nation_counts",
    oracle=f"""
    SELECT n_name, count(*) AS n_customers,
           {sum_money("c_acctbal", "total_bal")}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def skew_salted_join_nation_counts(spark, sf_dir: str) -> DataFrame:
    """Salted join demo (customer⋈nation with nation replicated 8×):
    the oracle is the PLAIN join — salting must be invisible in the
    result. (nationkey is the fixture's most skew-prone key: 25
    values over the whole customer table.)"""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = salted_join(cust, nation, "c_nationkey", "n_nationkey", n_salts=8)
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_customers"),
        F.expr(sum_money("c_acctbal", "total_bal")),
    )
