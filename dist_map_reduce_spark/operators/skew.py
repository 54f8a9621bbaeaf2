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
