"""Salted join ≡ plain join, including hot-key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from dist_map_reduce_spark import registry
from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.operators.skew import salted_join
from tests.conftest import SF_SMOKE, canon_rows

registry.load_all()


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(orders, cust, "o_custkey", "c_custkey", n_salts=4).select(
        "o_orderkey", "c_name"
    )
    assert canon_rows(salted.toPandas()) == canon_rows(plain.toPandas())


def test_salt_distribution_spreads_hot_key(spark):
    """All rows share ONE key — the salt must still spread them."""
    hot = spark.range(1000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    )
    salt = F.pmod(F.hash(F.col("k"), F.col("payload")), F.lit(8)).alias("salt")
    n_buckets = hot.select(salt).distinct().count()
    assert n_buckets == 8
