"""One-pass table profiling (ANALYZE-style column statistics).

A data-engineering engine needs a profiling primitive: per-column row
counts, null counts, distinct cardinalities, and min/max bounds — the
inputs to cost-based planning, data-quality monitoring, and schema
drift detection. The reference has no statistics surface at all (its
model is an untyped word stream, reference: src/worker/worker.go:22);
this is engine extension surface over typed Parquet tables.

Scale posture (100 TB): no per-column job is ever launched. The
approx mode (`approx=True` — what a 100 TB profile run uses) is ONE
aggregation pass — a single `df.agg(...)` with HLL++ cardinalities
producing one row, pivoted to per-column rows by a constant-size
`stack`. The exact mode (oracle parity) is two linear passes: a
narrow stacked (col_name, value) single-distinct aggregate for
cardinalities plus a plain min/max pass for typed bounds — see
`profile_table`'s docstring for why that beats the obvious
multi-`count(distinct)` formulation (Expand row blow-up and ~3 s of
Catalyst rewrite/codegen per build).

Temporal min/max are reported at DATE granularity (dates format
identically across engines; raw timestamp rendering does not), and
numeric bounds are returned as DOUBLE without arithmetic, so every
profiled value is bit-identical across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def _bounds(col: str, dtype: T.DataType) -> tuple[Column, Column, Column, Column]:
    """(min_num, max_num, min_str, max_str) for one column — numeric
    bounds as DOUBLE, string bounds as-is, temporal bounds as
    'yyyy-MM-dd' strings; the other pair is NULL."""
    null_num = F.lit(None).cast("double")
    null_str = F.lit(None).cast("string")
    if isinstance(dtype, _NUMERIC):
        return (
            F.min(col).cast("double"),
            F.max(col).cast("double"),
            null_str,
            null_str,
        )
    if isinstance(dtype, _TEMPORAL):
        return (
            null_num,
            null_num,
            F.min(col).cast("date").cast("string"),
            F.max(col).cast("date").cast("string"),
        )
    return (
        null_num,
        null_num,
        F.min(col).cast("string"),
        F.max(col).cast("string"),
    )


def _bounds_row(df: DataFrame) -> DataFrame:
    """One row per column: (col_name, min_num, max_num, min_str,
    max_str) — a single plain min/max aggregation (no distinct, so
    Catalyst plans an ordinary partial+final hash aggregate) pivoted
    by a constant-size stack over the one stats row."""
    aggs: list[Column] = []
    for f in df.schema.fields:
        c = f.name
        mn_n, mx_n, mn_s, mx_s = _bounds(c, f.dataType)
        aggs += [
            mn_n.alias(f"__mnn_{c}"),
            mx_n.alias(f"__mxn_{c}"),
            mn_s.alias(f"__mns_{c}"),
            mx_s.alias(f"__mxs_{c}"),
        ]
    parts = ", ".join(
        f"'{c}', `__mnn_{c}`, `__mxn_{c}`, `__mns_{c}`, `__mxs_{c}`"
        for c in df.columns
    )
    return df.agg(*aggs).selectExpr(
        f"stack({len(df.columns)}, {parts}) AS "
        "(col_name, min_num, max_num, min_str, max_str)"
    )


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """Profile every column of ``df``.

    Returns one row per column: (col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str). ``approx=True``
    is the at-scale mode: ONE aggregation pass with HLL++
    cardinalities — no Expand, no value shuffle.

    The exact mode deliberately avoids ``count(distinct c1), ...,
    count(distinct cN)`` in a single aggregate: Catalyst's
    RewriteDistinctAggregates turns that into an Expand (×N+1 row
    duplication) wrapped in dozens of first() aggregates — measured
    ~3 s of analysis+codegen per build and an N× data blow-up
    through the shuffle. Instead the cardinality pass stacks the
    table to narrow (col_name, value-as-string) rows FIRST — the
    string cast is injective per column type (floats are `+ 0.0`
    normalized first so -0.0 and 0.0 — equal as doubles — don't
    split into two strings), so per-column distinct counts are
    unchanged — and runs ONE single-distinct aggregate
    over it (a plain two-phase partial-distinct plan, no Expand).
    Typed min/max bounds come from a second plain aggregation pass,
    and the two per-column stats tables broadcast-join on col_name.
    Two scans instead of one, but each is a cheap linear plan; at
    100 TB prefer ``approx=True``, which is one scan AND no Expand.
    """
    if approx:
        aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
        for f in df.schema.fields:
            c = f.name
            mn_n, mx_n, mn_s, mx_s = _bounds(c, f.dataType)
            aggs += [
                F.count(c).alias(f"__nn_{c}"),
                F.approx_count_distinct(c).alias(f"__nd_{c}"),
                mn_n.alias(f"__mnn_{c}"),
                mx_n.alias(f"__mxn_{c}"),
                mn_s.alias(f"__mns_{c}"),
                mx_s.alias(f"__mxs_{c}"),
            ]
        one = df.agg(*aggs)
        parts = ", ".join(
            f"'{c}', __rows - `__nn_{c}`, `__nd_{c}`, "
            f"`__mnn_{c}`, `__mxn_{c}`, `__mns_{c}`, `__mxs_{c}`"
            for c in df.columns
        )
        stacked = one.selectExpr(
            "__rows AS n_rows",
            f"stack({len(df.columns)}, {parts}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)",
        )
        return stacked.select(
            "col_name", "n_rows", "n_nulls", "n_distinct",
            "min_num", "max_num", "min_str", "max_str",
        )
    # floating columns are normalized with `+ 0.0` before the string
    # cast: -0.0 + 0.0 = +0.0 (IEEE), so -0.0/0.0 — distinct as
    # strings but equal as doubles — collapse to one value, keeping
    # the cast injective w.r.t. numeric equality (NaN renders as the
    # single 'NaN' string either way)
    val_parts = ", ".join(
        f"'{f.name}', CAST((`{f.name}` + 0.0) AS STRING)"
        if isinstance(f.dataType, (T.FloatType, T.DoubleType))
        else f"'{f.name}', CAST(`{f.name}` AS STRING)"
        for f in df.schema.fields
    )
    long = df.selectExpr(
        f"stack({len(df.columns)}, {val_parts}) AS (col_name, val)"
    )
    counts = long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_nulls"),
        F.count_distinct(F.col("val")).alias("n_distinct"),
    )
    return counts.join(F.broadcast(_bounds_row(df)), "col_name").select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


def _oracle_arm(col: str, kind: str) -> str:
    mn_n = mx_n = "CAST(NULL AS DOUBLE)"
    mn_s = mx_s = "CAST(NULL AS VARCHAR)"
    if kind == "num":
        mn_n, mx_n = f"CAST(min({col}) AS DOUBLE)", f"CAST(max({col}) AS DOUBLE)"
    elif kind == "date":
        mn_s = f"CAST(CAST(min({col}) AS DATE) AS VARCHAR)"
        mx_s = f"CAST(CAST(max({col}) AS DATE) AS VARCHAR)"
    else:
        mn_s, mx_s = f"CAST(min({col}) AS VARCHAR)", f"CAST(max({col}) AS VARCHAR)"
    return f"""
      SELECT '{col}' AS col_name,
             count(*) AS n_rows,
             count(*) - count({col}) AS n_nulls,
             count(DISTINCT {col}) AS n_distinct,
             {mn_n} AS min_num, {mx_n} AS max_num,
             {mn_s} AS min_str, {mx_s} AS max_str
      FROM orders"""


_ORDERS_KINDS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
]


@query(
    "profile_orders_columns",
    oracle=" UNION ALL ".join(_oracle_arm(c, k) for c, k in _ORDERS_KINDS),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full column profile of the orders table — exact cardinalities
    (oracle parity; the DuckDB side is per-column UNION arms, the
    Spark side is the one-pass stack pivot, results identical)."""
    return profile_table(load_table(spark, sf_dir, "orders"))
