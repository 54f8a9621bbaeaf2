"""Exact monetary aggregation fragments.

Summing 2-decimal monetary values as float64 is order-dependent:
Spark's partition/combine order differs from any other engine's, so
two correct engines can land on opposite sides of a half-cent
rounding boundary (observed: 137947.485 ± 1 ulp → .48 vs .49).

Fix: accumulate in DECIMAL — exact and associative, so the result is
engine-independent — then round to cents and cast back to DOUBLE for
a representation-stable comparison. The fragments below are valid in
BOTH Spark SQL and DuckDB, so each query uses the identical text on
both sides (single source of truth; no dialect drift).

Cost note (100 TB): decimal aggregation is ~2-3× slower per value
than double but still whole-stage-codegen'd; it buys exactness for
money, which is the standard trade. Measures that are exact in
float64 anyway (integer-valued quantities, counts) stay double.
"""


def sum_money(col: str, alias: str) -> str:
    """Exact sum of a 2-decimal monetary column."""
    return (
        f"CAST(round(sum(CAST({col} AS DECIMAL(18,2))), 2) AS DOUBLE) AS {alias}"
    )


def sum_disc_price(alias: str, extended: str = "l_extendedprice",
                   discount: str = "l_discount") -> str:
    """Exact sum of extendedprice * (1 - discount)."""
    return (
        f"CAST(round(sum(CAST({extended} AS DECIMAL(18,2))"
        f" * (1 - CAST({discount} AS DECIMAL(4,2)))), 2) AS DOUBLE) AS {alias}"
    )


def sum_charge(alias: str) -> str:
    """Exact sum of extendedprice * (1 - discount) * (1 + tax)."""
    return (
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * (1 - CAST(l_discount AS DECIMAL(4,2)))"
        " * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)"
        f" AS {alias}"
    )


def sum_price_times_disc(alias: str) -> str:
    """Exact sum of extendedprice * discount (TPC-H Q6 revenue)."""
    return (
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
        f" * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS {alias}"
    )
