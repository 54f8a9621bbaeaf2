"""Pareto / ABC contribution classification (library operator).

The classic warehouse analysis: rank entities by a measure, compute
each entity's cumulative share of the total, and classify A (the
entities covering the first ~80% of the measure), B (to ~95%), C
(the tail). Registration-free library entry point for now (the
50-slot correctness window is full this round); an oracle query over
customers-by-acctbal is a natural round-6 registration.

Scale posture: ABC runs on AGGREGATED entities (parts, customers,
SKUs) — never on a raw fact table (a global window over facts is the
anti-pattern SCALE.md's window section warns about). With ``by``
partition columns the ranking window is keyed (one exchange, bounded
partitions); without them it is a single-partition sort, acceptable
only because the entity table is aggregate-sized. Both the running
share and the per-partition total come from the SAME window
partitioning, so classification adds one exchange over the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def abc_classification(
    df: DataFrame,
    measure: str,
    tie_break: str | Column,
    by: list[str] | None = None,
    thresholds: tuple[float, float] = (0.80, 0.95),
    label_col: str = "abc_class",
) -> DataFrame:
    """Append ``label_col`` ('A'/'B'/'C') and ``cum_share`` columns.

    Rows are ranked by ``measure`` descending with ``tie_break``
    (required: without a unique tie-break the cumulative share —
    hence the class of boundary rows — would be nondeterministic).
    ``by`` scopes the classification within partitions (ABC per
    category); ``cum_share`` is inclusive of the current row, but the
    CLASS is decided by the share BEFORE the row: the entity that
    crosses a threshold belongs to the class it completes (on truly
    Pareto data a 96%-of-total top entity must be 'A', which an
    inclusive-share test would put in the tail class).
    """
    parts = [F.col(c) for c in (by or [])]
    order = [F.col(measure).desc(), F.col(tie_break) if isinstance(tie_break, str) else tie_break]
    running = Window.partitionBy(*parts).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    whole = Window.partitionBy(*parts)
    a_cut, b_cut = thresholds
    total = F.sum(measure).over(whole)
    cum = F.sum(measure).over(running)
    prev_share = (cum - F.col(measure)) / total
    return df.withColumn("cum_share", cum / total).withColumn(
        label_col,
        F.when(prev_share < a_cut, "A")
        .when(prev_share < b_cut, "B")
        .otherwise("C"),
    )
