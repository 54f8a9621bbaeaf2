"""dist_map_reduce_spark — a PySpark-native analytics engine.

A brand-new engine providing (and generalizing) the query and
data-processing capabilities of the reference MapReduce framework
``goku321/dist-map-reduce`` (see SURVEY.md): the reference's dataflow
``scan → flatMap → shuffle → sort → groupByKey → reduce → sink``
(reference: src/worker/worker.go:131-218) is realized as declarative
Spark DataFrame plans so Catalyst/Tungsten choose the physical
strategy, plus the full relational / time-series / LLM-data-pipeline
operator surface described in SURVEY.md §2.2.

Design stance (SURVEY.md §7): zero scheduling code — Spark's
DAGScheduler subsumes the reference's master/worker/RPC machinery
(reference: src/master/master.go) — all engine code is query surface.
"""

from dist_map_reduce_spark.session import get_spark
from dist_map_reduce_spark.catalog import TABLES, load_tables, register_views
from dist_map_reduce_spark.registry import QUERIES, ORACLES

__all__ = [
    "get_spark",
    "TABLES",
    "load_tables",
    "register_views",
    "QUERIES",
    "ORACLES",
]
