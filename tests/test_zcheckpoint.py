"""session.iter_checkpoint storage is conf-driven: with no checkpoint
dir set, iterative rounds use localCheckpoint; once the app sets a
reliable dir (``sc.setCheckpointDir`` — the standard Spark knob, an
HDFS/object-store path on a real cluster) the SAME loops write
reliable checkpoints, and results are unchanged.

File named to sort LAST in collection: a checkpoint dir cannot be
unset on a live SparkContext, so setting it here must not leak into
the plan/perf expectations of earlier test files.
"""

from __future__ import annotations

from pathlib import Path

from tests.conftest import SF_SMOKE


def test_reliable_checkpoint_dir_is_used_when_set(spark, tmp_path_factory):
    from dist_map_reduce_spark import caching
    from dist_map_reduce_spark.functions.graph import pagerank_dedup_graph

    before = sorted(map(tuple, pagerank_dedup_graph(spark, SF_SMOKE).collect()))
    # drop the construction-time cache so the loop actually re-runs
    caching.clear()

    ckdir = tmp_path_factory.mktemp("reliable_ck")
    spark.sparkContext.setCheckpointDir(str(ckdir))
    after = sorted(map(tuple, pagerank_dedup_graph(spark, SF_SMOKE).collect()))

    assert after == before
    rdd_dirs = list(Path(ckdir).glob("*/rdd-*"))
    assert rdd_dirs, "no reliable checkpoint data written under the set dir"
