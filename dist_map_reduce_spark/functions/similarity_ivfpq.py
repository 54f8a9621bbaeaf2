"""IVF-PQ: probe-restricted compressed-domain ANN search — the
production composition of the two index axes.

IVF (``similarity_common``) restricts WHICH vectors a query scores
(its NPROBE nearest k-means cells); PQ (``similarity_pq``) changes
HOW each candidate is scored (summed codebook lookups over M small
codes instead of a float-vector distance). Composed, a query touches
~nprobe/K of the corpus and reads only bytes — the Faiss-style
``IVFx,PQy`` layout that serves billion-vector corpora. Both index
builds are the already-oracle-checked ones: the k-means coarse
quantizer (``kmeans_fit``) with the shared persisted cell ranking
(``ivf_ranked_cells``), and the composite-key-Lloyd PQ codebook
(``pq_fit``) with its persisted subvector table.

Scale posture: the scored set is codes-of-candidates ⋈ broadcast
LUT — per query O(corpus·nprobe/K) rows of 3 ints, with map-side
partial sums; the cell restriction is an equi-join on the home-cell
id (broadcastable probe list), never a distance filter over the
corpus. Residual encoding (PQ over vector − cell centroid, the full
Faiss IVFADC) would reuse exactly these shapes with a re-centered
``sub`` table.

Determinism: every stage is one of the two deterministic builds plus
equi-joins and a rounded sum — the whole composition value-hash-
matches the composed unrolled-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_map_reduce_spark.caching import persist_tracked
from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.functions.similarity_common import (
    N_QUERIES,
    NPROBE,
    ivf_ranked_cells,
    kmeans_ctes,
    kmeans_fit,
)
from dist_map_reduce_spark.functions.similarity_pq import (
    pq_ctes,
    pq_index,
    pq_lut,
    subvector_rows,
)
from dist_map_reduce_spark.registry import query


def _ivfpq_oracle() -> str:
    km, final_cent = kmeans_ctes()
    pq, final_codes, _cb, lut = pq_ctes()
    ctes = km + pq  # km leads with the shared `e` CTE both builds use
    ctes.append(f"""ranked AS (
      SELECT e.vec_id, c.cell AS cand_cell,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(e.emb, c.cent), 6) DESC,
                        c.cell ASC
             ) AS rn
      FROM e CROSS JOIN {final_cent} c
    )""")
    ctes.append(
        "homes AS (SELECT vec_id, cand_cell AS cell FROM ranked WHERE rn = 1)"
    )
    ctes.append(f"""qprobes AS (
      SELECT vec_id AS query_id, cand_cell AS qcell
      FROM ranked WHERE vec_id < {N_QUERIES} AND rn <= {NPROBE}
    )""")
    ctes.append(f"""adc AS (
      SELECT l.query_id, a.vec_id, round(sum(l.ld), 6) AS adist
      FROM {final_codes} a
      JOIN homes h ON h.vec_id = a.vec_id
      JOIN qprobes p ON p.qcell = h.cell
      JOIN {lut} l ON l.query_id = p.query_id
                  AND l.m = a.m AND l.code = a.code
      WHERE a.vec_id <> p.query_id
      GROUP BY 1, 2
    )""")
    return (
        "WITH " + ",\n".join(ctes)
        + """
    SELECT query_id, vec_id, adist
    FROM adc
    QUALIFY row_number() OVER (
      PARTITION BY query_id ORDER BY adist ASC, vec_id ASC
    ) <= 5
    """
    )


@query("similarity_ann_ivfpq_topk", oracle=_ivfpq_oracle())
def similarity_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-5: k-means coarse cells restrict candidates to the
    query's NPROBE probes, PQ codes + broadcast LUTs score them in
    the compressed domain."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # PQ side: persisted subvectors -> codes + codebook -> query LUT
    sub = persist_tracked(subvector_rows(emb), "pq_subrows", sf_dir)
    codes, cb = pq_index(sub, sf_dir)
    lut = pq_lut(sub, cb)
    # IVF side: trained coarse quantizer + shared persisted ranking
    _, cent = kmeans_fit(emb)
    cent = cent.select(
        F.col("cell").alias("cand_cell"), F.col("cent").alias("centroid")
    )
    ranked = ivf_ranked_cells(emb, cent, "ivfpq_ranked_cells", sf_dir)
    homes = ranked.filter(F.col("rn") == 1).select(
        "vec_id", F.col("cand_cell").alias("cell")
    )
    qprobes = ranked.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("cand_cell").alias("qcell")
    )
    candidates = (
        codes.join(homes, "vec_id")
        .join(
            F.broadcast(qprobes),
            (F.col("cell") == F.col("qcell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "m", "code")
    )
    adc = (
        candidates.join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("ld"), 6).alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )
