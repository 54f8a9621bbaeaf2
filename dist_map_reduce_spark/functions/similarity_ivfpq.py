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


def ivfadc_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Faiss IVFADC: L2-normalize (so squared-L2 order is cosine
    order), then PQ over RESIDUALS (vector − home-cell centroid)
    instead of raw vectors.

    MEASURED NEGATIVE on this corpus (SCALE.md §ANN): recall@5 = 0.20
    vs 0.32 for the raw-vector `similarity_ann_ivfpq_topk`, both
    scales. The reason is instructive: the fixture embeddings are
    label clusters + isotropic noise, so the coarse quantizer absorbs
    essentially ALL the structure — the residual is near-pure noise,
    which an M=8, K=8 codebook cannot resolve, while raw-vector PQ
    still encodes the (dominant) between-cell signal. IVFADC earns
    its keep when within-cell variation is structured and the
    codebook is big (Faiss-scale M=32-64, K=256); the function exists
    so that trade is a measured fact here rather than folklore — the
    recall harness (tools/ann_recall_report.py) emits both variants.

    Library entry point, not a registered query: the per-(query,
    probe-cell) residual LUT makes an unrolled SQL oracle ~K× the
    already-large composed IVF-PQ oracle for no new determinism
    evidence — every stage below is one of the two already-oracle-
    checked builds plus equi-joins, and the recall harness grades
    the search end-to-end against exact top-5.

    Scale shape: identical joins to the raw IVF-PQ plan plus one
    broadcast of the K×DIM centroid table for the residual
    subtraction; the LUT grows to (queries × nprobe × M × K_PQ) rows
    — still broadcast-sized. Candidates reach the ADC sum through
    their home cell only, so each (query, candidate) scores exactly
    once against the matching probe-cell LUT."""
    from dist_map_reduce_spark.functions.similarity_pq import (
        _sq_l2,
        pq_fit,
    )

    # L2-normalize first: on the unit sphere squared-L2 order IS
    # cosine order (cos = 1 − ‖q̂−x̂‖²/2), so the ADC ranking targets
    # the same metric the exact top-5 uses — without this the PQ
    # codebook wastes codes modeling norm variation the cosine
    # ground truth ignores
    raw = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    nrm = F.sqrt(
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)"
            " * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v)"
        )
    )
    emb = raw.withColumn("nrm", nrm).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / F.col("nrm")
        ).alias("embedding"),
    )
    _, cent = kmeans_fit(emb)  # (cell, cent) — 6-dp-rounded doubles
    ranked = ivf_ranked_cells(
        emb,
        cent.select(
            F.col("cell").alias("cand_cell"), F.col("cent").alias("centroid")
        ),
        "ivfadc_ranked_cells",  # normalized-space ranking: own slot
        sf_dir,
    )
    homes = ranked.filter(F.col("rn") == 1).select(
        "vec_id", F.col("cand_cell").alias("cell")
    )
    residual = F.expr(
        "zip_with(embedding, cent, (x, c) -> CAST(x AS DOUBLE) - c)"
    )
    res = (
        emb.join(homes, "vec_id")
        .join(F.broadcast(cent), "cell")
        .select("vec_id", "cell", residual.alias("embedding"))
    )
    # PQ trained on residual subvectors (own cache slots — the codes
    # table is the residual-compressed corpus)
    sub_res = persist_tracked(
        subvector_rows(res.select("vec_id", "embedding")),
        "ivfadc_subrows",
        sf_dir,
    )
    codes, cb = pq_fit(sub_res)
    codes = persist_tracked(codes, "ivfadc_codes", sf_dir)
    # query-side: one residual PER PROBE CELL, so the LUT is keyed by
    # (query_id, qcell) — a candidate scores against the LUT of the
    # cell it was found in
    qprobes = ranked.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("cand_cell").alias("qcell")
    )
    q_res = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(qprobes), "query_id")
        .join(
            F.broadcast(cent.withColumnRenamed("cell", "qcell")), "qcell"
        )
        .select("query_id", "qcell", residual.alias("embedding"))
    )
    from dist_map_reduce_spark.functions.similarity_pq import M_SUB, SUBDIM

    q_sub = q_res.select(
        "query_id",
        "qcell",
        F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("m"),
        "embedding",
    ).select(
        "query_id",
        "qcell",
        "m",
        F.expr(
            f"transform(slice(embedding, m * {SUBDIM} + 1, {SUBDIM}),"
            f" x -> CAST(x AS DOUBLE))"
        ).alias("sub"),
    )
    lut = q_sub.join(F.broadcast(cb), "m").select(
        "query_id",
        "qcell",
        "m",
        "code",
        F.round(_sq_l2("sub", "cent"), 6).alias("ld"),
    )
    candidates = (
        codes.join(homes, "vec_id")
        .join(
            F.broadcast(qprobes),
            (F.col("cell") == F.col("qcell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "qcell", "vec_id", "m", "code")
    )
    adc = (
        candidates.join(F.broadcast(lut), ["query_id", "qcell", "m", "code"])
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
