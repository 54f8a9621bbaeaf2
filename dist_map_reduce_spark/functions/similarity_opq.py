"""OPQ-style rotated product quantization (library arm).

Plain PQ slices the raw vector into M contiguous subspaces; when the
corpus has correlated dimensions, a few subspaces carry most of the
energy and their tiny codebooks under-fit while the rest quantize
noise. Faiss's standard remedy is a PCA-derived rotation before PQ
(the `OPQ`/`PCAR` pre-transforms). This module implements the
principled non-iterative variant — OPQ-P from Ge et al., CVPR 2013
("Optimized Product Quantization"): rotate with the PCA eigenbasis,
then PERMUTE the eigen-dimensions across subspaces by greedy
eigenvalue allocation so every subspace receives (approximately) the
same variance product — each dimension goes to the subspace with the
smallest current log-eigenvalue sum. The rotation reuses
``embedding_pca.pca_fit`` (gramian-trick: one distributed pass, d×d
eigh driver-side) and the quantizer reuses the entire
``similarity_pq`` machinery unchanged on the rotated corpus —
composition over reimplementation.

Library-only, like the IVFADC residual arm: the rotation matrix is
driver-derived floats, so a literal-SQL oracle would need 4 096
embedded constants; instead correctness rides on (a) the PCA arm's
own oracle + two-arm tests, (b) the PQ arm's oracle on the unrotated
path, and (c) the recall harness measuring the composed search
against exact top-5 engine-side (tools/ann_recall_report.py records
the numbers in SCALE.md §ANN — measured, not narrated).

Scale posture: identical to PQ (the rotation is one extra
mapInPandas matmul pass over the scan; everything downstream is the
PQ plan) plus the PCA fit's single-Exchange gramian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.caching import persist_tracked
from dist_map_reduce_spark.catalog import load_table

# NOTE (review r14): embedding_pca and similarity_pq register @query
# entries on import, so this module imports them LAZILY inside each
# function — importing similarity_opq itself registers NOTHING, and
# the two gate entry points run registry.load_all() before their
# first rider import (_ensure_canonical_registry), so the driver's
# first-WINDOW cut can never shift through this module.


def eigenvalue_allocation(eigvals, m_sub: int | None = None) -> list[int]:
    """Greedy OPQ-P dimension permutation: eigenvalues in DESCENDING
    order are assigned one at a time to the non-full subspace with
    the smallest current log-eigenvalue sum (balancing the per-
    subspace variance PRODUCT). Returns a permutation of 0..d-1:
    position j of the rotated vector takes eigen-dimension perm[j],
    with subspace s owning positions s*SUBDIM..(s+1)*SUBDIM-1."""
    import math

    if m_sub is None:
        _ensure_canonical_registry()
        from dist_map_reduce_spark.functions.similarity_pq import M_SUB

        m_sub = M_SUB
    cap = len(eigvals) // m_sub
    # floor tiny/negative values (numerical noise around zero
    # variance) before the log
    logs = [math.log(max(float(v), 1e-12)) for v in eigvals]
    # SHIFT to non-negative before the greedy: every bucket ends with
    # exactly `cap` items, so adding a constant to every log moves
    # each bucket sum by cap·c — the spread is shift-invariant — but
    # the greedy needs positive item weights to be LPT (with raw
    # negative logs, the fullest bucket keeps the smallest sum and
    # the "min-sum" rule degenerates into contiguous slicing)
    base = min(logs)
    buckets: list[list[int]] = [[] for _ in range(m_sub)]
    sums = [0.0] * m_sub
    for dim, lg in enumerate(logs):  # descending eigenvalue order
        open_b = [b for b in range(m_sub) if len(buckets[b]) < cap]
        b = min(open_b, key=lambda i: sums[i])
        buckets[b].append(dim)
        sums[b] += lg - base
    perm: list[int] = []
    for b in buckets:
        perm.extend(b)
    return perm


def opq_rotation(emb: DataFrame):
    """(mean, R): the OPQ-P rotation — full-d PCA eigenbasis with
    columns permuted by eigenvalue allocation. R is orthonormal
    (a permutation of an orthonormal basis)."""
    _ensure_canonical_registry()
    from dist_map_reduce_spark.functions.embedding_pca import D, pca_fit

    mu, comps, ev = pca_fit(emb, D)
    perm = eigenvalue_allocation(ev)
    return mu, comps[:, perm]


def rotated_corpus(emb: DataFrame, mean, rot) -> DataFrame:
    """(vec_id, embedding): the corpus rotated into the OPQ basis —
    one BLAS matmul per Arrow batch (pca_project), column renamed so
    the whole similarity_pq machinery runs on it unchanged."""
    _ensure_canonical_registry()
    from dist_map_reduce_spark.functions.embedding_pca import pca_project

    return pca_project(emb, mean, rot).select(
        "vec_id", F.col("pc").alias("embedding")
    )


def opq_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-rotated PQ-ADC top-5 — the similarity_ann_pq_adc_topk
    plan on the rotated corpus (separate cache slots so the plain-PQ
    index is not clobbered)."""
    _ensure_canonical_registry()
    from pyspark.sql import Window

    from dist_map_reduce_spark.functions.similarity_pq import (
        pq_fit,
        pq_lut,
        subvector_rows,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    mu, rot = opq_rotation(emb)
    sub = persist_tracked(
        subvector_rows(rotated_corpus(emb, mu, rot)), "opq_subrows", sf_dir
    )
    # persist BOTH pq_fit outputs (the similarity_pq.pq_index policy,
    # under opq-prefixed slots so the plain-PQ index isn't clobbered):
    # codes and codebook hang off the same Lloyd training lineage, and
    # an unpersisted codebook re-runs the whole training a second time
    # when the LUT side materializes
    codes, cb = pq_fit(sub)
    codes = persist_tracked(codes, "opq_codes", sf_dir)
    cb = persist_tracked(cb, "opq_codebook", sf_dir)
    lut = pq_lut(sub, cb)
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
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


def opq_gated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-time A/B gate for the OPQ pre-transform — the EXECUTABLE
    form of SCALE.md §ANN's r11 root-cause policy (VERDICT r11 #7):
    pre-transforms are corpus-dependent, so the decision is a
    MEASURED recall A/B on the bounded query sample, never a spectrum
    threshold (the sf0.01 win sits exactly at the Marchenko–Pastur
    noise edge yet is real for that corpus; the sf0.1 corpus collapses
    to near-random under the same construction). Serves whichever of
    rotated-PQ / plain-PQ wins recall@5; ties go to plain PQ — no
    pre-transform is the cheaper index to build, ship and debug.

    The decision collect is TWO rows (variant, hits) — a bounded
    scalar read off the grading harness, the same adjudicated pattern
    as the iterative-training loop scalars. Both candidate indexes
    hang off cache slots, so the winner's returned plan reuses the
    A/B's own build rather than training a third time."""
    _ensure_canonical_registry()
    rec = {
        r.variant: r.hits
        for r in opq_vs_pq_recall(spark, sf_dir).collect()
    }
    if rec["opq_pq"] > rec["pq_adc"]:
        return opq_pq_topk(spark, sf_dir)
    # lazy direct import, not a registry lookup (ADVICE r12): this is
    # a library helper and must work in a process that never ran
    # registry.load_all; deferred to call time so importing this
    # module stays registration-free
    from dist_map_reduce_spark.functions.similarity_pq import (
        similarity_ann_pq_adc_topk,
    )

    return similarity_ann_pq_adc_topk(spark, sf_dir)


def _ensure_canonical_registry() -> None:
    """Pristine-process hazard (ADVICE r13, widened per ADVICE r14):
    EVERY public function in this module that lazily imports a
    @query-registering module (ann_recall, similarity_pq,
    embedding_pca) calls this first — not just the two gate entry
    points. If those riders landed in QUERIES before a LATER
    load_all, the cut-line guard would be silently skipped (QUERIES
    non-empty) and the first-WINDOW cut would shift. Running load_all
    FIRST — before any rider import, on every branch — pins the
    canonical registration order; it is idempotent (module imports
    are no-ops the second time), so on the driver path this costs
    nothing."""
    from dist_map_reduce_spark import registry

    registry.load_all()


def opq_vs_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(variant, hits, recall): recall@5 of rotated-PQ vs plain PQ
    against the exact cosine top-5, via the shared ann_recall
    grading machinery (same exact-top5 cache slot, same recall
    definition — one source of truth)."""
    _ensure_canonical_registry()
    from dist_map_reduce_spark.functions.ann_recall import (
        exact_top5,
        grade_recall,
    )
    from dist_map_reduce_spark.functions.similarity_pq import (
        similarity_ann_pq_adc_topk,
    )

    variants = similarity_ann_pq_adc_topk(spark, sf_dir).select(
        F.lit("pq_adc").alias("variant"), "query_id", "vec_id"
    ).unionAll(
        opq_pq_topk(spark, sf_dir).select(
            F.lit("opq_pq").alias("variant"), "query_id", "vec_id"
        )
    )
    return grade_recall(variants, exact_top5(spark, sf_dir))
