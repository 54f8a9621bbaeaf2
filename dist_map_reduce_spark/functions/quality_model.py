"""Trained-model quality scoring: apply a linear classifier at scale.

Production pretraining pipelines score every document with a cheap
trained classifier (fastText/logistic regression over surface
features — CCNet, LLaMA, GPT-3 all do this) and keep/bucket by the
score. The TRAINING happens offline; what the engine must do well is
the APPLICATION: score 100 TB of documents as a pure projection.
This module does exactly that — the model is a fixed weight vector
(stand-in for the offline artifact), and scoring is feature
extraction + dot product, all JVM expressions inside whole-stage
codegen: zero shuffle, zero Python, column-pruned to (doc_id, text,
n_chars).

Determinism contract: the logit uses only IEEE-exact operations
(+ * /) evaluated in the same association order on both engines, so
values are bit-identical to the DuckDB oracle. The sigmoid is
deliberately NOT applied — exp() is not guaranteed identical across
libm implementations; the keep-decision only needs the logit's sign
(sigmoid is monotone), which is exact.

Distinct from ``text_quality_scores`` (functions/text.py): that
computes raw per-doc METRICS; this applies a MODEL over them and
emits a decision — the filter stage, not the measurement stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

# Stop-tokens for the stopword-fraction feature (C4 uses exactly this
# kind of tiny curated list as a quality signal).
STOPWORDS = ("the", "a", "of", "and", "to")

# Fixed "offline-trained" logistic-regression weights:
# logit = B + W_TTR*ttr + W_AWL*avg_word_len + W_STOP*stop_frac
#           + W_LEN*(n_chars/1000)
B, W_TTR, W_AWL, W_STOP, W_LEN = -2.0, 3.0, 0.5, 2.0, -0.1


def quality_logit(docs: DataFrame) -> DataFrame:
    """(doc_id, logit, keep) — keep = logit > 0 (sigmoid(logit) > .5)."""
    ws = F.split("text", " ")
    n_words = F.size(ws).cast("double")
    ttr = F.size(F.array_distinct(ws)).cast("double") / n_words
    awl = F.aggregate(
        F.transform(ws, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    ).cast("double") / n_words
    stop_frac = (
        F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))).cast("double")
        / n_words
    )
    logit = (
        F.lit(B)
        + F.lit(W_TTR) * ttr
        + F.lit(W_AWL) * awl
        + F.lit(W_STOP) * stop_frac
        + F.lit(W_LEN) * (F.col("n_chars").cast("double") / F.lit(1000.0))
    )
    return docs.select(
        "doc_id",
        F.round(logit, 6).alias("logit"),
        (logit > 0).alias("keep"),
    )


_STOP_SQL = "', '".join(STOPWORDS)


@query(
    "quality_logreg_scores",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               AS n_distinct,
             CAST(list_aggregate(
                    list_transform(string_split(text, ' '), w -> length(w)),
                    'sum') AS DOUBLE)                      AS sum_len,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w IN ('{_STOP_SQL}'))) AS DOUBLE)
               AS n_stop,
             CAST(n_chars AS DOUBLE)                       AS chars
      FROM documents
    )
    SELECT doc_id,
           round({B} + {W_TTR} * (n_distinct / n_words)
                     + {W_AWL} * (sum_len / n_words)
                     + {W_STOP} * (n_stop / n_words)
                     + {W_LEN} * (chars / 1000.0), 6) AS logit,
           ({B} + {W_TTR} * (n_distinct / n_words)
                + {W_AWL} * (sum_len / n_words)
                + {W_STOP} * (n_stop / n_words)
                + {W_LEN} * (chars / 1000.0)) > 0     AS keep
    FROM f
    """,
)
def quality_logreg_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the fixed quality model to every document: logit
    (rounded for presentation) and the boolean keep decision on the
    unrounded sign."""
    return quality_logit(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Training: the offline step the application stage above assumes,
# runnable on the engine itself (batch gradient descent over the same
# surface features — the way a CCNet-style quality model is actually
# fit when the "offline" corpus is itself 100 TB).
# ---------------------------------------------------------------------------

FEATURES = ("ttr", "awl", "stop_frac", "len_k")


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, ttr, awl, stop_frac, len_k) — the surface-feature
    extraction shared by scoring and training; one narrow
    whole-stage-codegen projection."""
    ws = F.split("text", " ")
    n_words = F.size(ws).cast("double")
    return docs.select(
        "doc_id",
        (F.size(F.array_distinct(ws)).cast("double") / n_words).alias("ttr"),
        (
            F.aggregate(
                F.transform(ws, F.length),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).cast("double")
            / n_words
        ).alias("awl"),
        (
            F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))).cast("double")
            / n_words
        ).alias("stop_frac"),
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("len_k"),
    )


def train_quality_logreg(
    docs: DataFrame,
    label: F.Column,
    iters: int = 40,
    lr: float = 1.0,
) -> tuple[dict[str, float], list[float]]:
    """Fit logistic-regression weights over the surface features by
    full-batch gradient descent, distributed: per iteration ONE
    aggregation over the persisted feature table computes the exact
    batch gradient (5 scalars) and the mean log-loss — only those 6
    numbers reach the driver, the same scalar-to-driver class as an
    iterative loop's convergence flag. Deterministic up to float
    summation order (gradients are means over the corpus; the weight
    trajectory is stable to ~1e-12, and the TEST contract is loss
    decrease + accuracy, not bit-equality).

    ``label`` is a Column evaluating to DOUBLE 0/1 over ``docs``.
    Returns ``(weights, loss_history)`` with weights keyed bias +
    FEATURES in RAW feature space — feed them to
    ``score_with_weights``. Internally features are z-standardized
    (one extra corpus aggregation for the means/stds) so one
    learning rate fits all scales — without it awl (≈5) dominates
    the gradient and plain GD diverges; the learned z-space weights
    are mapped back to raw space on return
    (w_raw = w_z/σ, b_raw = b_z − Σ w_z·μ/σ).

    Scale shape: feature extraction is one projection, persisted;
    each iteration is one partial-aggregated mean over it (no
    shuffle wider than the 1-row result). 40 iterations = 40 cheap
    jobs, corpus-scanned from cache.
    """
    feats = quality_features(docs.select("doc_id", "text", "n_chars")).join(
        docs.select("doc_id", label.cast("double").alias("y")), "doc_id"
    ).persist()
    try:
        stats = feats.agg(
            *[F.avg(f).alias(f"m_{f}") for f in FEATURES],
            *[F.stddev_pop(f).alias(f"s_{f}") for f in FEATURES],
        ).collect()[0]
        mu = {f: stats[f"m_{f}"] for f in FEATURES}
        sd = {f: stats[f"s_{f}"] or 1.0 for f in FEATURES}
        sd = {f: (s if s > 0 else 1.0) for f, s in sd.items()}
        z = {f: (F.col(f) - F.lit(mu[f])) / F.lit(sd[f]) for f in FEATURES}
        w = {k: 0.0 for k in ("bias", *FEATURES)}
        history: list[float] = []
        for _ in range(iters):
            logit = F.lit(w["bias"])
            for f in FEATURES:
                logit = logit + F.lit(w[f]) * z[f]
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
            err = p - F.col("y")
            aggs = [F.avg(err).alias("g_bias")] + [
                F.avg(err * z[f]).alias(f"g_{f}") for f in FEATURES
            ]
            # clamped log-loss: exact 0/1 p would be +-inf
            eps = 1e-12
            ll = -(
                F.col("y") * F.log(F.greatest(p, F.lit(eps)))
                + (F.lit(1.0) - F.col("y"))
                * F.log(F.greatest(F.lit(1.0) - p, F.lit(eps)))
            )
            row = feats.agg(*aggs, F.avg(ll).alias("loss")).collect()[0]
            history.append(row["loss"])
            w["bias"] -= lr * row["g_bias"]
            for f in FEATURES:
                w[f] -= lr * row[f"g_{f}"]
    finally:
        feats.unpersist()
    raw = {f: w[f] / sd[f] for f in FEATURES}
    raw["bias"] = w["bias"] - sum(w[f] * mu[f] / sd[f] for f in FEATURES)
    return raw, history


def score_with_weights(docs: DataFrame, weights: dict[str, float]) -> DataFrame:
    """Apply arbitrary trained weights — the same projection shape as
    the fixed-weight ``quality_logit``: (doc_id, logit, keep)."""
    feats = quality_features(docs)
    logit = F.lit(weights["bias"])
    for f in FEATURES:
        logit = logit + F.lit(weights[f]) * F.col(f)
    return feats.select(
        "doc_id", logit.alias("logit"), (logit > 0).alias("keep")
    )
