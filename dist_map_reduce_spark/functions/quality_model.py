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
