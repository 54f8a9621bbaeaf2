"""Real image decode through the multimodal mapInPandas path.

The sibling of ``multimodal_audio.py`` for the image modality:
binary PPM (P6) needs no codec — the header is three ASCII tokens
and the body is raw RGB — so the decode leg is REAL end-to-end:

1. synthesize a deterministic P6 payload per document (dimensions
   and channel gradients arithmetic in doc_id) inside an
   Arrow-batched ``mapInPandas`` — bytes built executor-side;
2. decode each payload (header parse + numpy reshape, the same
   logic as ``multimodal.decode_image``) in a second ``mapInPandas``
   and emit dimensions + per-channel means computed from the
   decoded pixel array.

The oracle recomputes every feature in closed form from doc_id:
gradients are chosen to never wrap mod 256, so channel sums are
exact integers and the means are exactly-representable doubles
(integer or half-integer) — a mangled header, stride, or channel
order would hash-mismatch. Rounding never enters.

Scale shape: two chained mapInPandas stages over a pruned doc_id
scan, zero shuffles — the canonical decode/feature-extract pipeline
shape (same as the audio path). Compressed formats (PNG/JPEG) still
require a codec this container lacks; their pipeline drops into the
same two-stage shape with the codec call swapped in.

Both UDFs are local closures (cloudpickle-by-value executor
contract); ``multimodal.decode_image`` exposes the same PPM decode
for direct use and unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

IMAGE_PAYLOAD_SCHEMA = "doc_id long, payload binary"
IMAGE_FEATURE_SCHEMA = (
    "doc_id long, height int, width int,"
    " mean_r double, mean_g double, mean_b double"
)


@query(
    "multimodal_image_features",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             16 + (doc_id % 8) * 4 AS w,
             12 + (doc_id % 5) * 4 AS h
      FROM documents WHERE doc_id % 4 = 1
    )
    SELECT doc_id,
           h AS height,
           w AS width,
           3 * (w - 1) / 2.0 + doc_id % 100 AS mean_r,
           5 * (h - 1) / 2.0 + doc_id % 50 AS mean_g,
           CAST(doc_id % 256 AS DOUBLE) AS mean_b
    FROM params
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize-then-decode PPM features over the documents table
    (every 4th doc, offset 1 — disjoint from the audio subset): the
    Spark side round-trips real P6 bytes through encode → decode →
    pixel statistics; the oracle recomputes the same features in
    closed form from doc_id."""

    def synth_ppm_batches(pdf_iter):
        # deterministic synthesis: x/y gradients chosen to never
        # wrap mod 256, so channel means have exact closed forms
        import numpy as np
        import pandas as pd

        def synth(doc_id: int) -> bytes:
            w = 16 + (doc_id % 8) * 4
            h = 12 + (doc_id % 5) * 4
            x = np.arange(w, dtype=np.uint16)
            y = np.arange(h, dtype=np.uint16)
            img = np.empty((h, w, 3), dtype=np.uint8)
            img[:, :, 0] = (3 * x + doc_id % 100)[None, :]
            img[:, :, 1] = (5 * y + doc_id % 50)[:, None]
            img[:, :, 2] = doc_id % 256
            return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()

        for pdf in pdf_iter:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": pdf["doc_id"].map(synth)}
            )

    def decode_ppm_batches(pdf_iter):
        # real decode: P6 header parse + numpy reshape (the logic of
        # multimodal.decode_image, inlined for pickle-by-value);
        # int64 channel sums are exact, means are exact doubles
        import numpy as np
        import pandas as pd

        def feats(blob: bytes):
            # every header loop is bounds-guarded (same discipline as
            # multimodal.decode_image) so a truncated/malformed blob
            # raises instead of spinning executor-side; ValueError,
            # not assert, survives python -O
            if not blob.startswith(b"P6"):
                raise ValueError("not a P6 PPM payload")
            n_blob = len(blob)
            tokens, i = [], 2
            while len(tokens) < 3:
                while i < n_blob and blob[i : i + 1].isspace():
                    i += 1
                if i >= n_blob:
                    raise ValueError("truncated PPM header")
                if blob[i : i + 1] == b"#":
                    while i < n_blob and blob[i : i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < n_blob and not blob[j : j + 1].isspace():
                    j += 1
                tokens.append(blob[i:j])
                i = j
            if i >= n_blob:
                raise ValueError("truncated PPM header")
            i += 1
            w, h, _maxval = (int(t) for t in tokens)
            px = np.frombuffer(
                blob, dtype=np.uint8, count=h * w * 3, offset=i
            ).reshape(h, w, 3).astype(np.int64)
            n = h * w
            return (
                h,
                w,
                float(px[:, :, 0].sum()) / n,
                float(px[:, :, 1].sum()) / n,
                float(px[:, :, 2].sum()) / n,
            )

        for pdf in pdf_iter:
            cols = list(zip(*pdf["payload"].map(feats)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": pd.Series(cols[0], dtype="int32"),
                    "width": pd.Series(cols[1], dtype="int32"),
                    "mean_r": cols[2],
                    "mean_g": cols[3],
                    "mean_b": cols[4],
                }
            )

    ids = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 4 == 1)
    )
    ppms = ids.mapInPandas(synth_ppm_batches, IMAGE_PAYLOAD_SCHEMA)
    return ppms.mapInPandas(decode_ppm_batches, IMAGE_FEATURE_SCHEMA)
