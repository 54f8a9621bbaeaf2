"""Real audio decode through the multimodal mapInPandas path.

`multimodal.py` treats modality payloads as opaque binary columns
and stubs the codecs that aren't in this container. WAV needs no
codec — the stdlib ``wave`` module reads it — so this module makes
the decode leg REAL for one modality end-to-end:

1. synthesize a deterministic 16-bit mono WAV per document
   (sawtooth wave whose period/amplitude/rate/length derive from
   doc_id) inside an Arrow-batched ``mapInPandas`` — payload bytes
   are built executor-side, never on the driver;
2. decode each payload with ``wave`` + numpy in a second
   ``mapInPandas`` stage and emit header fields (channels, frame
   rate, frame count) and sample statistics (peak, mean, RMS)
   computed from the decoded PCM samples.

The oracle never sees the bytes: it recomputes every feature in
closed form from doc_id (the synthesis parameters are arithmetic in
doc_id, and a full-period sawtooth has exact mean/peak/RMS
formulas). If the WAV encode/decode round-trip mangled anything —
endianness, header fields, sample width — the features would not
hash-match. Exactness: sums of squares stay < 2^53 so the numpy
int64 accumulation is exact, and both engines divide the same exact
integers, so the IEEE quotients (and sqrt) agree bit-for-bit; the
only rounding is a final round(…, 6) applied JVM-side/SQL-side
(never in Python, whose half-even round diverges).

Scale shape: embarrassingly parallel — two chained mapInPandas
stages, no shuffle at all; at 100 TB this is the canonical
decode/feature-extract pipeline shape, one Arrow batch at a time
per core.

Both UDFs are local closures using only stdlib + numpy/pandas, so
cloudpickle ships them by value — executors never need this package
importable (same contract as multimodal.py's byte-feature path).
``multimodal.decode_audio`` exposes the same WAV decode for direct
(non-Spark) use and unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

PAYLOAD_SCHEMA = "doc_id long, payload binary"
AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_channels int, framerate int, n_frames int,"
    " peak int, mean_sample double, rms double"
)


@query(
    "multimodal_audio_features",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             2 + doc_id % 7          AS p,
             100 + doc_id % 20       AS k,
             1000 + (doc_id % 10) * 100 AS a
      FROM documents WHERE doc_id % 4 = 0
    )
    SELECT doc_id,
           1 AS n_channels,
           8000 + (doc_id % 5) * 1000 AS framerate,
           p * k AS n_frames,
           a * (p - 1) AS peak,
           a * (p - 1) / 2.0 AS mean_sample,
           round(sqrt(a * a * (p - 1) * (2 * p - 1) / 6.0), 6) AS rms
    FROM params
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize-then-decode WAV features over the documents table
    (every 4th doc): the Spark side round-trips real WAV bytes
    through encode → decode → PCM statistics; the oracle recomputes
    the same features in closed form from doc_id."""

    def synth_wav_batches(pdf_iter):
        # deterministic synthesis, executor-side: full-period
        # sawtooth, all parameters arithmetic in doc_id
        import io
        import wave

        import numpy as np
        import pandas as pd

        def synth(doc_id: int) -> bytes:
            p = 2 + doc_id % 7
            k = 100 + doc_id % 20
            a = 1000 + (doc_id % 10) * 100
            rate = 8000 + (doc_id % 5) * 1000
            samples = (np.arange(p * k, dtype=np.int64) % p * a).astype(
                "<i2"
            )
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(samples.tobytes())
            return buf.getvalue()

        for pdf in pdf_iter:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": pdf["doc_id"].map(synth)}
            )

    def decode_wav_batches(pdf_iter):
        # real decode: stdlib wave + numpy; int64 sums are exact;
        # raw doubles out — rounding happens JVM-side
        import io
        import math
        import wave

        import numpy as np
        import pandas as pd

        def feats(blob: bytes):
            with wave.open(io.BytesIO(blob), "rb") as w:
                nch = w.getnchannels()
                rate = w.getframerate()
                nf = w.getnframes()
                pcm = np.frombuffer(
                    w.readframes(nf), dtype="<i2"
                ).astype(np.int64)
            n = len(pcm)
            return (
                nch,
                rate,
                nf,
                int(pcm.max()) if n else 0,
                float(pcm.sum()) / n if n else 0.0,
                math.sqrt(float((pcm * pcm).sum()) / n) if n else 0.0,
            )

        for pdf in pdf_iter:
            cols = list(zip(*pdf["payload"].map(feats)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_channels": pd.Series(cols[0], dtype="int32"),
                    "framerate": pd.Series(cols[1], dtype="int32"),
                    "n_frames": pd.Series(cols[2], dtype="int32"),
                    "peak": pd.Series(cols[3], dtype="int32"),
                    "mean_sample": cols[4],
                    "rms": cols[5],
                }
            )

    ids = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 4 == 0)
    )
    wavs = ids.mapInPandas(synth_wav_batches, PAYLOAD_SCHEMA)
    feats = wavs.mapInPandas(decode_wav_batches, AUDIO_FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        "n_channels",
        "framerate",
        "n_frames",
        "peak",
        "mean_sample",
        F.round("rms", 6).alias("rms"),
    )
