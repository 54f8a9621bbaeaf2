"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Arrow-batched (mapInPandas) feature extraction.

Convention (BASELINE.json north star): a modality column is
``binary`` plus a metadata struct (mime, n_bytes, ...). Decode is
REAL for the codec-free formats: WAV via stdlib ``wave``
(``decode_audio`` + the end-to-end pipeline in
``multimodal_audio.py``) and binary PPM via header parse + numpy
(``decode_image`` + ``multimodal_image.py``). Compressed formats
(PNG/JPEG/video) need codecs this environment lacks, so those
paths raise NotImplementedError with a clear message and the
generic pipeline uses a deterministic byte-level feature
extractor — the Spark-side plumbing (schema, batching, UDF
signature, partitioning) is identical either way.

The documents table stands in as the payload source
(text bytes = the "blob").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


def decode_image(blob: bytes) -> "tuple[int, int, object]":
    """Decode an image payload to (height, width, HxWx3 uint8
    pixels) — REAL for binary PPM (P6), the codec-free raster
    format (pure header parse + numpy reshape; no PIL/opencv, which
    this container lacks). Compressed formats (PNG/JPEG) still need
    a codec and raise. The Spark-side pipeline using this decode
    end-to-end is ``multimodal_image.multimodal_image_features``
    (which inlines the same logic as a local closure for the
    cloudpickle-by-value executor contract)."""
    import numpy as np

    if not blob.startswith(b"P6"):
        raise NotImplementedError(
            "only binary PPM (P6) decodes codec-free; PNG/JPEG need an "
            "image codec this environment lacks — use "
            "extract_byte_features for the deterministic fake path"
        )
    # header: P6 <width> <height> <maxval> followed by ONE whitespace
    # byte, then raw RGB. Comments (#...) are legal between tokens.
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        tokens.append(blob[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM (maxval 255) supported")
    pixels = np.frombuffer(
        blob, dtype=np.uint8, count=height * width * 3, offset=i
    ).reshape(height, width, 3)
    return height, width, pixels


def decode_audio(blob: bytes) -> "tuple[int, int, object]":
    """Decode a WAV audio payload to PCM samples — REAL (stdlib
    ``wave``, no external codec needed). Returns (n_channels,
    framerate, int16 sample array). Non-WAV formats still need a
    codec this container lacks. The Spark-side pipeline using this
    decode end-to-end is ``multimodal_audio.multimodal_audio_features``
    (which inlines the same logic as a local closure for the
    cloudpickle-by-value executor contract)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(blob), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM WAV supported, got sampwidth="
                f"{w.getsampwidth()}"
            )
        samples = np.frombuffer(
            w.readframes(w.getnframes()), dtype="<i2"
        )
        return w.getnchannels(), w.getframerate(), samples


FEATURE_SCHEMA = "doc_id long, n_bytes int, first_byte int, mean_byte double"


def extract_byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake 'decode': byte-level statistics per payload.

    Arrow-batched mapInPandas operator — each batch is a zero-copy
    pandas DataFrame; this is the shape a real decoder (resize /
    frame-sample / spectrogram) plugs into, processing
    payload-per-row without any driver round trip.
    """
    for pdf in batches:
        blobs = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": blobs.map(len).astype("int32"),
                "first_byte": blobs.map(lambda b: b[0] if len(b) else -1).astype(
                    "int32"
                ),
                # raw mean — round JVM-side (or in SQL) with
                # half-away-from-zero semantics; Python round() is
                # half-even and diverges on .xxxxxx5 boundaries
                "mean_byte": blobs.map(
                    lambda b: sum(b) / len(b) if len(b) else 0.0
                ),
            }
        )


def as_multimodal(docs: DataFrame, mime: str = "text/plain") -> DataFrame:
    """documents → multimodal convention: (doc_id, payload binary,
    meta struct<mime, n_bytes>)."""
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


@query(
    "multimodal_manifest",
    oracle="""
    SELECT doc_id,
           'text/plain'      AS mime,
           strlen(text) AS n_bytes,
           source             AS origin,
           md5(text)          AS checksum
    FROM documents
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest of the multimodal payload column: typed metadata +
    content checksum, flattened from the (payload, meta) convention."""
    mm = as_multimodal(load_table(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.origin").alias("origin"),
        F.md5("payload").alias("checksum"),
    )


@query(
    "multimodal_byte_features",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           ascii(text)        AS first_byte,
           round(list_aggregate(
                   list_transform(regexp_extract_all(text, '.'), c -> ascii(c)),
                   'sum') * 1.0 / strlen(text), 6) AS mean_byte
    FROM documents
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads through the real
    Arrow/mapInPandas path (the fake 'decoder' computes byte stats;
    a real codec would slot in unchanged).

    The UDF is a local closure (not a module-level reference) so
    cloudpickle ships it by value — executors never need this package
    importable on their own sys.path.
    """
    mm = as_multimodal(load_table(spark, sf_dir, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            blobs = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "first_byte": blobs.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    # raw mean; rounding happens JVM-side below —
                    # Python round() is banker's (half-even), but the
                    # oracle's SQL round is half-away-from-zero, and
                    # power-of-two byte counts land means exactly on
                    # the .xxxxxx5 boundary
                    "mean_byte": blobs.map(
                        lambda b: sum(b) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return (
        mm.select("doc_id", "payload")
        .mapInPandas(extract, schema=FEATURE_SCHEMA)
        .withColumn("mean_byte", F.round("mean_byte", 6))
    )
