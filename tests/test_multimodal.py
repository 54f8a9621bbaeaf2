"""Multimodal plumbing tests: stub behavior + binary column schema."""

from __future__ import annotations

import pytest

from dist_map_reduce_spark import registry
from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.functions import multimodal
from tests.conftest import SF_SMOKE

registry.load_all()


def test_decode_image_ppm_roundtrip_and_png_raises():
    import numpy as np

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = b"P6\n# comment\n3 2\n255\n" + img.tobytes()
    h, w, px = multimodal.decode_image(blob)
    assert (h, w) == (2, 3)
    assert (px == img).all()
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_decode_audio_real_wav_roundtrip():
    import io
    import wave

    import numpy as np

    samples = np.array([100, -200, 300, 0], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    nch, rate, decoded = multimodal.decode_audio(buf.getvalue())
    assert (nch, rate) == (1, 16000)
    assert decoded.tolist() == samples.tolist()
    with pytest.raises(NotImplementedError):
        # 8-bit PCM is outside the supported profile
        buf8 = io.BytesIO()
        with wave.open(buf8, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(b"\x01\x02")
        multimodal.decode_audio(buf8.getvalue())


def test_multimodal_schema(spark):
    mm = multimodal.as_multimodal(load_table(spark, SF_SMOKE, "documents"))
    dtypes = dict(mm.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<mime:string,n_bytes:int")


def test_byte_features_deterministic(spark):
    a = registry.QUERIES["multimodal_byte_features"](spark, SF_SMOKE).toPandas()
    b = registry.QUERIES["multimodal_byte_features"](spark, SF_SMOKE).toPandas()
    pd_a = a.sort_values("doc_id").reset_index(drop=True)
    pd_b = b.sort_values("doc_id").reset_index(drop=True)
    assert pd_a.equals(pd_b)
