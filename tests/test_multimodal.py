"""Multimodal plumbing tests: stub behavior + binary column schema."""

from __future__ import annotations

import pytest

from dist_map_reduce_spark import registry
from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.functions import multimodal
from tests.conftest import SF_SMOKE

registry.load_all()


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFF")


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
