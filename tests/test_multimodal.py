"""Multimodal plumbing: binary schema, stub gates, pruning behavior.

Oracle equivalence for the registered multimodal_* operators is covered
by test_queries_oracle.py; this file checks the module-specific
properties.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from load_datawarehouse_spark.ops import multimodal as mm


def test_media_table_schema(spark):
    m = mm.media_table(spark, SF_DIR)
    # shape (names + types) — nullability flags differ for literals
    assert m.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    row = m.orderBy("doc_id").first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["content"])


def test_decode_stubs_raise_not_implemented():
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_image_real(b"\x89PNG", {})
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm.decode_audio_real(b"RIFF", {})


def test_metadata_scan_prunes_binary_payload(spark):
    # The metadata projection must not read the payload column: the
    # optimized plan's schema should not mention `content`.
    plan = mm.multimodal_media_meta(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan


def test_feature_extract_is_narrow(spark):
    # mapInPandas must not introduce a shuffle before the decode.
    df = mm.media_table(spark, SF_DIR).select("doc_id", "content").mapInPandas(
        mm._feature_batches, schema=mm._FEAT_SCHEMA
    )
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
