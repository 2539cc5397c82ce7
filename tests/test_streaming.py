"""Structured Streaming ops: stream results must equal the batch plans.

The per-query oracle comparison lives in test_queries_oracle.py (the
stream_* entries are registered like any other operator); this file
checks the streaming-specific properties on top.
"""

from __future__ import annotations

from tests.conftest import SF_DIR

from load_datawarehouse_spark.ops import streaming as st


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_equals_batch(spark):
    got = st.stream_tumbling_counts(spark, SF_DIR)
    want = st.batch_equivalent_tumbling(spark, SF_DIR)
    assert _rows(got) == _rows(want)


def test_stream_is_actually_streaming(spark):
    ev = st.events_stream(spark, SF_DIR)
    assert ev.isStreaming
    # event-time column restored from the nanos workaround
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_memory_sink_rerunnable(spark):
    # distinct sink names -> reruns don't collide with live queries
    a = st.stream_sliding_counts(spark, SF_DIR).count()
    b = st.stream_sliding_counts(spark, SF_DIR).count()
    assert a == b > 0
