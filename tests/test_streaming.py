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


def test_directory_shaped_table_streams_nonempty(spark, tmp_path):
    """Regression lock for the round-6 silent-empty-stream bug: a table
    stored as a Spark-written DIRECTORY of part-files (scalegen's sf1
    layout) must stream its rows, not be symlink-nested into a
    subdirectory the non-recursive file listing skips."""
    sf = str(tmp_path / "sfdir")
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch.repartition(3).write.parquet(f"{sf}/events.parquet")
    assert len(list((tmp_path / "sfdir" / "events.parquet").glob("part-*"))) >= 3

    got = st.stream_tumbling_counts(spark, sf)
    want = st.batch_equivalent_tumbling(spark, sf)
    n = got.count()
    assert n > 0, "directory-shaped table streamed zero rows (silent-empty regression)"
    assert _rows(got) == _rows(want)
