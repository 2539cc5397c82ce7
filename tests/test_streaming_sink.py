"""Streaming integration beyond memory sinks: foreachBatch into a
parquet table with checkpointing (exactly-once on restart), plus the
tolerance check for the approximate-distinct estimator."""

from __future__ import annotations

import glob

from tests.conftest import SF_DIR

from load_datawarehouse_spark.ops import relational, streaming as st
from load_datawarehouse_spark.session import load_tables


def _run_foreach_batch(spark, out_dir: str, ckpt: str) -> None:
    ev = st.events_stream(spark, SF_DIR)

    def write_batch(batch_df, batch_id: int) -> None:
        # the production shape: per-micro-batch controlled write
        # (dedup/upsert/merge logic would live here)
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        ev.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_foreach_batch_sink_with_checkpoint(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n_src = load_tables(spark, SF_DIR, register_views=False)["events"].count()

    _run_foreach_batch(spark, out, ckpt)
    assert spark.read.parquet(out).count() == n_src

    # restart with the same checkpoint: the source offset is already
    # committed, so nothing is reprocessed (exactly-once)
    _run_foreach_batch(spark, out, ckpt)
    assert spark.read.parquet(out).count() == n_src
    assert glob.glob(f"{ckpt}/offsets/*"), "checkpoint must persist offsets"


def test_approx_count_distinct_within_tolerance(spark):
    row = relational.agg_approx_count_distinct(spark, SF_DIR).first()
    t = load_tables(spark, SF_DIR, register_views=False)
    exact_orders = t["lineitem"].select("l_orderkey").distinct().count()
    exact_parts = t["lineitem"].select("l_partkey").distinct().count()
    assert row["exact_orders"] == exact_orders
    assert row["exact_parts"] == exact_parts
    # the query itself asserts |estimate-exact| <= 3*rsd*exact
    assert row["orders_ok"] and row["parts_ok"]
