"""Bucketed co-located joins: the pre-shuffle strategy SURVEY.md §2.4
prescribes for repeated big-big joins on a stable key.

Writing both fact tables bucketed by the join key (same bucket count)
lets every subsequent join on that key run with NO exchange on either
side — at 100 TB this converts the recurring shuffle of the largest
tables into a one-time write-side cost.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from load_datawarehouse_spark.session import load_tables

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    t = load_tables(spark, SF_DIR, register_views=False)
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            t[name]
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(root / name))
            .saveAsTable(f"bkt_{name}")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS bkt_{name}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # at test SF the tables are broadcast-sized, which makes the
    # planner skip bucketing entirely; disable broadcast to exercise
    # the sort-merge path a 100 TB join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("bkt_orders")
        l = spark.table("bkt_lineitem")
        joined = o.join(l, o.o_orderkey == l.l_orderkey).select("o_orderkey", "l_linenumber")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located: bucket layout satisfies the join's distribution
        # on both sides — no shuffle anywhere in the plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    t = load_tables(spark, SF_DIR, register_views=False)
    plain = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .count()
    )
    bucketed_count = (
        spark.table("bkt_orders")
        .join(
            spark.table("bkt_lineitem"),
            spark.table("bkt_orders").o_orderkey == spark.table("bkt_lineitem").l_orderkey,
        )
        .count()
    )
    assert bucketed_count == plain


def test_decimal_sum_partition_invariance(spark):
    """The _util decimal-accumulator discipline's core claim: the
    distributed sum is bitwise identical under ANY partitioning.
    Doubles chosen adversarially (wide magnitude spread) so a plain
    double sum WOULD differ across partitionings."""
    import random

    from pyspark.sql import functions as F

    from load_datawarehouse_spark.ops._util import dec_sum

    rng = random.Random(42)
    vals = [rng.uniform(0, 1) * 10 ** rng.randint(-6, 8) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    results = set()
    for parts in (1, 7, 32):
        out = df.repartition(parts).agg(dec_sum("v", "s")).collect()[0].s
        results.add(out)
    assert len(results) == 1, f"partitioning changed the decimal sum: {results}"
