"""Constructed-fixture goldens for the round-14 re-anchored event-time
ops (VERDICT r13 #1): the three ops whose old predicates were vacuous
on the corpus (events-era vs orders-era) now run against a hand-built
events table where every boundary edge is asserted EXACTLY —
inclusive/exclusive interval bounds, same-instant as-of ties,
timestamp-tie dedup, and the RANGE-frame's inclusive trailing edge.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from load_datawarehouse_spark.ops import analytics, relational


def _ts(day: int, h: int = 0, m: int = 0, s: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, h, m, s)


_EVENTS = [
    # (event_id, ts, user_id, event_type, value)
    (1, _ts(1), 1, "view", 0.0),
    (2, _ts(1), 1, "purchase", 5.0),  # same instant as view 1
    (3, _ts(1, 23), 1, "click", 0.0),
    (14, _ts(2), 1, "view", 0.0),  # exactly +24h after events 1/2
    (4, _ts(2, 1), 1, "purchase", 7.0),  # ts-tie with 5 -> dedup max
    (5, _ts(2, 1), 1, "purchase", 3.0),
    (6, _ts(2, 23), 1, "error", 0.0),  # exactly +24h after event 3
    (7, _ts(2, 23, 0, 1), 1, "error", 0.0),  # +24h +1s after event 3
    (8, _ts(10), 1, "view", 0.0),  # no later purchase exists
    (9, _ts(1, 0, 30), 2, "purchase", 9.0),  # other user: never pairs
    (10, _ts(5), 3, "click", 0.0),
    (11, _ts(5, 0, 30), 3, "click", 0.0),
    (12, _ts(5, 1), 3, "click", 0.0),  # exactly 3600s after event 10
    (13, _ts(5, 2, 0, 1), 3, "click", 0.0),  # 3601s after event 12
]

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _fixture_dir(spark, tmp_path) -> str:
    rows = [(i, ts, u, t, v, "{}") for i, ts, u, t, v in _EVENTS]
    d = str(tmp_path / "sf_fixture")
    spark.createDataFrame(rows, _SCHEMA).write.parquet(f"{d}/events.parquet")
    return d


def test_range_bucketed_exact_pairs_and_bound_edges(spark, tmp_path):
    # strict-after lower bound (ts ties never pair), INCLUSIVE +24h
    # upper bound (events 1->14 and 3->6 are exactly 24h apart and
    # match; 3->7 is 24h+1s and must not), cross-bucket pairs via the
    # x2 expansion (3 @ 23:00 -> 4/5 @ next day), per-user isolation.
    d = _fixture_dir(spark, tmp_path)
    got = [tuple(r) for r in relational.join_range_bucketed(spark, d).collect()]
    assert got == [
        ("click", 10, 4),
        ("error", 1, 1),
        ("purchase", 6, 3),
        ("view", 6, 2),
    ]


def test_asof_forward_exact_matches_and_tie_dedup(spark, tmp_path):
    # at-or-after is INCLUSIVE (view 1 matches the same-instant
    # purchase 2, not the later one), timestamp-tied purchases 4/5
    # dedup deterministically to max(value), and a view with no later
    # purchase (8) is dropped rather than matched backward.
    d = _fixture_dir(spark, tmp_path)
    got = [tuple(r) for r in relational.join_asof_forward(spark, d).collect()]
    assert got == [
        (1, 1, _ts(1), 5.0),
        (14, 1, _ts(2, 1), 7.0),
    ]


def test_velocity_flags_exact_rows_and_frame_edge(spark, tmp_path):
    # the trailing RANGE frame is inclusive at exactly -3600s (event
    # 12 counts event 10), exclusive one second past it (event 13
    # does NOT count event 12), and ts-tied events all count (events
    # 4/5 both flag because the frame holds {14, 4, 5}).
    d = _fixture_dir(spark, tmp_path)
    got = [tuple(r) for r in analytics.events_velocity_flags(spark, d).collect()]
    assert got == [
        (1, 4, 3),
        (1, 5, 3),
        (3, 12, 3),
    ]


# --- join_asof_nearest: forward-wins + equidistant tie-break ---------------
#
# Round 16 re-anchor (census output-hash probe): the orders-domain
# form was a FULL output twin of join_asof at every certified scale
# (no order ever at-or-after an event), so the op moved to the
# view->purchase domain where both directions are live. This fixture
# constructs purchases on BOTH sides of each view so every merge
# branch is asserted exactly.

_NEAREST_EVENTS = [
    # (event_id, ts, user_id, event_type, value)
    (1, _ts(1), 1, "purchase", 100.0),   # user 1: far backward anchor
    (2, _ts(20), 1, "purchase", 200.0),  # user 1: near forward anchor
    (3, _ts(10), 2, "purchase", 300.0),  # user 2: forward-only (none before)
    (10, _ts(15), 1, "view", 0.0),       # back 14d vs fwd 5d -> FORWARD wins
    (11, _ts(10, 12), 1, "view", 0.0),   # exactly equidistant -> tie BACKWARD
    (12, _ts(5), 2, "view", 0.0),        # backward leg NULL -> forward fallback
    (13, _ts(5), 3, "view", 0.0),        # no purchases either side -> dropped
    (14, _ts(20), 1, "view", 0.0),       # same instant as purchase 2: 0s both
]


def _nearest_fixture_dir(spark, tmp_path) -> str:
    d = str(tmp_path / "sf_nearest")
    rows = [(i, ts, u, t, v, "{}") for i, ts, u, t, v in _NEAREST_EVENTS]
    spark.createDataFrame(rows, _SCHEMA).write.parquet(f"{d}/events.parquet")
    return d


def test_asof_nearest_forward_wins_and_tie_breaks_backward(spark, tmp_path):
    d = _nearest_fixture_dir(spark, tmp_path)
    got = [tuple(r) for r in relational.join_asof_nearest(spark, d).collect()]
    assert got == [
        (10, 1, _ts(20), 200.0),  # forward strictly nearer -> forward value
        (11, 1, _ts(1), 100.0),   # equidistant -> backward by the <= tie rule
        (12, 2, _ts(10), 300.0),  # no backward match -> forward fallback
        (14, 1, _ts(20), 200.0),  # same-instant: both legs inclusive, tie -> backward
    ]
