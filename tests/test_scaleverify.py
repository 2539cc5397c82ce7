"""Harness tests for scaleverify's child-process oracle runner.

Regression lock for the round-6 advisory: the parent must drain the
result queue BEFORE joining the child — a child blocked flushing a
pickled result larger than the OS pipe buffer (~64 KB) was being
terminated mid-flush and misclassified as ``oracle_timeout``, silently
dropping ~30% of the sf1 query set from verification.
"""

from __future__ import annotations

import scaleverify
from tests.conftest import SF_DIR


def test_large_oracle_result_is_not_misclassified_as_timeout():
    # ~5k rows x 120-byte strings -> pickled payload far above the
    # 64 KB pipe buffer that triggered the old deadlock-kill.
    sql = "SELECT range AS x, repeat('a', 120) AS s FROM range(5000)"
    status, cols, rows = scaleverify._oracle_rows(SF_DIR, sql)
    assert status == "ok", (status, cols)
    assert cols == ["s", "x"]
    assert len(rows) == 5000


def test_oracle_error_is_surfaced_not_timeout():
    status, err, _ = scaleverify._oracle_rows(SF_DIR, "SELECT * FROM no_such_table_xyz")
    assert status == "err"
    assert "no_such_table_xyz" in err or "Table" in err


def test_empty_on_timeout_adjudication(spark):
    """Advisor r7: 0 Spark rows under an sf1 oracle timeout must be
    adjudicated at sf0.01 — both-engines-empty becomes a distinct
    'suspect' status; a non-empty small-sf result stays a failure."""
    empty_fn = lambda s, sf_dir: s.range(1).filter("id < 0")  # noqa: E731
    rec = scaleverify._adjudicate_empty_on_timeout(
        spark, empty_fn, "SELECT 1 AS x WHERE 1 = 0"
    )
    assert rec["status"] == "suspect_empty_on_timeout"

    nonempty_fn = lambda s, sf_dir: s.range(3)  # noqa: E731
    rec = scaleverify._adjudicate_empty_on_timeout(
        spark, nonempty_fn, "SELECT 1 AS x WHERE 1 = 0"
    )
    assert rec["status"] == "empty_spark_on_timeout"

    # an adjudication probe that itself errors must stay a failure
    def boom(s, sf_dir):
        raise RuntimeError("probe failed")

    rec = scaleverify._adjudicate_empty_on_timeout(spark, boom, "SELECT 1")
    assert rec["status"] == "empty_spark_on_timeout"


def test_genuine_timeout_still_detected(monkeypatch):
    monkeypatch.setattr(scaleverify, "ORACLE_TIMEOUT_SEC", 2)
    # a cross join big enough to not finish in 2s
    sql = (
        "SELECT COUNT(*) AS n FROM range(100000) a, range(100000) b, range(100) c "
        "WHERE (a.range*b.range*c.range) % 7 = 3"
    )
    status, _, _ = scaleverify._oracle_rows(SF_DIR, sql)
    assert status == "timeout"


def test_probe_error_note_and_no_connection_leak(spark):
    """Round-8 ADVICE: a probe that errors must say so in its note
    (not claim 'sf0.01 is non-empty (spark=-1, oracle=-1)') and close
    the DuckDB connection it opened."""

    def boom(s, sf_dir):
        raise RuntimeError("probe exploded here")

    rec = scaleverify._adjudicate_empty_on_timeout(spark, boom, "SELECT 1 AS x")
    assert rec["status"] == "empty_spark_on_timeout"
    assert "probe itself errored" in rec["note"]
    assert "probe exploded here" in rec["note"]
    assert "non-empty" not in rec["note"]


def test_certification_blocks_on_suspects():
    """Round-8 ADVICE: n_suspect > 0 must BLOCK certification — an
    unadjudicated empty-on-timeout is not a pass."""
    ok = {"n_fail": 0, "n_suspect": 0}
    sus = {"n_fail": 0, "n_suspect": 1}
    bad = {"n_fail": 2, "n_suspect": 0}
    gate = lambda r: r["n_fail"] == 0 and r["n_suspect"] == 0  # noqa: E731
    assert gate(ok) and not gate(sus) and not gate(bad)
    # and the live script encodes exactly that predicate + a non-zero
    # exit so cron/driver wrappers cannot mistake a suspect sweep for
    # a certified one
    src = open("scaleverify.py").read()
    assert 'result["certified"] = result["n_fail"] == 0 and result["n_suspect"] == 0' in src
    assert 'if not result["certified"]:' in src
