"""Regression tests for the oracle-compare normalizer.

The driver hashes FORMATTED values, so representational divergences
that Python ``==`` cannot see (IEEE signed zero: ``-0.0 == 0.0`` is
True) must be made visible by ``_norm`` — CORRECTNESS_r08's one red
row (`orders_revenue_bridge`) slipped through exactly this gap.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import numpy as np
import pytest

from oracle_harness import _norm, compare_query


def test_norm_distinguishes_signed_zero():
    assert _norm(-0.0) != _norm(0.0)
    assert _norm(0.0) == _norm(0.0)
    assert _norm(-0.0) == _norm(-0.0)


def test_norm_signed_zero_nested():
    # top-level floats were covered by the round-8 sweep; arrays and
    # structs must get the same canonicalization
    assert _norm([-0.0, 1.0]) != _norm([0.0, 1.0])
    assert _norm((2.0, [-0.0])) != _norm((2.0, [0.0]))
    assert _norm({"a": -0.0}) != _norm({"a": 0.0})
    assert _norm(np.array([-0.0])) != _norm(np.array([0.0]))


def test_norm_signed_zero_through_decimal():
    # DuckDB DECIMAL columns can carry Decimal("-0"); float() of it is -0.0
    assert _norm(Decimal("-0")) != _norm(Decimal("0"))


def test_norm_nan_and_inf_stable():
    assert _norm(float("nan")) == _norm(float("nan"))
    assert _norm(float("inf")) == _norm(float("inf"))
    assert _norm(float("-inf")) != _norm(float("inf"))
    assert _norm(np.float64(-0.0)) != _norm(np.float64(0.0))


def test_norm_sentinels_never_match_real_strings():
    # round-9 ADVICE: a bare-string sentinel ("0.0" / "NaN") would make
    # a float 0.0 compare equal to a genuine VARCHAR '0.0'. The tagged
    # sentinels must be unequal to every engine-producible value —
    # including an array that happens to spell out the old tuple form.
    assert _norm(0.0) != _norm("0.0")
    assert _norm(-0.0) != _norm("-0.0")
    assert _norm(float("nan")) != _norm("NaN")
    assert _norm(float("nan")) != _norm(["float", "NaN"])
    assert _norm(0.0) != _norm(["float", "0.0"])


def test_norm_float32_canonicalized():
    # round-9 ADVICE: np.float32 (DuckDB REAL / Spark FloatType via
    # fetchdf/toPandas) bypassed the float branch entirely, so NaN and
    # signed zero in 32-bit columns kept the raw-object blind spots
    assert _norm(np.float32("nan")) == _norm(float("nan"))
    assert _norm(np.float32(-0.0)) != _norm(np.float32(0.0))
    assert _norm(np.float32(-0.0)) == _norm(-0.0)
    assert _norm(np.float32(1.5)) == _norm(1.5)
    assert _norm(np.array([np.float32(-0.0)], dtype=np.float32)) != _norm(
        np.array([np.float32(0.0)], dtype=np.float32)
    )


def test_norm_numpy_str_not_exploded():
    assert _norm(np.str_("ab")) == "ab"


def test_compare_query_detects_signed_zero(spark):
    # end-to-end: a Spark +0.0 against an oracle -0.0 must FAIL the
    # compare even though rowcount/schema/Python-== all agree
    sdf = spark.createDataFrame([(0.0,)], "x double")
    con = duckdb.connect()
    # NB: a literal `-0.0` parses via DECIMAL and loses the sign;
    # `0.0 * -1` is evaluated in doubles and keeps it
    with pytest.raises(AssertionError, match="row mismatches"):
        compare_query(
            sdf, con, "SELECT CAST(0.0 AS DOUBLE) * -1 AS x", "signed_zero"
        )
    # and the positive control: matching signs pass
    compare_query(sdf, con, "SELECT CAST(0.0 AS DOUBLE) AS x", "signed_zero_ok")


def test_norm_sentinels_survive_pickling():
    # scaleverify normalizes oracle rows in a CHILD process and ships
    # them to the parent; sentinel equality must be value-based so it
    # survives the pickle round-trip (an identity tag mismatched every
    # zero/NaN row at sf1 — 7601 spurious bad rows, round 10)
    import pickle

    for v in (0.0, -0.0, float("nan")):
        assert _norm(v) == pickle.loads(pickle.dumps(_norm(v)))
    assert pickle.loads(pickle.dumps(_norm(0.0))) != _norm(-0.0)
    assert pickle.loads(pickle.dumps(_norm(0.0))) != _norm("0.0")
