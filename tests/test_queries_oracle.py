"""Every registered query vs its DuckDB oracle, at sf0.001 (fast) —
the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_harness import compare_query, duckdb_connect


def _pairs():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, con, name, fn, sql):
    df = fn(spark, SF_DIR)
    if sql is None:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    compare_query(df, con, sql, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
