"""api_repr <-> StructType codec tests (FIXTURES.md F4 deep nesting)."""

from __future__ import annotations

from pyspark.sql import types as T

from load_datawarehouse_spark.types import (
    api_repr_to_struct_type,
    build_api_repr,
    convert,
    describe,
    struct_type_to_api_repr,
)

F4_SCHEMA = [
    {"name": "pkm_familie", "type": "INTEGER", "mode": "NULLABLE"},
    {
        "name": "t_productfeature",
        "type": "RECORD",
        "mode": "REPEATED",
        "fields": [
            {"name": "Kurztext", "type": "STRING", "mode": "NULLABLE"},
            {"name": "Text", "type": "STRING", "mode": "NULLABLE"},
            {"name": "ID", "type": "STRING", "mode": "NULLABLE"},
        ],
    },
    {"name": "u_ugr", "type": "INTEGER", "mode": "NULLABLE"},
    {"name": "s_einbaudetail", "type": "STRING", "mode": "NULLABLE"},
]


def test_api_repr_to_struct():
    st = api_repr_to_struct_type(F4_SCHEMA)
    assert isinstance(st["pkm_familie"].dataType, T.LongType)
    tp = st["t_productfeature"].dataType
    assert isinstance(tp, T.ArrayType)
    assert isinstance(tp.elementType, T.StructType)
    assert [f.name for f in tp.elementType.fields] == ["Kurztext", "Text", "ID"]


def test_round_trip_identity():
    st = api_repr_to_struct_type(F4_SCHEMA)
    back = struct_type_to_api_repr(st)
    assert back == F4_SCHEMA


def test_round_trip_exotic_types():
    schema = [
        {"name": "t", "type": "TIME", "mode": "NULLABLE"},
        {"name": "g", "type": "GEOGRAPHY", "mode": "NULLABLE"},
        {"name": "n", "type": "NUMERIC", "mode": "NULLABLE"},
        {"name": "bn", "type": "BIGNUMERIC", "mode": "NULLABLE"},
        {"name": "req", "type": "INTEGER", "mode": "REQUIRED"},
        {"name": "arr", "type": "FLOAT", "mode": "REPEATED"},
    ]
    st = api_repr_to_struct_type(schema)
    assert isinstance(st["t"].dataType, T.StringType)  # TIME compromise
    assert st["req"].nullable is False
    assert isinstance(st["arr"].dataType, T.ArrayType)
    assert struct_type_to_api_repr(st) == schema


def test_convert_dispatch():
    st = convert(F4_SCHEMA)
    assert isinstance(st, T.StructType)
    assert convert(st) == F4_SCHEMA


def test_type_aliases_normalized():
    f = build_api_repr("x", "INT64")
    assert f["type"] == "INTEGER"
    f = build_api_repr("y", "BOOL", "nullable")
    assert (f["type"], f["mode"]) == ("BOOLEAN", "NULLABLE")


def test_build_api_repr_extras_gated():
    f = build_api_repr("s", "STRING", max_length=10, precision=5)
    assert f.get("maxLength") == 10 and "precision" not in f
    f = build_api_repr("n", "NUMERIC", max_length=10, precision=5, scale=2)
    assert "maxLength" not in f and f["precision"] == 5 and f["scale"] == 2


def test_describe_tree():
    out = describe(F4_SCHEMA)
    assert "t_productfeature" in out and "RECORD" in out and "REPEATED" in out
    assert "│" in out or "├" in out or "└" in out
