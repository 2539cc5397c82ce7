"""Warehouse type system: api_repr schema trees <-> Spark StructType.

Re-expresses the reference's BigQuery-style schema model
(``/root/reference/src/load_datawarehouse/bigquery/schema.py:67-94``
SchemaFieldType / SchemaFieldMode; ``:116-164`` build_api_repr;
``:222-295`` bidirectional conversion; ``:301-434`` describe) on Spark
types. An "api_repr" is a list of dicts ``{name, type, mode,
fields?}``; mode REPEATED wraps the Spark type in ArrayType, RECORD
maps to StructType.

Types with no native Spark equivalent (TIME, GEOGRAPHY, BIGNUMERIC —
SURVEY.md §7.5) are stored as the documented compromise type with the
original warehouse type recorded in StructField metadata under
``warehouse_type`` so the round-trip api_repr -> StructType ->
api_repr is lossless at the schema level.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

# --- Warehouse type vocabulary (bigquery/schema.py:67-87) -----------------

STRING = "STRING"
BYTES = "BYTES"
INTEGER = "INTEGER"
FLOAT = "FLOAT"
BOOLEAN = "BOOLEAN"
TIMESTAMP = "TIMESTAMP"
DATE = "DATE"
TIME = "TIME"
DATETIME = "DATETIME"
GEOGRAPHY = "GEOGRAPHY"
NUMERIC = "NUMERIC"
BIGNUMERIC = "BIGNUMERIC"
RECORD = "RECORD"

#: Aliases normalized on input (reference enum values, :67-87).
TYPE_ALIASES = {
    "INT64": INTEGER,
    "FLOAT64": FLOAT,
    "BOOL": BOOLEAN,
    "STRUCT": RECORD,
}

NULLABLE = "NULLABLE"
REQUIRED = "REQUIRED"
REPEATED = "REPEATED"

DEFAULT_TYPE = STRING  # bigquery/schema.py:446-452
DEFAULT_MODE = NULLABLE

#: warehouse type -> (spark type, lossy?) per SURVEY.md §1.2.
_WAREHOUSE_TO_SPARK: dict[str, T.DataType] = {
    STRING: T.StringType(),
    BYTES: T.BinaryType(),
    INTEGER: T.LongType(),
    FLOAT: T.DoubleType(),
    BOOLEAN: T.BooleanType(),
    TIMESTAMP: T.TimestampType(),
    DATETIME: T.TimestampNTZType(),
    DATE: T.DateType(),
    TIME: T.StringType(),  # ISO-8601 string; no native Spark TIME
    NUMERIC: T.DecimalType(38, 9),
    BIGNUMERIC: T.DecimalType(38, 18),  # BQ precision 76 > Spark max 38
    GEOGRAPHY: T.StringType(),  # WKT
}

#: Spark types whose warehouse identity is ambiguous without metadata.
_METADATA_TYPES = {TIME, GEOGRAPHY, BIGNUMERIC, NUMERIC}

_SPARK_TO_WAREHOUSE: dict[type, str] = {
    T.StringType: STRING,
    T.BinaryType: BYTES,
    T.LongType: INTEGER,
    T.IntegerType: INTEGER,
    T.ShortType: INTEGER,
    T.ByteType: INTEGER,
    T.DoubleType: FLOAT,
    T.FloatType: FLOAT,
    T.BooleanType: BOOLEAN,
    T.TimestampType: TIMESTAMP,
    T.TimestampNTZType: DATETIME,
    T.DateType: DATE,
}


def normalize_type(type_: str) -> str:
    t = type_.upper()
    return TYPE_ALIASES.get(t, t)


def build_api_repr(
    name: str,
    field_type: str = DEFAULT_TYPE,
    mode: str = DEFAULT_MODE,
    fields: list[dict] | None = None,
    **extra: Any,
) -> dict:
    """Construct one schema-field dict (bigquery/schema.py:116-164).

    Like the reference, precision/scale/maxLength extras are gated by
    type: maxLength only applies to STRING/BYTES, precision/scale only
    to NUMERIC/BIGNUMERIC.
    """
    field_type = normalize_type(field_type)
    out: dict[str, Any] = {"name": str(name), "type": field_type, "mode": mode.upper()}
    if fields:
        out["fields"] = list(fields)
    if "max_length" in extra and field_type in (STRING, BYTES):
        out["maxLength"] = extra["max_length"]
    if field_type in (NUMERIC, BIGNUMERIC):
        for k in ("precision", "scale"):
            if k in extra:
                out[k] = extra[k]
    return out


def api_repr_to_struct_type(schema: list[dict]) -> T.StructType:
    """api_repr list -> Spark StructType (recursive).

    RECORD REPEATED -> ArrayType(StructType); scalar REPEATED ->
    ArrayType(primitive); REQUIRED -> nullable=False.
    """
    fields = []
    for f in schema:
        ftype = normalize_type(f.get("type", DEFAULT_TYPE))
        mode = f.get("mode", DEFAULT_MODE).upper()
        if ftype == RECORD:
            inner: T.DataType = api_repr_to_struct_type(f.get("fields", []))
        else:
            inner = _WAREHOUSE_TO_SPARK.get(ftype, T.StringType())
        if mode == REPEATED:
            inner = T.ArrayType(inner, containsNull=True)
        metadata = {"warehouse_type": ftype} if ftype in _METADATA_TYPES else {}
        fields.append(
            T.StructField(
                f["name"], inner, nullable=(mode != REQUIRED), metadata=metadata
            )
        )
    return T.StructType(fields)


def struct_type_to_api_repr(schema: T.StructType) -> list[dict]:
    """Spark StructType -> api_repr list (recursive inverse)."""
    out = []
    for f in schema.fields:
        dtype = f.dataType
        mode = NULLABLE if f.nullable else REQUIRED
        if isinstance(dtype, T.ArrayType):
            mode = REPEATED
            dtype = dtype.elementType
        meta_type = (f.metadata or {}).get("warehouse_type")
        if isinstance(dtype, T.StructType):
            out.append(
                {
                    "name": f.name,
                    "type": RECORD,
                    "mode": mode,
                    "fields": struct_type_to_api_repr(dtype),
                }
            )
            continue
        if meta_type:
            wtype = meta_type
        elif isinstance(dtype, T.DecimalType):
            wtype = BIGNUMERIC if dtype.scale == 18 else NUMERIC
        else:
            wtype = _SPARK_TO_WAREHOUSE.get(type(dtype), STRING)
        out.append({"name": f.name, "type": wtype, "mode": mode})
    return out


def convert(schema: list | T.StructType) -> list | T.StructType:
    """Type-dispatched bidirectional conversion
    (parity with bigquery/schema.py:267-295 ``convert``)."""
    if isinstance(schema, T.StructType):
        return struct_type_to_api_repr(schema)
    return api_repr_to_struct_type(list(schema))


# --- describe: box-drawing schema tree (bigquery/schema.py:301-434) -------


def describe(schema: list[dict] | T.StructType) -> str:
    """Pretty-print a schema as an aligned name/type/mode tree."""
    if isinstance(schema, T.StructType):
        schema = struct_type_to_api_repr(schema)

    rows: list[tuple[str, str, str]] = []

    def walk(fields: list[dict], prefix: str) -> None:
        for i, f in enumerate(fields):
            last = i == len(fields) - 1
            branch = "└─ " if last else "├─ "
            rows.append(
                (
                    prefix + branch + f["name"],
                    f.get("type", DEFAULT_TYPE),
                    f.get("mode", DEFAULT_MODE),
                )
            )
            if f.get("fields"):
                walk(f["fields"], prefix + ("   " if last else "│  "))

    walk(list(schema), "")
    if not rows:
        return "(empty schema)"
    w_name = max(len(r[0]) for r in rows)
    w_type = max(len(r[1]) for r in rows)
    return "\n".join(f"{n:<{w_name}}  {t:<{w_type}}  {m}" for n, t, m in rows)
