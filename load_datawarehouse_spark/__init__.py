"""load_datawarehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``denwong47/load_datawarehouse`` (a cloud-warehouse loading library:
schema inference over semi-structured records, key sanitation,
size-bounded chunking, table lifecycle) on top of Apache Spark,
plus the full relational / LLM-data-pipeline operator surface a
warehouse engine needs at 100 TB scale.

Design stance (see SURVEY.md §7):

- Everything is a lazy DataFrame plan; Catalyst + AQE do the
  relational optimization (predicate pushdown, broadcast selection,
  skew handling).
- The engine's own code is the schema subsystem (reference-faithful
  inference lattice), data-shaping utilities, the ``SparkWarehouse``
  verb surface, and the extended operator library.
- Python UDFs only where built-ins genuinely cannot express the
  semantics, and then always Arrow-batched (pandas UDFs).
"""

from load_datawarehouse_spark.session import get_spark, load_tables  # noqa: F401
from load_datawarehouse_spark.errors import (  # noqa: F401
    WarehouseAPIFaked,
    WarehouseAPINotInstalled,
    WarehouseAccessDenied,
    WarehouseCredentialsMissing,
    WarehouseInvalidInput,
    WarehouseRowOversize,
    WarehouseTableGenericError,
    WarehouseTableNotFound,
    WarehouseTableRowsInvalid,
)

__version__ = "0.1.0"
