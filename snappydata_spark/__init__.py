"""snappydata_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TIBCOSoftware/snappydata.

Everything is re-expressed Spark-first (DataFrame / SQL / Catalyst /
Structured Streaming); nothing is ported from the reference's Scala/Java
execution machinery.  The reference's API surface that we mirror is the thin
Python one (reference: python/pyspark/sql/snappy/snappysession.py:26-138 —
createTable / truncateTable / dropTable / insert / put / update / delete)
plus its SQL dialect extras (PUT INTO, DELETE FROM via DataFrame,
stream windows) and its AQP-lite surface.
"""

from snappydata_spark.session import (
    LockTimeout,
    QueryCancelled,
    SnappySession,
    TransactionConflict,
    get_spark,
)
from snappydata_spark.compat import SchemaDStream, SnappyContext, SnappyStreamingContext
from snappydata_spark.tables import load_tables, register_views, TPCH_TABLES

__all__ = [
    "LockTimeout",
    "QueryCancelled",
    "SnappySession",
    "TransactionConflict",
    "SnappyContext",
    "SnappyStreamingContext",
    "SchemaDStream",
    "get_spark",
    "load_tables",
    "register_views",
    "TPCH_TABLES",
]

__version__ = "0.1.0"
