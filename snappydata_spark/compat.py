"""Reference Python API compatibility: the camelCase SnappyContext /
SnappySession surface (reference python/pyspark/sql/snappy/context.py:26-158
and snappysession.py:25-152) over this engine's facade, so code written
against the reference's Python bindings runs unchanged.

Semantics matched:
- createTable(tableName, provider, schema, allowExisting, **options) —
  schema may be a StructType or the reference's parenthesized DDL string
  (``"(OrderId INT NOT NULL PRIMARY KEY, ItemId INT)"``); PRIMARY KEY
  columns become the engine's key_columns option.
- insert/put take a list of row tuples (or one tuple) and return the
  number of rows inserted/put, as the reference does.
- update(tableName, filterExpr, newColumnValues, updateColumns) takes the
  parallel value/column lists; returns the matched-row count.
- delete(tableName, filterExpr) returns the deleted-row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from snappydata_spark.dialect import parse_ddl_schema as _parse_ddl_schema
from snappydata_spark.session import SnappySession


class SnappyContext:
    """Drop-in for the reference's SnappyContext (context.py:26) /
    camelCase SnappySession methods.  Wraps either an existing engine
    SnappySession or a plain SparkSession."""

    def __init__(self, session: SnappySession | SparkSession, store_dir: str | None = None):
        if isinstance(session, SnappySession):
            self._sn = session
        else:
            self._sn = SnappySession(session, store_dir=store_dir)
        self.spark = self._sn.spark

    # ------------------------------------------------------------- catalog
    def createTable(
        self,
        tableName: str,
        provider: str | None = None,
        schema: StructType | str | None = None,
        allowExisting: bool = True,
        **options,
    ) -> DataFrame:
        provider = (provider or "column").lower()
        if provider in ("parquet", "org.apache.spark.sql.parquet"):
            provider = "column"
        opts = {k.lower(): v for k, v in options.items()}
        if isinstance(schema, str):
            schema, keys = _parse_ddl_schema(schema)
            if keys and "key_columns" not in opts:
                opts["key_columns"] = ",".join(keys)
        if self._sn.catalog.exists(tableName.lower()):
            if allowExisting:
                return self._sn.table(tableName)
            raise ValueError(f"table {tableName} already exists")
        self._sn.create_table(tableName, schema=schema, provider=provider, options=opts)
        return self._sn.table(tableName)

    def truncateTable(self, tableName: str, ifExists: bool = False) -> None:
        if ifExists and not self._sn.catalog.exists(tableName.lower()):
            return
        self._sn.truncate_table(tableName)

    def dropTable(self, tableName: str, ifExists: bool = False) -> None:
        self._sn.drop_table(tableName, if_exists=ifExists)

    # ----------------------------------------------------------- mutation
    def _rows_df(self, tableName: str, rows) -> DataFrame:
        if isinstance(rows, tuple):
            rows = [rows]
        if not isinstance(rows, list):
            raise TypeError("rows should be tuple or a list")
        return self.spark.createDataFrame(rows, self._sn.table(tableName).schema)

    def insert(self, tableName: str, rows) -> int:
        df = self._rows_df(tableName, rows)
        n = df.count()
        self._sn.insert(tableName, df)
        return n

    def put(self, tableName: str, rows) -> int:
        df = self._rows_df(tableName, rows)
        n = df.count()
        self._sn.put(tableName, df)
        return n

    def update(
        self, tableName: str, filterExpr: str, newColumnValues, updateColumns
    ) -> int:
        if not (isinstance(newColumnValues, list) and isinstance(updateColumns, list)):
            raise TypeError("newColumnValues and updateColumns should be list")
        matched = self._sn.table(tableName).filter(filterExpr).count()
        # resolve case-insensitively against the table's declared columns
        # (the reference store is case-insensitive for identifiers)
        actual = {c.lower(): c for c in self._sn.table(tableName).columns}
        assignments = {
            actual.get(c.lower(), c): F.lit(v)
            for c, v in zip(updateColumns, newColumnValues)
        }
        self._sn.update(tableName, filterExpr, assignments)
        return matched

    def delete(self, tableName: str, filterExpr: str) -> int:
        before = self._sn.table(tableName).count()
        self._sn.delete(tableName, filterExpr)
        return before - self._sn.table(tableName).count()

    # -------------------------------------------------------- passthrough
    def sql(self, sqlText: str):
        return self._sn.sql(sqlText)

    def table(self, tableName: str) -> DataFrame:
        return self._sn.table(tableName)
