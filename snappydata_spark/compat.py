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
        # DDL-string schemas (PRIMARY KEY → key_columns, CHECK → checks)
        # are parsed by create_table itself — no pre-parse here
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
    def _rows_df(self, tableName: str, rows):
        if isinstance(rows, tuple):
            rows = [rows]
        if not isinstance(rows, list):
            raise TypeError("rows should be tuple or a list")
        df = self.spark.createDataFrame(rows, self._sn.table(tableName).schema)
        # the row count is known locally — a df.count() here was a whole
        # extra Spark job per call just to return len(rows)
        return df, len(rows)

    def insert(self, tableName: str, rows) -> int:
        df, n = self._rows_df(tableName, rows)
        self._sn.insert(tableName, df)
        return n

    def put(self, tableName: str, rows) -> int:
        df, n = self._rows_df(tableName, rows)
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
        # delete removes exactly the pred-true rows: one predicate-pruned
        # count (same accounting update() uses) instead of two full scans
        n = self._sn.table(tableName).filter(filterExpr).count()
        self._sn.delete(tableName, filterExpr)
        return n

    # -------------------------------------------------------- passthrough
    def setCurrentSchema(self, schemaName: str) -> None:
        """SnappyContext.setCurrentSchema (SnappyContext.scala:620)."""
        self._sn.set_current_schema(schemaName)

    def sql(self, sqlText: str):
        return self._sn.sql(sqlText)

    def sqlUncached(self, sqlText: str):
        """SnappySession.sqlUncached (apireference_guide.md:68-90)."""
        return self._sn.sql_uncached(sqlText)

    def table(self, tableName: str) -> DataFrame:
        return self._sn.table(tableName)

    def getKeyColumns(self, tableName: str) -> list:
        """SnappySessionCatalog.getKeyColumns (apireference_guide.md:558)."""
        return self._sn.key_columns(tableName)

    def getKeyColumnsAndPositions(self, tableName: str) -> list:
        """SnappySessionCatalog.getKeyColumnsAndPositions
        (apireference_guide.md:581)."""
        return self._sn.key_columns_and_positions(tableName)

    def createSampleTable(
        self, tableName: str, baseTable: str, samplingOptions: dict,
        allowExisting: bool = False,
    ) -> None:
        """SnappySession.createSampleTable (apireference_guide.md:225)."""
        if allowExisting and self._sn.catalog.exists(tableName):
            return
        self._sn._create_sample_table(
            tableName, baseTable,
            {k.lower(): str(v) for k, v in samplingOptions.items()},
        )

    def createApproxTSTopK(
        self, topKName: str, baseTable: str, keyColumnName: str,
        topkOptions: dict | None = None, allowExisting: bool = False,
    ) -> None:
        """SnappySession.createApproxTSTopK (apireference_guide.md:261)."""
        if allowExisting and self._sn.catalog.exists(topKName):
            return
        opts = {k.lower(): str(v) for k, v in (topkOptions or {}).items()}
        opts["key"] = keyColumnName
        self._sn._create_topk_table(topKName, baseTable, opts)

    def queryApproxTSTopK(
        self, topKName: str, startTime: str | None = None,
        endTime: str | None = None, k: int = -1,
    ) -> DataFrame:
        """SnappySession.queryApproxTSTopK (apireference_guide.md:450)."""
        return self._sn.query_approx_ts_topk(
            topKName, startTime, endTime, k=(k if k > 0 else None)
        )


class SchemaDStream:
    """Compat shim for the reference's SchemaDStream (python/pyspark/
    streaming/snappy/snappydstream.py:22-46): schema'd stream +
    `foreachDataFrame(func)`.  The reference implements foreachDataFrame
    as DStream.foreachRDD → createDataFrame; on Structured Streaming the
    same contract is writeStream.foreachBatch — func receives each
    micro-batch as a DataFrame once the context starts."""

    def __init__(self, snsc: "SnappyStreamingContext", df: DataFrame, name: str):
        self._snsc = snsc
        self._df = df
        self._name = name
        self.schema = df.schema

    def dataframe(self) -> DataFrame:
        return self._df

    def foreachDataFrame(self, func) -> None:
        self._snsc._sn.register_cq(
            self._df,
            name=self._name,
            sink=lambda batch, _bid: func(batch),
        )


class SnappyStreamingContext:
    """Compat facade for the reference's Python SnappyStreamingContext
    (python/pyspark/streaming/snappy/context.py:13-171: __init__ with
    batchDuration, sql, start, stop, createSchemaDStream) and its Scala
    registerCQ (SnappyStreamingContext.scala:171-193).  DStreams no longer
    exist in Spark 4; the same API runs on Structured Streaming — the
    batch duration becomes the processing-time trigger and CQs become
    streaming DataFrames started/stopped together."""

    def __init__(
        self,
        session: SnappySession | SparkSession,
        batchDuration: float | None = None,
        store_dir: str | None = None,
    ):
        if isinstance(session, SnappySession):
            self._sn = session
        else:
            self._sn = SnappySession(session, store_dir=store_dir)
        self.spark = self._sn.spark
        if batchDuration is not None:
            self._sn._streaming_trigger = f"{int(batchDuration * 1000)} milliseconds"
        self._next_cq = 0

    def sql(self, sqlText: str):
        """CREATE STREAM TABLE / CQ SQL / anything else — the reference's
        snsc.sql delegates to its SnappySession (context.py:141-145)."""
        return self._sn.sql(sqlText)

    def registerCQ(self, queryStr: str, name: str | None = None) -> SchemaDStream:
        df = self._sn.sql(queryStr)
        if df is None or not df.isStreaming:
            raise ValueError("registerCQ requires a query over a stream table")
        return SchemaDStream(self, df, self._cq_name(name))

    def _cq_name(self, name: str | None) -> str:
        """Default names are reserved EAGERLY: deriving them from
        len(_cqs) at foreachDataFrame time gave two unnamed CQs the same
        name — the second silently replaced the first in the registry."""
        if name is not None:
            return name.lower()
        n = f"cq{self._next_cq}"
        self._next_cq += 1
        return n

    def createSchemaDStream(self, df: DataFrame, name: str | None = None) -> SchemaDStream:
        """Wrap an existing streaming DataFrame (the reference wraps a
        DStream + StructType, context.py:164-171 — here the frame already
        carries its schema)."""
        if not isinstance(df, DataFrame) or not df.isStreaming:
            raise TypeError("createSchemaDStream expects a streaming DataFrame")
        return SchemaDStream(self, df, self._cq_name(name))

    def start(self) -> None:
        self._sn.start_streaming()

    def stop(self, stopSparkContext: bool = False, stopGraceFully: bool = True) -> None:
        self._sn.stop_streaming()
        if stopSparkContext:
            # reference semantics: tear the Spark application down too
            self.spark.stop()

    def awaitTerminationOrTimeout(self, timeout: float) -> bool:
        """True once no CQ of this context is still active."""
        import time as _t

        deadline = _t.time() + timeout
        while _t.time() < deadline:
            if not any(q.isActive for q in self._sn._active_cqs.values()):
                return True
            _t.sleep(0.1)
        return not any(q.isActive for q in self._sn._active_cqs.values())
