"""JDBC read/append path.

The reference exposes JDBC both as an external datasource
(JDBCAppendableRelation — row tables reachable over JDBC, docs
README.md:21-24 list JDBC among the sources) and as its own wire protocol
(the GemFireXD store is Derby-derived, so its JDBC surface IS Derby's).

Spark-first equivalent: the built-in `jdbc` datasource.  Reads become a
`JDBCRelation` scan — Catalyst pushes filters and column pruning into the
generated SQL, and `partition_column`/`num_partitions` split the read into
parallel per-executor range queries (the 100 TB path: never one giant
single-connection read).  Appends batch rows per partition through
executor-local connections.

The test/demo database is embedded Apache Derby — shipped in Spark's own
jars directory (derby-10.16), zero install, and fittingly the same engine
family as the reference's store.  Any other JDBC driver on the classpath
works identically (`driver=` option).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    """Connection URL for an embedded Derby database directory."""
    return f"jdbc:derby:{db_path}" + (";create=true" if create else "")


def _apply(reader_or_writer, url: str, table: str, driver: str | None, opts: dict):
    out = (
        reader_or_writer.option("url", url)
        .option("dbtable", table)
        .option("driver", driver or DERBY_DRIVER)
    )
    for k, v in opts.items():
        out = out.option(k, v)
    return out


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """Read a JDBC table (or a `(subquery) alias` pushdown).  With
    `partition_column` + bounds + `num_partitions`, Spark issues one range
    query per partition so the scan parallelizes across executors instead
    of funneling through a single connection."""
    reader = _apply(spark.read.format("jdbc"), url, table, driver, options)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "jdbc_read: partition_column requires lower_bound and "
                "upper_bound (they would otherwise reach Spark as the "
                "string 'None' and fail deep inside JDBCRelation)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batch_size: int = 10_000,
    **options,
) -> None:
    """Append (or overwrite/create) a DataFrame into a JDBC table
    (JDBCAppendableRelation insert path).  Each Spark partition opens its
    own connection and writes `batchsize`-row JDBC batches — insert
    parallelism equals partition count."""
    options.setdefault("batchsize", str(batch_size))
    _apply(df.write.format("jdbc"), url, table, driver, options).mode(mode).save()
