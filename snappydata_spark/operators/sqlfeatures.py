"""SQL-feature breadth: set-op ALL variants, posexplode/lateral view,
math/regexp/array/conditional function families, UDF registration
(SURVEY.md §2.7, §2.10, §2.11)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import DoubleType

from snappydata_spark.functions import text as T
from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables


@register(
    "setop_all_variants",
    oracle="""
SELECT c_nationkey, COUNT(*) AS cnt FROM (
  (SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
   UNION ALL
   SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_acctbal > 9500
) GROUP BY c_nationkey
""",
)
def setop_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / EXCEPT ALL (multiset semantics — each occurrence in the
    right side cancels ONE occurrence on the left)."""
    t = load_tables(spark, sf_dir, ("customer",))
    c = t["customer"]
    left = (
        c.filter(F.col("c_acctbal") > 5000)
        .select("c_nationkey")
        .unionAll(c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey"))
    )
    minus = c.filter(F.col("c_acctbal") > 9500).select("c_nationkey")
    return left.exceptAll(minus).groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "lateral_posexplode",
    oracle="""
SELECT doc_id, x - 1 AS pos, t[x] AS token
FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
      FROM documents WHERE doc_id < 20),
     UNNEST(range(1, len(t) + 1)) AS u(x)
""",
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode (grammar SnappyParser.scala:1137-1151) —
    position-preserving token explosion."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            # T.tokens: a bare split yields [''] for blank text, which the
            # oracle's list_filter excludes
            F.posexplode(T.tokens(F.col("text"))).alias("pos", "token"),
        )
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT l_linenumber,
       CAST(ROUND(SUM(CAST(sqrt(l_quantity) AS DECIMAL(28,16))), 4)
            AS DOUBLE) AS sum_sqrt,
       CAST(ROUND(SUM(CAST(pow(l_discount, 2) AS DECIMAL(28,16))), 6)
            AS DOUBLE) AS sum_sq,
       CAST(ROUND(SUM(CAST(abs(l_extendedprice - 1000) AS DECIMAL(12,2))), 2)
            AS DOUBLE) AS sum_absdev,
       CAST(ROUND(SUM(CAST(ln(l_quantity) AS DECIMAL(28,16))), 4)
            AS DOUBLE) AS sum_ln,
       CAST(SUM(CAST(floor(l_extendedprice / 100) AS BIGINT)) AS BIGINT) AS sum_floor,
       CAST(SUM(CAST(ceil(l_quantity / 7) AS BIGINT)) AS BIGINT) AS sum_ceil,
       CAST(SUM(CAST(l_orderkey AS BIGINT) % 97) AS BIGINT) AS sum_mod
FROM lineitem
GROUP BY l_linenumber
""",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (inherited registry §2.10).

    Sums of IRRATIONAL doubles (sqrt/pow/ln) cannot be made exact, but
    can be made ORDER-INDEPENDENT: both engines compute the identical
    IEEE double per row, cast it to DECIMAL(28,16), and decimal
    addition is associative — double sums flipped the last rounded
    digit at the sf10 differential.  The two engines' double→decimal
    casts are NOT bit-identical at the 16th digit (DuckDB scales by
    10^16 in double arithmetic, which overflows 2^53 for values ≥~1,
    while Spark rounds the decimal string HALF_UP), so per-row decimals
    can differ by a few ulps at scale 16; the 4-6dp output rounding
    absorbs that drift, which is what the differential verifies.  abs(money-1000) is exact
    2-decimal, so it takes the standard DECIMAL(12,2) path."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_linenumber")
        .agg(
            F.expr(
                "CAST(ROUND(SUM(CAST(sqrt(l_quantity) AS DECIMAL(28,16))),"
                " 4) AS DOUBLE) AS sum_sqrt"
            ),
            F.expr(
                "CAST(ROUND(SUM(CAST(pow(l_discount, 2) AS DECIMAL(28,16))),"
                " 6) AS DOUBLE) AS sum_sq"
            ),
            F.expr(
                "CAST(ROUND(SUM(CAST(abs(l_extendedprice - 1000)"
                " AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_absdev"
            ),
            F.expr(
                "CAST(ROUND(SUM(CAST(ln(l_quantity) AS DECIMAL(28,16))),"
                " 4) AS DOUBLE) AS sum_ln"
            ),
            F.sum(F.floor(F.col("l_extendedprice") / 100).cast("long")).alias(
                "sum_floor"
            ),
            F.sum(F.ceil(F.col("l_quantity") / 7).cast("long")).alias("sum_ceil"),
            F.sum(F.col("l_orderkey").cast("long") % 97).alias("sum_mod"),
        )
    )


@register(
    "scalar_regexp_funcs",
    oracle="""
SELECT c_custkey,
       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
       regexp_matches(c_name, '^Customer#0+[0-9]+$') AS well_formed,
       regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devoweled
FROM customer WHERE c_custkey < 100
""",
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: extract / match-test / global replace."""
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 100)
        .select(
            "c_custkey",
            F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long").alias("name_num"),
            F.col("c_name").rlike(r"^Customer#0+[0-9]+$").alias("well_formed"),
            F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("devoweled"),
        )
    )


@register(
    "scalar_conditional_funcs",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'),
                              'UNSPECIFIED') = 'UNSPECIFIED'
                THEN 1 ELSE 0 END) AS BIGINT) AS unspecified_cnt,
       CAST(ROUND(SUM(CAST(greatest(o_totalprice, 10000.0) AS DECIMAL(12,2))), 2)
            AS DOUBLE) AS sum_floor_10k,
       CAST(ROUND(SUM(CAST(least(o_totalprice, 50000.0) AS DECIMAL(12,2))), 2)
            AS DOUBLE) AS sum_cap_50k
FROM orders GROUP BY o_orderstatus
""",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / GREATEST / LEAST."""
    t = load_tables(spark, sf_dir, ("orders",))
    unspec = F.coalesce(
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
        F.lit("UNSPECIFIED"),
    )
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(unspec == "UNSPECIFIED", 1).otherwise(0)).alias(
                "unspecified_cnt"
            ),
            # decimal accumulation: greatest/least of 2-decimal money is
            # still exact 2-decimal; status groups absorb the whole
            # scaling table (double sums drift a cent — sf10 catch class)
            F.expr(
                "CAST(ROUND(SUM(CAST(greatest(o_totalprice, 10000.0)"
                " AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_floor_10k"
            ),
            F.expr(
                "CAST(ROUND(SUM(CAST(least(o_totalprice, 50000.0)"
                " AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_cap_50k"
            ),
        )
    )


@register(
    "array_funcs_embeddings",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(embedding[1]::DOUBLE, 4) AS first_val,
       ROUND(list_aggregate([v::DOUBLE for v in embedding[1:8]], 'sum'), 4)
           AS head_sum,
       ROUND(list_max([v::DOUBLE for v in embedding]), 4) AS max_val,
       ROUND(list_min([v::DOUBLE for v in embedding]), 4) AS min_val
FROM embeddings WHERE vec_id < 50
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over the embedding column: size / index /
    slice-fold / max / min (§1.2 nested types)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.element_at(dbl, 1), 4).alias("first_val"),
            F.round(
                F.aggregate(
                    F.slice(dbl, 1, 8), F.lit(0.0), lambda a, x: a + x
                ),
                4,
            ).alias("head_sum"),
            F.round(F.array_max(dbl), 4).alias("max_val"),
            F.round(F.array_min(dbl), 4).alias("min_val"),
        )
    )


@register(
    "udf_python_registered",
    oracle="""
SELECT o_orderstatus,
       CAST(ROUND(SUM(CAST(ROUND(o_totalprice * 0.07, 2) AS DECIMAL(12,2))), 2)
            AS DOUBLE) AS total_tax
FROM orders GROUP BY o_orderstatus
""",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE FUNCTION surface (SnappyDDLParser.createFunction:765-795) →
    spark.udf.register.  Deliberately a slow-path row UDF: the point is
    the registration contract; the pandas variant below is the fast path."""

    def tax(p: float) -> float:
        # half-away-from-zero to match SQL ROUND (Python's round() is
        # half-even and drifts from the oracle on .xx5 boundaries —
        # surfaced at sf0.1, invisible at sf0.01)
        import math

        return math.floor(p * 0.07 * 100 + 0.5) / 100 if p is not None else None

    spark.udf.register("py_tax", tax, DoubleType())
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("orders_udf_v")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(ROUND(SUM(CAST(py_tax(o_totalprice) AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_tax
        FROM orders_udf_v GROUP BY o_orderstatus
        """
    )


@register(
    "udf_pandas_vectorized",
    oracle="""
SELECT o_orderstatus,
       CAST(ROUND(SUM(CAST(ROUND(o_totalprice * 0.07, 2) AS DECIMAL(12,2))), 2)
            AS DOUBLE) AS total_tax
FROM orders GROUP BY o_orderstatus
""",
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas_udf — the 10-100× faster path for
    unavoidable Python (SURVEY.md scale stance)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def pd_tax(p: pd.Series) -> pd.Series:
        import numpy as np

        # half-away-from-zero to match SQL ROUND (pandas .round is
        # half-even and would drift from the oracle on .xx5 boundaries)
        return np.floor(p * 0.07 * 100 + 0.5) / 100

    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(pd_tax(F.col("o_totalprice")).cast("decimal(12,2)")), 2
            )
            .cast("double")
            .alias("total_tax")
        )
    )


@register(
    "udtf_lateral_split",
    oracle="""
SELECT doc_id,
       COUNT(*) AS n_words,
       COUNT(DISTINCT word) AS n_distinct,
       MAX(LENGTH(word)) AS max_len
FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 40
)
WHERE word <> ''
GROUP BY doc_id
""",
)
def udtf_lateral_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (the reference's table-valued-function +
    LATERAL VIEW grammar, SnappyParser.scala:657-675,1137-1151): a
    registered table function called per input row via SQL LATERAL,
    fanning one document into one row per word.  The UDTF streams rows
    out per partition (Arrow-batched) — no driver fan-out; the word
    rows are aggregated back per doc so the result is hash-stable."""
    from ..session import SnappySession

    def split_words(text):
        if text is None:
            return
        for pos, w in enumerate(text.split(" ")):
            if w:
                yield w, pos

    SnappySession.register_table_function(
        spark, "split_words_tf", split_words, "word string, pos int"
    )
    t = load_tables(spark, sf_dir, ("documents",))
    t["documents"].filter(F.col("doc_id") < 40).createOrReplaceTempView(
        "docs_udtf_v"
    )
    return spark.sql(
        """
        SELECT d.doc_id,
               COUNT(*) AS n_words,
               COUNT(DISTINCT w.word) AS n_distinct,
               MAX(LENGTH(w.word)) AS max_len
        FROM docs_udtf_v d, LATERAL split_words_tf(d.text) w
        GROUP BY d.doc_id
        """
    )


@register(
    "join_types_matrix",
    oracle="""
WITH big AS (SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey <= 60),
     dim AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10)
SELECT 'full' AS join_kind, COUNT(*) AS n,
       COUNT(c_custkey) AS left_rows, COUNT(n_name) AS right_rows
FROM big FULL OUTER JOIN dim ON c_nationkey = n_nationkey
UNION ALL
SELECT 'anti', COUNT(*), COUNT(c_custkey), 0
FROM big ANTI JOIN dim ON c_nationkey = n_nationkey
UNION ALL
SELECT 'cross', COUNT(*), COUNT(c_custkey), COUNT(n_name)
FROM big CROSS JOIN dim
""",
)
def join_types_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-type coverage beyond the TPC-H set (parser joinType rule
    SnappyParser.scala:701-713): FULL OUTER (null-extended both sides),
    LEFT ANTI, CROSS — counted so the matrix is one hashable row each."""
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    big = t["customer"].filter(F.col("c_custkey") <= 60).select(
        "c_custkey", "c_nationkey"
    )
    dim = t["nation"].filter(F.col("n_nationkey") < 10).select(
        "n_nationkey", "n_name"
    )
    on = F.col("c_nationkey") == F.col("n_nationkey")

    def counted(kind, df, with_right=True):
        right = (
            F.count("n_name") if with_right else F.lit(0).cast("long")
        )
        return df.agg(
            F.lit(kind).alias("join_kind"),
            F.count(F.lit(1)).alias("n"),
            F.count("c_custkey").alias("left_rows"),
            right.alias("right_rows"),
        )

    full = counted("full", big.join(dim, on, "full_outer"))
    anti = counted("anti", big.join(dim, on, "left_anti"), with_right=False)
    cross = counted("cross", big.crossJoin(dim))
    return full.unionAll(anti).unionAll(cross)


@register(
    "unpivot_stack",
    oracle="""
SELECT o_orderpriority, metric, ROUND(val, 2) AS val FROM (
  SELECT o_orderpriority,
         ROUND(AVG(o_totalprice), 2) AS avg_price,
         ROUND(MAX(o_totalprice), 2) AS max_price,
         ROUND(MIN(o_totalprice), 2) AS min_price
  FROM orders GROUP BY o_orderpriority)
UNPIVOT (val FOR metric IN (avg_price, max_price, min_price))
""",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long; the inverse of the PIVOT grammar
    SnappyParser.scala:1152-1165) via DataFrame.unpivot."""
    t = load_tables(spark, sf_dir, ("orders",))
    wide = (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )
    return wide.unpivot(
        "o_orderpriority",
        ["avg_price", "max_price", "min_price"],
        "metric",
        "val",
    ).select("o_orderpriority", "metric", F.round("val", 2).alias("val"))


@register(
    "sql_correlated_scalar_subquery",
    oracle="""
SELECT c_custkey, c_acctbal,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
WHERE c_acctbal > 9000
""",
)
def sql_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery straight through the SQL entry point —
    Catalyst decorrelates it to a left-outer aggregate join
    (RewriteCorrelatedScalarSubquery, inherited by the reference and us)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    t["customer"].createOrReplaceTempView("sq_customer")
    t["orders"].createOrReplaceTempView("sq_orders")
    return spark.sql(
        """SELECT c_custkey, c_acctbal,
                  (SELECT COUNT(*) FROM sq_orders o
                   WHERE o.o_custkey = c.c_custkey) AS n_orders
           FROM sq_customer c
           WHERE c_acctbal > 9000"""
    )


@register(
    "udaf_grouped_median",
    oracle="""
SELECT o_orderstatus,
       ROUND(MEDIAN(o_totalprice), 2) AS med_price,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom AGGREGATE function (the reference's UDAF jars,
    SnappyUDFTest.scala UDAF cases) as a grouped-agg pandas UDF — the
    SnappySession.create_function(aggregate=True) path.  Runs as a real
    hash aggregate over Arrow batches: only group keys + group values
    shuffle.  Two UDAFs compose in one GROUP BY (Spark disallows mixing
    grouped-agg pandas UDFs with built-in aggregates, so the row count is
    itself a UDAF).  Median interpolation (mean of the two middle values
    on even counts) matches DuckDB's MEDIAN on DOUBLE exactly."""
    from snappydata_spark.session import SnappySession

    def median_of(v: pd.Series) -> float:
        import numpy as np

        return float(np.median(v))

    SnappySession.register_aggregate(spark, "sg_median", median_of, "double")
    SnappySession.register_aggregate(spark, "sg_count", len, "long")
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("sg_median(o_totalprice)"), 2).alias("med_price"),
            F.expr("sg_count(o_totalprice)").alias("n"),
        )
    )
