"""Pure mutation-rewrite semantics (reference contract: PUT INTO =
update-matched + insert-rest, ColumnTableBulkOps.scala:46-120; hard cases
from SURVEY.md §7 risk 2: null keys, duplicate source keys)."""

import pytest
from pyspark.sql import functions as F

from snappydata_spark import mutate


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double"
    )


def test_put_into_updates_and_inserts(spark, target):
    src = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)], "k int, v string, x double")
    out = mutate.put_into_df(target, src, ["k"]).orderBy("k").collect()
    assert [(r.k, r.v, r.x) for r in out] == [
        (1, "a", 10.0),
        (2, "B", 99.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]


def test_put_into_null_key_matches_null(spark):
    # eqNullSafe: a NULL key in source replaces a NULL-key row in target
    # (reference row tables treat PK null as a value via putInto join)
    tgt = spark.createDataFrame([(None, "old"), (1, "one")], "k int, v string")
    src = spark.createDataFrame([(None, "new")], "k int, v string")
    out = mutate.put_into_df(tgt, src, ["k"]).collect()
    got = {(r.k, r.v) for r in out}
    assert got == {(None, "new"), (1, "one")}


def test_put_into_duplicate_source_keys_pass_through(spark, target):
    # reference put-into does NOT conflate duplicate keys in source —
    # that's the sink's job (SnappySinkCallback:286-309)
    src = spark.createDataFrame([(2, "x", 1.0), (2, "y", 2.0)], "k int, v string, x double")
    out = mutate.put_into_df(target, src, ["k"])
    assert out.filter(F.col("k") == 2).count() == 2


def test_put_requires_keys(spark, target):
    with pytest.raises(ValueError):
        mutate.put_into_df(target, target, [])


def test_update_applies_only_where(spark, target):
    out = mutate.update_df(
        target, F.col("k") >= 2, {"x": F.col("x") * 10, "v": F.upper(F.col("v"))}
    ).orderBy("k").collect()
    assert [(r.k, r.v, r.x) for r in out] == [
        (1, "a", 10.0),
        (2, "B", 200.0),
        (3, "C", 300.0),
    ]


def test_update_assignments_see_pre_update_row(spark):
    # standard SQL UPDATE: RHS evaluates against the old row even when
    # another assignment writes the same column's source
    tgt = spark.createDataFrame([(1, 2, 3)], "k int, a int, b int")
    out = mutate.update_df(
        tgt, F.lit(True), {"a": F.col("b"), "b": F.col("a")}
    ).collect()[0]
    assert (out.a, out.b) == (3, 2)


def test_delete_where_and_null_predicate(spark):
    tgt = spark.createDataFrame([(1, 5), (2, None), (3, 20)], "k int, x int")
    # x > 10 is NULL for row 2 → three-valued logic: not deleted
    out = mutate.delete_df(tgt, F.col("x") > 10).orderBy("k").collect()
    assert [r.k for r in out] == [1, 2]


def test_delete_from_keys(spark, target):
    src = spark.createDataFrame([(1,), (3,), (99,)], "k int")
    out = mutate.delete_from_df(target, src, ["k"]).collect()
    assert [r.k for r in out] == [2]


def test_update_string_expressions(spark, target):
    out = mutate.update_df(target, "k = 1", {"x": "x + 5"}).orderBy("k").collect()
    assert out[0].x == 15.0 and out[1].x == 20.0


def test_update_key_column_forbidden(snappy):
    snappy.create_table(
        "ku_t", options={"key_columns": "k"},
        df=snappy.spark.createDataFrame([(1, "a")], "k int, v string"),
    )
    import pyspark.sql.functions as F
    with pytest.raises(ValueError, match="key column"):
        snappy.update("ku_t", F.lit(True), {"k": F.lit(9)})
    # via SQL dialect too
    with pytest.raises(ValueError, match="key column"):
        snappy.sql("UPDATE ku_t SET k = 9 WHERE v = 'a'")
    snappy.drop_table("ku_t")
