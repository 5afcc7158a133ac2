"""Scale-killer plan audit over the MUTATION / constraint-validation /
identity paths (tools/audit_plans.py sweeps only registry SELECTs — the
r7 identity-column global window shipped precisely because write-side
plans were never audited).

SnappySession._audit_plan records (tag, executedPlan) for every frame the
write paths are about to execute when `_plan_audit_log` is a list; this
module drives insert / put / update / delete / delete_from / UNIQUE / FK
/ identity traffic on a fixture store and runs tools.audit_plans.audit_text
over every captured plan."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from audit_plans import audit_text  # noqa: E402

from pyspark.sql import Window, functions as F  # noqa: E402


def _flags(log):
    out = {}
    for tag, plan in log:
        f = audit_text(plan)
        if f:
            out.setdefault(tag, set()).update(f)
    return out


@pytest.fixture()
def audited(snappy):
    snappy._plan_audit_log = []
    yield snappy
    snappy._plan_audit_log = None


def test_pre_r8_identity_shape_is_flagged(spark):
    """The checker itself must catch the exact shape the r8 fix removed:
    row_number over Window.orderBy(monotonically_increasing_id()) with no
    PARTITION BY — a single-task global sort of the whole insert batch."""
    df = spark.range(100).withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id())),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "window_unpartitioned" in audit_text(plan)


def test_identity_insert_plans_clean_multi_partition(audited):
    """A multi-partition identity insert: no unpartitioned Window in any
    captured write/validation plan, values unique and on the
    START/INCREMENT sequence (the VERDICT r7 'done' bar)."""
    sn = audited
    sn.sql(
        "CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 10, INCREMENT BY 5), v INT) USING column"
    )
    batch = sn.spark.range(0, 1000, 1, 8).select(
        F.lit(None).cast("long").alias("id"), F.col("id").cast("int").alias("v")
    )
    assert batch.rdd.getNumPartitions() > 1
    sn.insert("idt", batch)
    flags = _flags(sn._plan_audit_log)
    assert not flags, f"scale-killer plans on identity insert: {flags}"
    ids = [r.id for r in sn.table("idt").select("id").collect()]
    assert len(ids) == 1000 and len(set(ids)) == 1000
    assert all((i - 10) % 5 == 0 for i in ids)
    assert min(ids) == 10 and max(ids) == 10 + 5 * 999
    sn.sql("DROP TABLE idt")


def test_mutation_and_constraint_plans_clean(audited, sf_dir):
    """insert / put / update / delete / delete_from plus UNIQUE + FK
    validation probes on keyed fixture tables: zero audit flags across
    every captured plan."""
    sn = audited
    sn.sql(
        "CREATE TABLE par (pk INT NOT NULL PRIMARY KEY, label STRING, "
        "UNIQUE (label)) USING row"
    )
    sn.sql(
        "CREATE TABLE chi (ck INT NOT NULL PRIMARY KEY, pref INT, "
        "v DOUBLE, FOREIGN KEY (pref) REFERENCES par (pk)) "
        "USING column OPTIONS (key_columns 'ck')"
    )
    sn.sql("INSERT INTO par VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sn.sql("INSERT INTO chi VALUES (10, 1, 0.5), (11, 2, 1.5), (12, NULL, 9.0)")
    sn.sql("PUT INTO chi VALUES (11, 3, 2.5), (13, 1, 3.5)")
    sn.sql("UPDATE chi SET v = v + 1 WHERE ck > 10")
    sn.sql("DELETE FROM chi WHERE ck = 13")
    sn.delete_from("chi", sn.spark.createDataFrame([(12,)], "ck int"))
    with pytest.raises(ValueError):
        sn.sql("INSERT INTO chi VALUES (20, 99, 0.0)")  # FK violation
    with pytest.raises(ValueError):
        sn.sql("INSERT INTO par VALUES (4, 'a')")  # UNIQUE violation
    assert len(sn._plan_audit_log) > 10, "hook captured no mutation plans"
    flags = _flags(sn._plan_audit_log)
    assert not flags, f"scale-killer plans on mutation paths: {flags}"
    sn.sql("DROP TABLE chi")
    sn.sql("DROP TABLE par")
