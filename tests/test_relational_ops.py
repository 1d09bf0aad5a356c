"""Unit tests for the core relational building blocks."""

from __future__ import annotations

from pyspark.sql import functions as F

from cardano_spark.operators.relational import insert_if_absent, missing_children, topk


def test_insert_if_absent_keeps_existing_rows(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    incoming = spark.createDataFrame(
        [(2, "CHANGED"), (3, "c"), (3, "c-dup")], "id long, v string"
    )
    out = insert_if_absent(existing, incoming, ["id"]).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 3]
    assert out[1].v == "b"  # ON CONFLICT DO NOTHING: existing wins
    assert out[2].v in ("c", "c-dup")  # batch-internal dedup picked one


def test_insert_if_absent_is_idempotent(spark):
    existing = spark.createDataFrame([(1, "a")], "id long, v string")
    incoming = spark.createDataFrame([(2, "b")], "id long, v string")
    once = insert_if_absent(existing, incoming, ["id"])
    twice = insert_if_absent(once, incoming, ["id"])
    assert twice.count() == once.count() == 2


def test_missing_children_left_anti(spark):
    parents = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    children = spark.createDataFrame([(1,), (1,), (3,)], "k long")
    out = missing_children(parents, children, ["k"]).collect()
    assert [r.k for r in out] == [2]


def test_topk_is_take_ordered(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    plan = topk(df, [F.desc("v"), F.asc("id")], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = topk(df, [F.desc("v"), F.asc("id")], 5).collect()
    assert len(rows) == 5 and rows[0].v == 6
