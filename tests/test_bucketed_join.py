"""Bucketed co-located joins: the write-once-shuffle-never path for
fact-fact joins at 100 TB (sources/bucketed.py). Pins that the
exchange actually disappears — the whole point of bucketing — and
that results are unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cardano_spark.catalog import table
from cardano_spark.sources.bucketed import bucketed, write_bucketed
from tests.conftest import SF_SMALL


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = table(spark, SF_SMALL, "orders")
    lineitem = table(spark, SF_SMALL, "lineitem")
    write_bucketed(orders, "b_orders", str(tmp_path / "bo"), ["o_orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        str(tmp_path / "bl"),
        ["o_orderkey"],
        8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed(spark, "b_orders").join(
            bucketed(spark, "b_lineitem"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket metadata honored
        assert "Bucketed: true" in plan

        # same join through the plain parquet path DOES shuffle —
        # the delta is precisely what bucketing removes
        plain = table(spark, SF_SMALL, "orders").join(
            table(spark, SF_SMALL, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan

        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the write-time
    shuffle: partial+final agg collapse into one stage."""
    agg = (
        bucketed(spark, "b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # values still correct vs the unbucketed path
    want = (
        table(spark, SF_SMALL, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, want.collect()))
