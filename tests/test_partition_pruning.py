"""Partition pruning: the reference's height/date-keyed S3 layout
(SURVEY §4 "partition-keyed layout") maps to `partitionBy` writes
whose directory keys Catalyst prunes at planning time. Pins that a
selective filter on the partition column reaches the scan as a
PartitionFilter and that only the matching directories are read —
the difference between scanning 1 day and 1 year at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from cardano_spark.catalog import table
from tests.conftest import SF_SMALL


def test_date_partitioned_events_prune_to_filtered_days(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = table(spark, SF_SMALL, "events").withColumn(
        "d", F.to_date("ts")
    )
    ev.write.partitionBy("d").parquet(out)

    one_day = spark.read.parquet(out).filter(F.col("d") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "isnotnull(d" in plan or "d#" in plan.split("PartitionFilters", 1)[1][:200]

    # physical proof, not just plan text: the pruned scan reads only
    # the matching partition's files
    scan_files = one_day.select(
        F.input_file_name().alias("f")
    ).distinct().collect()
    assert scan_files and all("d=2024-01-03" in r.f for r in scan_files)

    # values identical to a post-scan filter over the unpartitioned table
    want = ev.filter(F.col("d") == "2024-01-03").count()
    assert one_day.count() == want


def test_partition_pruning_composes_with_pushed_filters(spark, tmp_path):
    """A query filtering on partition key AND a data column gets BOTH
    prunings: directory-level (PartitionFilters) and row-group-level
    (PushedFilters)."""
    out = str(tmp_path / "events_by_day2")
    ev = table(spark, SF_SMALL, "events").withColumn("d", F.to_date("ts"))
    ev.write.partitionBy("d").parquet(out)

    q = (
        spark.read.parquet(out)
        .filter((F.col("d") == "2024-01-05") & (F.col("event_type") == "purchase"))
        .select("event_id", "user_id")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters", 1)[1][:300]
    assert "2024-01-05" in part or "19727" in part  # date literal (or its epoch-day)
    assert "EqualTo(event_type,purchase)" in plan
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "props" not in read and "value" not in read


def test_normalize_events_restores_ts_pushdown(spark, tmp_path):
    """The one-shot nanos->micros rewrite (catalog.normalize_events):
    a TIMESTAMP(NANOS) events file — whose on-the-fly conversion hides
    ts from the scan — becomes a micros dataset where a ts predicate
    reaches PushedFilters, with identical row content. Idempotent on
    already-micros input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cardano_spark.catalog import _read_events, normalize_events

    base = 1_700_000_000
    src = tmp_path / "nanos"
    src.mkdir()
    tbl = pa.table(
        {
            "event_id": [1, 2, 3],
            "ts": pa.array(
                [(base + i * 60) * 10**9 for i in range(3)],
                pa.timestamp("ns"),
            ),
            "user_id": [10, 20, 30],
            "event_type": ["a", "b", "a"],
            "value": [1.0, 2.0, 3.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    pq.write_table(tbl, str(src / "events.parquet"))

    dest = str(tmp_path / "micros")
    assert normalize_events(spark, str(src), dest) == 3

    out = spark.read.parquet(dest)
    want = sorted(map(tuple, _read_events(spark, str(src)).collect()))
    assert sorted(map(tuple, out.collect())) == want

    plan = (
        out.filter(F.col("ts") > "2023-11-14 22:14:00")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts" in plan

    # idempotent: normalizing the normalized dataset round-trips
    dest2 = str(tmp_path / "micros2")
    assert normalize_events(spark, dest, dest2) == 3
    assert sorted(map(tuple, spark.read.parquet(dest2).collect())) == want


def test_read_events_nanos_on_foreign_session(spark, tmp_path):
    """The correctness driver builds its OWN bare SparkSession (no
    nanos-as-long conf). catalog._read_events must still read a
    TIMESTAMP(NANOS) events file there — ensure_nanos_compat
    (session.py) is its escape hatch. Simulated with newSession() +
    the conf explicitly set false."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cardano_spark.catalog import _read_events

    src = tmp_path / "ev"
    src.mkdir()
    base = 1_700_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": [1, 2],
                "ts": pa.array(
                    [base * 10**9, (base + 60) * 10**9], pa.timestamp("ns")
                ),
                "user_id": [1, 2],
                "event_type": ["a", "b"],
                "value": [1.0, 2.0],
                "props": ["{}", "{}"],
            }
        ),
        str(src / "events.parquet"),
    )
    foreign = spark.newSession()
    foreign.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    got = sorted(
        (r.event_id, r.ts) for r in _read_events(foreign, str(src)).collect()
    )
    want = sorted(
        (r.event_id, r.ts) for r in _read_events(spark, str(src)).collect()
    )
    assert got == want and len(got) == 2
