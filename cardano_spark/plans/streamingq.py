"""Structured-Streaming-backed queries for the driver registry.

q34 runs a real file-source stream (availableNow) to completion and
returns the final aggregate table; its oracle is the same SQL as the
batch hourly rollup (q15) — streaming and batch must converge to the
same answer, which is exactly the guarantee Structured Streaming's
incremental execution model makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cardano_spark.plans.queries import QueryFn
from cardano_spark.streaming.jobs import (
    hourly_rollup,
    read_events_stream,
    run_to_memory,
    stream_exact_dedup,
)


def q34_stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    return run_to_memory(hourly_rollup(events), output_mode="complete")


def q48_stream_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (state-backed dropDuplicates) run to
    completion; oracle = the batch DISTINCT — stream/batch
    convergence, same guarantee as q34."""
    events = read_events_stream(spark, sf_dir)
    return run_to_memory(
        stream_exact_dedup(events, ["user_id", "event_type"]),
        output_mode="append",
    )


STREAMING_QUERIES: dict[str, QueryFn] = {
    "q34_stream_hourly_rollup": q34_stream_hourly_rollup,
    "q48_stream_exact_dedup": q48_stream_exact_dedup,
}

STREAMING_ORACLES: dict[str, str] = {
    # same as the batch q15 oracle minus the distinct-user count
    # (exact distincts are not streamable): stream==batch convergence
    "q34_stream_hourly_rollup": """
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               count(*) AS n,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    "q48_stream_exact_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
}
