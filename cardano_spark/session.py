"""SparkSession factory.

All scale-sensitive knobs live here, once. Local testing runs on
``local[$SPARK_GRAFT_CPUS]`` (single JVM); production is a real
cluster — nothing below assumes local mode except the master URL
default.

Scale notes (100 TB target):
- AQE on: runtime coalescing of post-shuffle partitions, skew-join
  splitting, and dynamic join-strategy demotion replace any manual
  batch-size tuning the reference did (SURVEY §4 "batching").
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound;
  AQE coalesces down. On a real cluster raise it to ~2-3x total cores.
- Arrow enabled for every pandas interchange (Pandas UDFs are the
  sanctioned slow path, row-at-a-time UDFs are banned in this repo).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "cardano-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet has shipped as TIMESTAMP(NANOS) in some data
        # drops; the vectorized reader rejects that type outright, so
        # sessions read nanos as long and catalog._read_events converts
        # losslessly. Harmless for micros-shaped data.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_nanos_compat(spark: SparkSession) -> None:
    """Set the nanos-as-long reader conf on a session NOT built by
    :func:`get_spark` (the correctness driver constructs its own bare
    session). All session-config mutation lives in this module; the
    readers call this instead of touching ``spark.conf`` themselves."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
