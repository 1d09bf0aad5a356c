"""Bucketed warehouse layout: the shuffle-free co-located join path.

The reference delegates join strategy entirely to Postgres (its FK
equi-joins live in the table DDL,
/root/reference/database_management/cardano/cardano_tables.py:138-141,
and run in Hex; SURVEY §2.4 J2, §4); at 100 TB the fact-fact joins
(orders ⋈ lineitem on orderkey, tx ⋈ utxo on hash) are the dominant
shuffle. Spark's answer
is catalog-registered bucketing: both tables are written
``bucketBy(N, key)`` so rows co-locate by ``hash(key) % N`` at WRITE
time, and Catalyst's EnsureRequirements recognizes the matching
output partitioning at READ time — the exchange (and with ``sortBy``
the sort) disappears from every subsequent join or aggregation on the
bucket key. One write-side shuffle is amortized over every downstream
join; this is the same trade the ParquetMergeSink makes for merge I/O
(sinks/merge.py), surfaced for the analytics path.

Scale guidance: pick N so one bucket of the BIG table fits an
executor core's working set (e.g. 100 TB / 4096 buckets ≈ 25 GB —
pair with maxPartitionBytes so a bucket splits into row-group
tasks for scans but joins still match on bucket id). Both sides must
use the same N and key; dimension tables stay unbucketed and
broadcast (catalog.DIM_TABLES).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int,
) -> None:
    """Register ``df`` as an external parquet table bucketed (and
    sorted) on ``keys`` — the one-time shuffle that every later
    equi-join on ``keys`` skips."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(name)
    )


def bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back through the catalog (reading the
    bare parquet path would lose the bucket metadata and reintroduce
    the exchange)."""
    return spark.table(name)
