"""Watermark state + dependency gates (SURVEY.md §2.5 A1/A2, §2.4 J4).

The reference keeps two Postgres tables —
``provider_to_s3_import_status`` (keyed by block_height) and
``s3_to_db_import_status`` (keyed by file_modified_date) — and every
pipeline reads ``coalesce(max(wm), default)`` before running and
upserts a new row after (provider_to_s3_import_status_dao.py:38-69,
s3_to_db_import_status_dao.py:40-79).

This module reproduces that as an append-only parquet ledger: an
upsert is an append (the PK (table, wm) makes replays harmless — max
is idempotent), a read is ``max(wm) WHERE table=:t``. The ledger is
tiny (one row per pipeline run), so driver-side reads are fine at any
scale; swap the store for a JDBC table in production by implementing
the same three methods.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Generic, TypeVar

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

W = TypeVar("W", int, datetime)

#: the reference's default start block when no watermark exists
#: (cardano_blocks_to_s3_pipeline.py:48; NB the original has an
#: operator-precedence bug `wm+1 or DEFAULT` — we implement the intent)
DEFAULT_START_BLOCK = 11_292_700


class ParquetWatermarkStore(Generic[W]):
    """One watermark ledger (mirrors one of the two status tables)."""

    def __init__(self, spark: SparkSession, path: str, wm_col: str, wm_type: T.DataType):
        self.spark = spark
        self.path = path
        self.wm_col = wm_col
        self.schema = T.StructType(
            [
                T.StructField("table", T.StringType(), False),
                T.StructField(wm_col, wm_type, False),
                T.StructField("created_at", T.TimestampType(), False),
            ]
        )

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read_latest(self, table: str) -> W | None:
        """``SELECT max(wm) WHERE table=:t`` (A1/A2)."""
        if not self._exists():
            return None
        df = self.spark.read.schema(self.schema).parquet(self.path)
        row = df.filter(F.col("table") == table).agg(
            F.max(self.wm_col).alias("wm")
        ).collect()[0]
        return row["wm"]

    def upsert(self, table: str, value: W) -> None:
        """Append one status row (K5). PK-duplicate appends are
        harmless because reads take max().

        The row is built as a JVM LocalRelation (range + literals),
        not ``createDataFrame([...])``: writing a pickled-Python-RDD-
        rooted frame runs the write task through the Python runner —
        measured ~5.8 s PER 1-ROW APPEND on this sandbox vs 0.26 s
        for the literal form (r12; guide §5 "the driver should do
        almost no data work") — and every pipeline step pays this."""
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        row_df = self.spark.range(1).select(
            F.lit(table).alias("table"),
            F.lit(value).cast(self.schema[1].dataType).alias(self.wm_col),
            F.lit(now).cast(T.TimestampType()).alias("created_at"),
        )
        row_df.coalesce(1).write.mode("append").parquet(self.path)


def provider_to_s3_store(spark: SparkSession, root: str) -> ParquetWatermarkStore[int]:
    return ParquetWatermarkStore(
        spark, os.path.join(root, "provider_to_s3_import_status"),
        "block_height", T.LongType(),
    )


def s3_to_db_store(spark: SparkSession, root: str) -> ParquetWatermarkStore[datetime]:
    return ParquetWatermarkStore(
        spark, os.path.join(root, "s3_to_db_import_status"),
        "file_modified_date", T.TimestampType(),
    )


def next_block_window(
    latest: int | None, batch: int, default_start: int = DEFAULT_START_BLOCK
) -> tuple[int, int]:
    """start = wm+1 (or default), end = start+batch-1 (E1 step 2,
    cardano_blocks_to_s3_pipeline.py:47-51)."""
    start = default_start if latest is None else latest + 1
    return start, start + batch - 1


def dependency_gate(child_wm: int | None, parent_wm: int | None) -> tuple[int, int] | None:
    """Two-watermark gate (J4): child pipeline may process
    (child_wm+1 .. parent_wm]; no-op when child has caught up
    (cardano_transactions_to_s3_pipeline.py:58-79)."""
    if parent_wm is None:
        return None
    start = DEFAULT_START_BLOCK if child_wm is None else child_wm + 1
    if start > parent_wm:
        return None
    return start, parent_wm
