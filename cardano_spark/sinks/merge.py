"""Idempotent merge sinks — the reference's exactly-once-per-key load
path (SURVEY.md §2.2 K3/K4, §2.7 D1) re-expressed for Spark.

Two implementations of the same contract (``merge(df)``):

- ``ParquetMergeSink``: a parquet-backed managed table for local /
  lakehouse use. Insert-if-absent is a left-anti join against the
  current snapshot, then an atomic directory swap. At 100 TB you'd
  use an Iceberg/Delta table and its MERGE INTO; the anti-join plan
  is identical — this sink is the dependency-free stand-in.
- ``DBUpsertSink``: staging + single merge statement against a
  DB-API database (the reference's temp table + asyncpg COPY +
  ``INSERT ... SELECT ... ON CONFLICT DO NOTHING``,
  src/dao/cardano_block_dao.py:93-148). Rows travel executor-side via
  ``foreachPartition``; the merge + watermark update run in ONE
  driver-side transaction, mirroring the reference's
  ``engine.begin()`` scope (s3_to_db_cardano_blocks_pipeline.py:105-127).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class ParquetMergeSink:
    """Managed parquet table with INSERT-if-absent merge semantics."""

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType, keys: Sequence[str]):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.keys = list(keys)

    def exists(self) -> bool:
        return os.path.isdir(self.path)

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(self.path)

    def merge(self, incoming: DataFrame) -> None:
        """Append rows whose key is absent; existing rows win
        (ON CONFLICT DO NOTHING). Batch-internal dups collapse first
        (D2). The swap is write-new-then-rename so a failed job never
        leaves a half-merged table — same crash-safety the reference
        gets from its single transaction."""
        fresh = incoming.dropDuplicates(self.keys)
        if not self.exists():
            fresh.write.mode("overwrite").parquet(self.path)
            return
        existing = self.read()
        merged = existing.unionByName(fresh.join(existing, self.keys, "left_anti"))
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)


class DBUpsertSink:
    """Staging-table + merge-statement upsert into a SQL database.

    ``connection_factory`` returns a DB-API connection; executors open
    their own for the staging inserts (partition-parallel, the Spark
    answer to the reference's single asyncpg COPY), and the driver
    opens one for the DDL + merge + watermark transaction.

    For engines with COPY (Postgres), pass ``copy_partition`` to
    replace executemany with the bulk path — same structure the
    reference uses (asyncpg ``copy_to_table``,
    cardano_block_dao.py:122-137).
    """

    def __init__(
        self,
        connection_factory: Callable[[], object],
        table: str,
        columns: Sequence[str],
        keys: Sequence[str],
        staging_parallelism: int = 1,
    ):
        self.connection_factory = connection_factory
        self.table = table
        self.columns = list(columns)
        self.keys = list(keys)
        self.staging_parallelism = staging_parallelism

    # -- SQL builders (dialect: ANSI + ON CONFLICT, works for PG/DuckDB) --

    def staging_name(self) -> str:
        return f"staging_{self.table}"

    def create_staging_sql(self) -> str:
        # LIKE-less portable form: copy structure from target
        return (
            f"CREATE TABLE {self.staging_name()} AS "
            f"SELECT * FROM {self.table} WHERE 1=0"
        )

    def insert_sql(self) -> str:
        cols = ", ".join(self.columns)
        ph = ", ".join(["?"] * len(self.columns))
        return f"INSERT INTO {self.staging_name()} ({cols}) VALUES ({ph})"

    def merge_sql(self) -> str:
        """INSERT ... SELECT DISTINCT ON key ... ON CONFLICT DO NOTHING
        (cardano_block_dao.py:138-148)."""
        cols = ", ".join(self.columns)
        keys = ", ".join(self.keys)
        return (
            f"INSERT INTO {self.table} ({cols}) "
            f"SELECT {cols} FROM ("
            f"  SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {keys}) AS rn"
            f"  FROM {self.staging_name()}"
            f") dedup WHERE rn = 1 "
            f"ON CONFLICT ({keys}) DO NOTHING"
        )

    def drop_staging_sql(self) -> str:
        return f"DROP TABLE IF EXISTS {self.staging_name()}"

    def merge(
        self, df: DataFrame, watermark_sql: str | None = None, via_driver: bool = False
    ) -> None:
        """Stage rows, then run merge (+ optional watermark update)
        in one driver transaction.

        ``via_driver=True`` streams partitions through the driver
        (``toLocalIterator`` — bounded memory, one partition at a
        time) for databases that allow only one writing process
        (single-file duckdb/sqlite in tests). Real servers keep the
        default executor-side ``foreachPartition`` path.
        """
        cols = self.columns
        factory = self.connection_factory
        insert = self.insert_sql()

        con = factory()
        cur = con.cursor() if hasattr(con, "cursor") else con
        cur.execute(self.drop_staging_sql())
        cur.execute(self.create_staging_sql())

        def write_rows(conn, rows) -> None:
            k = conn.cursor() if hasattr(conn, "cursor") else conn
            batch = [tuple(r[col] for col in cols) for r in rows]
            if batch:
                k.executemany(insert, batch)

        if via_driver:
            write_rows(con, list(df.toLocalIterator()))
        else:

            def write_partition(rows) -> None:
                c = factory()
                write_rows(c, rows)
                if hasattr(c, "commit"):
                    c.commit()

            # staging_parallelism bounds concurrent DB connections;
            # with a real server raise it to the cluster write concurrency.
            df.coalesce(self.staging_parallelism).foreachPartition(write_partition)

        try:
            if hasattr(con, "begin"):
                con.begin()
            cur.execute(self.merge_sql())
            if watermark_sql:
                cur.execute(watermark_sql)
            if hasattr(con, "commit"):
                con.commit()
        finally:
            cur.execute(self.drop_staging_sql())
            if hasattr(con, "commit"):
                con.commit()
