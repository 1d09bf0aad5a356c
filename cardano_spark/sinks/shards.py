"""Training-shard export: the last step of a corpus pipeline — write
curated/packed rows as a deterministic set of bounded-size shards
plus a manifest, the layout a training loader consumes (WebDataset /
tfrecord-style sharding re-expressed for parquet).

The reference's closest analogue is the per-batch raw-zone upload
(src/etl_pipelines/cardano_block_to_s3_pipeline.py — one object per
fetch batch, no size discipline); here shard boundaries are
CONTENT-DETERMINISTIC so a re-run of the same corpus produces the
same shard membership (loaders can resume / diff exports).

Scale notes:
- Sharding = ``repartitionByRange`` on the sort key (one range
  exchange; Spark samples ranges, so use an explicit key with a
  roughly uniform distribution — a content hash is ideal) +
  ``sortWithinPartitions`` so every shard is internally ordered
  (zone-map/min-max friendly, reproducible).
- ``maxRecordsPerFile`` bounds shard size without another shuffle
  (a partition simply rolls over to a new file).
- The manifest is built from the FileSystem listing + per-shard
  row counts computed distributed (one scan of the written data —
  cheap, columnar count) — never by collecting rows to the driver.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ShardManifest:
    n_shards: int
    n_rows: int
    total_bytes: int
    shards: list[dict]  # [{file, rows, bytes}]


def write_training_shards(
    df: DataFrame,
    path: str,
    sort_key: str,
    n_shards: int,
    max_rows_per_file: int | None = None,
) -> ShardManifest:
    """Write ``df`` as ``n_shards`` range-sharded, internally-sorted
    parquet files under ``path`` and return the manifest (also
    persisted as ``_manifest.json``).

    Shard membership is a deterministic function of ``sort_key``
    ranges (re-running the same input reproduces the same shard for
    every row, modulo Spark's range sampling on identical data —
    pass a content-hash key for stability under input reordering).
    """
    part = df.repartitionByRange(n_shards, F.col(sort_key)).sortWithinPartitions(
        sort_key
    )
    writer = part.write.mode("overwrite")
    if max_rows_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_rows_per_file))
    writer.parquet(path)

    spark = df.sparkSession
    files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    # per-file row counts, computed distributed over the written data
    counts = {
        os.path.basename(r["file"]): r["rows"]
        for r in spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"),
        )
        .groupBy("file")
        .agg(F.count("*").alias("rows"))
        .collect()
    }
    shards = []
    for f in files:
        full = os.path.join(path, f)
        shards.append(
            {
                "file": f,
                "rows": int(counts.get(f, 0)),
                "bytes": os.path.getsize(full),
            }
        )
    manifest = ShardManifest(
        n_shards=len(shards),
        n_rows=sum(s["rows"] for s in shards),
        total_bytes=sum(s["bytes"] for s in shards),
        shards=shards,
    )
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(
            {
                "n_shards": manifest.n_shards,
                "n_rows": manifest.n_rows,
                "total_bytes": manifest.total_bytes,
                "shards": manifest.shards,
            },
            fh,
            indent=2,
        )
    return manifest


def read_manifest(path: str) -> ShardManifest:
    with open(os.path.join(path, "_manifest.json")) as fh:
        m = json.load(fh)
    return ShardManifest(
        n_shards=m["n_shards"],
        n_rows=m["n_rows"],
        total_bytes=m["total_bytes"],
        shards=m["shards"],
    )
