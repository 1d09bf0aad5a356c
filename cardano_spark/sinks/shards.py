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
    # listing + sizes via the Hadoop FileSystem API (the abstraction
    # s3a:// implements — the earlier os.listdir form worked only on
    # local paths despite the CLI accepting object-store URIs)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    sizes = {}
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith("_"):
            sizes[name] = int(st.getLen())
    # per-file row counts, computed distributed over the written data
    counts = {
        r["file"].rsplit("/", 1)[-1]: r["rows"]
        for r in spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"),
        )
        .groupBy("file")
        .agg(F.count("*").alias("rows"))
        .collect()
    }
    shards = [
        {"file": f, "rows": int(counts.get(f, 0)), "bytes": sizes[f]}
        for f in sorted(sizes)
    ]
    manifest = ShardManifest(
        n_shards=len(shards),
        n_rows=sum(s["rows"] for s in shards),
        total_bytes=sum(s["bytes"] for s in shards),
        shards=shards,
    )
    payload = json.dumps(
        {
            "n_shards": manifest.n_shards,
            "n_rows": manifest.n_rows,
            "total_bytes": manifest.total_bytes,
            "shards": manifest.shards,
        },
        indent=2,
    ).encode()
    # manifest rides the same FileSystem as the shards
    mpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_manifest.json")
    out = fs.create(mpath, True)
    try:
        out.write(payload)
    finally:
        out.close()
    return manifest


def read_manifest(path: str, spark: SparkSession | None = None) -> ShardManifest:
    """Read ``_manifest.json``; pass ``spark`` for non-local schemes
    (the Hadoop FileSystem route), plain ``open`` otherwise."""
    if spark is not None:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_manifest.json")
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        stream = fs.open(jpath)
        try:
            raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        m = json.loads(raw.decode())
    else:
        with open(os.path.join(path, "_manifest.json")) as fh:
            m = json.load(fh)
    return ShardManifest(
        n_shards=m["n_shards"],
        n_rows=m["n_rows"],
        total_bytes=m["total_bytes"],
        shards=m["shards"],
    )
