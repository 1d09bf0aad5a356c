"""Training-shard export: bounded, deterministic, manifest-backed."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from cardano_spark.catalog import table
from cardano_spark.functions.hashing import md5_long
from cardano_spark.sinks.shards import read_manifest, write_training_shards
from tests.conftest import SF_SMALL


def _docs_with_key(spark):
    d = table(spark, SF_SMALL, "documents").select("doc_id", "text")
    return d.withColumn(
        "shard_key", md5_long(F.concat(F.lit("shard|"), F.col("doc_id").cast("string")))
    )


def test_write_training_shards_manifest_and_bounds(spark, tmp_path):
    df = _docs_with_key(spark)
    n_in = df.count()
    out = str(tmp_path / "shards")
    m = write_training_shards(df, out, "shard_key", n_shards=4, max_rows_per_file=100)
    # every row lands exactly once
    assert m.n_rows == n_in
    back = spark.read.parquet(out)
    assert back.count() == n_in
    assert back.select("doc_id").distinct().count() == n_in
    # size discipline
    assert all(s["rows"] <= 100 for s in m.shards)
    assert all(s["bytes"] > 0 for s in m.shards)
    # manifest round-trips and matches the listing
    m2 = read_manifest(out)
    assert m2.shards == m.shards and m2.n_rows == m.n_rows
    # the Hadoop-FS read route (object-store schemes) agrees
    assert read_manifest(out, spark).shards == m.shards
    assert len(m.shards) == len(
        [f for f in os.listdir(out) if f.endswith(".parquet")]
    )


def test_write_training_shards_deterministic_membership(spark, tmp_path):
    df = _docs_with_key(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, a, "shard_key", n_shards=3)
    # second run over a REPARTITIONED (differently ordered) input
    write_training_shards(df.repartition(7), b, "shard_key", n_shards=3)

    def membership(path):
        rows = (
            spark.read.parquet(path)
            .select(F.input_file_name().alias("f"), "doc_id")
            .collect()
        )
        # normalize shard identity by the set's sorted position
        by_file: dict[str, list] = {}
        for r in rows:
            by_file.setdefault(r["f"].rsplit("/", 1)[-1], []).append(r["doc_id"])
        return sorted(tuple(sorted(v)) for v in by_file.values())

    assert membership(a) == membership(b)


def test_shards_internally_sorted(spark, tmp_path):
    df = _docs_with_key(spark)
    out = str(tmp_path / "s")
    write_training_shards(df, out, "shard_key", n_shards=2)
    rows = (
        spark.read.parquet(out)
        .select(F.input_file_name().alias("f"), "shard_key")
        .collect()
    )
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["shard_key"])
    for ks in by_file.values():
        assert ks == sorted(ks)


def test_cli_export_shards(spark, tmp_path):
    from cardano_spark.__main__ import main

    dest = str(tmp_path / "out")
    rc = main(
        [
            "export-shards",
            "--src", f"{SF_SMALL}/documents.parquet",
            "--dest", dest,
            "--key", "doc_id",
            "--shards", "3",
        ]
    )
    assert rc == 0
    m = read_manifest(dest)
    assert m.n_rows == spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()


def test_write_training_shards_empty_input(spark, tmp_path):
    import pyspark.sql.functions as F

    df = _docs_with_key(spark).filter(F.lit(False))
    out = str(tmp_path / "empty")
    m = write_training_shards(df, out, "shard_key", n_shards=3)
    assert m.n_rows == 0
    assert read_manifest(out).n_rows == 0
    assert spark.read.parquet(out).count() == 0  # schema-bearing empty table
