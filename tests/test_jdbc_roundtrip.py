"""JDBC integration (SURVEY §2.1 S12–S13, §2.2 K3): the REAL
``spark.read.jdbc`` / ``DataFrameWriter.jdbc`` paths against embedded
Apache Derby (shipped in Spark's jars) — the sandbox stand-in for the
reference's Postgres (src/etl_pipelines/cardano_tx_utxo_to_s3_pipeline.py:95-103).

Pins: (1) the keyed scan pushes its IN-predicate into the remote scan
(PushedFilters visible in the executed plan — the database ships only
matching rows); (2) the staging append + read-back round-trips values
including the PG array text codec with escaping-hostile strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from cardano_spark.sources.jdbc import (
    decode_pg_text_array,
    encode_pg_text_array,
    jdbc_append,
    jdbc_keyed_scan,
)

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_keyed_scan_pushes_in_filter(spark, tmp_path):
    url = _url(tmp_path)
    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("txt"),
    )
    jdbc_append(df, url, "tx_slice", properties=DERBY)

    scan = jdbc_keyed_scan(spark, url, "tx_slice", "k", [7, 42, 99], properties=DERBY)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan
    # predicate reached the remote scan (key order inside In() varies)
    assert "PushedFilters: [*In(k," in plan
    for key in ("7", "42", "99"):
        assert key in plan.split("PushedFilters", 1)[1].splitlines()[0]
    got = sorted((r.k, r.txt) for r in scan.collect())
    assert got == [(7, "v7"), (42, "v42"), (99, "v99")]


def test_jdbc_append_roundtrips_pg_array_codec(spark, tmp_path):
    url = _url(tmp_path)
    rows = [
        (1, ["plain", "two"]),
        (2, ['has "quote"', "x"]),
        (3, ["back\\slash", "tail\\"]),
        (4, ["comma,brace}", "{open"]),
        (5, [""]),
    ]
    df = spark.createDataFrame(rows, "k int, arr array<string>")
    staged = df.select("k", encode_pg_text_array(F.col("arr")).alias("arr_txt"))
    jdbc_append(staged, url, "tx_arrays", properties=DERBY)

    back = (
        jdbc_keyed_scan(spark, url, "tx_arrays", "k", [1, 2, 3, 4, 5], properties=DERBY)
        .select("k", decode_pg_text_array(F.col("arr_txt")).alias("arr"))
    )
    got = {r.k: r.arr for r in back.collect()}
    assert got == {k: arr for k, arr in rows}


def test_jdbc_keyed_scan_batched_partitions(spark, tmp_path):
    """key_batch=N turns the key list into JDBC partition predicates:
    one concurrent connection per chunk, same rows as the single-IN
    path, and the scan parallelism equals the chunk count."""
    url = _url(tmp_path)
    df = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("txt"),
    )
    jdbc_append(df, url, "tx_batched", properties=DERBY)

    keys = [3, 17, 42, 99, 150, 151, 152]
    batched = jdbc_keyed_scan(
        spark, url, "tx_batched", "k", keys, properties=DERBY, key_batch=3
    )
    assert batched.rdd.getNumPartitions() == 3  # ceil(7/3) chunks
    single = jdbc_keyed_scan(
        spark, url, "tx_batched", "k", keys, properties=DERBY
    )
    assert sorted(map(tuple, batched.collect())) == sorted(
        map(tuple, single.collect())
    )

    # string keys are literal-escaped (quote-in-string safe). Derby
    # maps StringType to non-comparable CLOB by default, so the test
    # pins an explicit VARCHAR (PG's TEXT compares natively).
    sdf = spark.createDataFrame(
        [("a'b", 1), ("plain", 2)], "sk string, n int"
    )
    (
        sdf.write.option("createTableColumnTypes", "sk VARCHAR(64), n INT")
        .jdbc(url, "tx_strkeys", mode="append", properties=DERBY)
    )
    got = jdbc_keyed_scan(
        spark, url, "tx_strkeys", "sk", ["a'b"], properties=DERBY, key_batch=10
    ).collect()
    assert [(r.sk, r.n) for r in got] == [("a'b", 1)]

    # empty key list yields an empty frame with the remote schema
    empty = jdbc_keyed_scan(
        spark, url, "tx_batched", "k", [], properties=DERBY, key_batch=5
    )
    assert empty.count() == 0 and empty.columns == ["k", "txt"]
