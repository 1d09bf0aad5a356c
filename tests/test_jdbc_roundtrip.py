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
