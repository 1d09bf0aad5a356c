"""PG dialect conformance — golden statements.

The sandbox has no Postgres server, so the exact SQL the sink layer
would send to one is pinned against golden PG-dialect statements
(the reference's production dialect: temp-table staging + asyncpg
COPY + ON CONFLICT, src/dao/cardano_block_dao.py:93-148). Any change
to the emitted SQL must consciously update these strings.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from cardano_spark import schemas
from cardano_spark.sinks import ddl
from cardano_spark.sinks.merge import (
    DBUpsertSink,
    encode_copy_text_row,
    pg_copy_sql,
)


def _sink(table: str) -> DBUpsertSink:
    return DBUpsertSink.from_schema(lambda: None, table)


def test_golden_create_table_postgres():
    got = ddl.create_table_sql(
        "cardano_block_transactions",
        schemas.CARDANO_BLOCK_TRANSACTIONS,
        schemas.PRIMARY_KEYS["cardano_block_transactions"],
        dialect="postgres",
    )
    assert got == (
        'CREATE TABLE IF NOT EXISTS "cardano_block_transactions" (\n'
        '  "block" TEXT NOT NULL,\n'
        '  "tx_hash" TEXT[] NOT NULL,\n'
        '  "created_at" TIMESTAMP NOT NULL,\n'
        '  PRIMARY KEY ("block")\n'
        ")"
    )


def test_golden_create_watermark_table_postgres():
    """`table` is a reserved word — the DDL must quote it."""
    got = ddl.create_table_sql(
        "provider_to_s3_import_status",
        schemas.PROVIDER_TO_S3_IMPORT_STATUS,
        schemas.PRIMARY_KEYS["provider_to_s3_import_status"],
        dialect="postgres",
    )
    assert got == (
        'CREATE TABLE IF NOT EXISTS "provider_to_s3_import_status" (\n'
        '  "table" TEXT NOT NULL,\n'
        '  "block_height" BIGINT NOT NULL,\n'
        '  "created_at" TIMESTAMP NOT NULL,\n'
        '  PRIMARY KEY ("table", "block_height")\n'
        ")"
    )


def test_golden_staging_and_merge_statements():
    sink = _sink("cardano_block_transactions")
    assert sink.create_staging_sql() == (
        'CREATE TABLE "staging_cardano_block_transactions" AS '
        'SELECT * FROM "cardano_block_transactions" WHERE 1=0'
    )
    assert sink.insert_sql() == (
        'INSERT INTO "staging_cardano_block_transactions" '
        '("block", "tx_hash", "created_at") VALUES (?, ?, ?)'
    )
    assert sink.drop_staging_sql() == (
        'DROP TABLE IF EXISTS "staging_cardano_block_transactions"'
    )
    assert sink.merge_sql("insert") == (
        'INSERT INTO "cardano_block_transactions" '
        '("block", "tx_hash", "created_at") '
        'SELECT "block", "tx_hash", "created_at" FROM ('
        '  SELECT *, row_number() OVER (PARTITION BY "block" '
        'ORDER BY "tx_hash" NULLS FIRST, "created_at" NULLS FIRST) AS rn'
        '  FROM "staging_cardano_block_transactions"'
        ") dedup WHERE rn = 1 "
        'ON CONFLICT ("block") DO NOTHING'
    )
    assert sink.merge_sql("upsert").endswith(
        'ON CONFLICT ("block") DO UPDATE SET '
        '"tx_hash" = excluded."tx_hash", '
        '"created_at" = excluded."created_at"'
    )


def test_golden_copy_statement_and_text_encoding():
    sink = _sink("cardano_blocks")
    assert pg_copy_sql(sink.staging_name(), ["height", "hash"]) == (
        'COPY "staging_cardano_blocks" ("height", "hash") '
        "FROM STDIN WITH (FORMAT text)"
    )
    # PG COPY text format: \N for NULL, backslash escapes for the
    # four metacharacters, everything else verbatim
    assert encode_copy_text_row([1, None, "plain"]) == "1\t\\N\tplain"
    assert (
        encode_copy_text_row(["a\tb", "c\nd", "e\\f", "g\rh"])
        == "a\\tb\tc\\nd\te\\\\f\tg\\rh"
    )
    assert encode_copy_text_row([""]) == ""
    assert encode_copy_text_row(["N"]) == "N"  # only NULL gets \N


def test_merge_via_copy_partition_end_to_end(spark, tmp_path):
    """The COPY staging path drives the same merge transaction: a
    fake copy_partition decodes the PG text payload and lands it via
    executemany (standing in for psycopg copy_expert), and the final
    table equals the executemany path's result."""
    db = str(tmp_path / "c.duckdb")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    seen: list[str] = []

    def fake_copy(conn, sql, payload):
        seen.append(sql)
        rows = []
        for line in payload.splitlines():
            a, b = line.split("\t")
            rows.append(
                (
                    int(a),
                    None
                    if b == "\\N"
                    else b.replace("\\t", "\t")
                    .replace("\\n", "\n")
                    .replace("\\r", "\r")
                    .replace("\\\\", "\\"),
                )
            )
        conn.executemany('INSERT INTO "staging_target" VALUES (?, ?)', rows)

    sink = DBUpsertSink.from_schema(
        connection_factory=lambda: duckdb.connect(db),
        table="target",
        schema=schema,
        keys=["k"],
    )
    sink.copy_partition = fake_copy
    sink.ensure_target()
    df = spark.createDataFrame(
        [(1, "tab\there"), (2, None), (3, "line\nbreak")], schema
    )
    sink.merge(df, via_driver=True)

    assert seen == [
        'COPY "staging_target" ("k", "v") FROM STDIN WITH (FORMAT text)'
    ]
    con = duckdb.connect(db)
    got = dict(con.execute("SELECT k, v FROM target ORDER BY k").fetchall())
    con.close()
    assert got == {1: "tab\there", 2: None, 3: "line\nbreak"}


def test_from_schema_registry_lookup():
    sink = _sink("cardano_blocks")
    assert sink.columns == schemas.CARDANO_BLOCKS.fieldNames()
    assert sink.keys == ["height"]
    with pytest.raises(KeyError):
        _sink("not_a_table")
    plain = DBUpsertSink(lambda: None, "t", ["k"], ["k"])
    with pytest.raises(ValueError):
        plain.ensure_target()
