"""JDBC source/sink seam (SURVEY §2.1 S12–S13, §2.2 K3/K4): the
reference's analytical home is Postgres — its pipelines read keyed
slices over SQLAlchemy/asyncpg (reference
src/etl_pipelines/cardano_tx_utxo_to_s3_pipeline.py:95-103,
cardano_transactions_to_s3_pipeline.py:93-107) and load via staging +
merge. Spark-side the same shapes are ``spark.read.jdbc`` with
Catalyst pushing the key predicate into the remote scan, and the
Spark JDBC writer for the staging append.

The sandbox has no Postgres; the integration test
(tests/test_jdbc_roundtrip.py) exercises the REAL
``spark.read.jdbc`` / ``DataFrameWriter.jdbc`` paths against embedded
Apache Derby (shipped in Spark's jars), including predicate pushdown
(`PushedFilters` visible in the scan). Engine-specific dialect
concerns stay in this module.

Postgres ``ARRAY(String)`` columns (reference
database_management/cardano/cardano_tables.py:56 stores tx hash
lists) don't survive generic JDBC cleanly, so the documented dialect
strategy is the standard text round-trip: arrays travel as PG array
literals (``{"a","b"}``) in a text column and decode back to
``array<string>`` on read. Both directions are pure column
expressions (JVM-side, codegen'd) and oracle-checked (q45).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _sql_literal(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        import math

        if not math.isfinite(v):
            # repr(inf)/'nan' are not SQL literals; a predicate built
            # from them errors remotely at execution time — fail fast
            raise ValueError(f"non-finite float is not a SQL literal: {v!r}")
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def jdbc_keyed_scan(
    spark: SparkSession,
    url: str,
    table: str,
    key_col: str,
    keys: Sequence,
    properties: dict | None = None,
    key_batch: int | None = None,
) -> DataFrame:
    """S12: read only the requested key slice of a JDBC table,
    mirroring the reference's ``WHERE tx_hash IN :hashes`` queries.

    ``key_batch=None``: the ``isin`` predicate is declared on the
    DataFrame so Catalyst pushes it into the remote scan
    (`PushedFilters: [In(...)]`) — one connection ships only matching
    rows. Right for key lists up to a few thousand.

    ``key_batch=N``: the key list is split into ceil(|keys|/N)
    IN-chunks passed as JDBC partition PREDICATES — Spark opens one
    connection per chunk and executors fetch the batches
    CONCURRENTLY, which is both the parallel-read path and the guard
    against megabyte-sized single IN clauses that some engines refuse
    or plan poorly (the reference pages its keyed reads the same way,
    cardano_transactions_to_s3_pipeline.py:93-107). Key values are
    SQL-literal-encoded (strings quoted/escaped)."""
    if key_batch is not None:
        # ANSI-quoted: Spark's JDBC writer creates case-exact quoted
        # columns, so a bare identifier in a raw predicate would be
        # case-folded by the engine (Derby uppercases) and miss.
        qk = '"' + key_col.replace('"', '""') + '"'
        ks = list(keys)
        if not ks:
            # preserve an empty result with the remote schema
            preds = [f"{qk} IS NULL AND {qk} IS NOT NULL"]
        else:
            preds = [
                f"{qk} IN ("
                + ", ".join(_sql_literal(v) for v in ks[i:i + key_batch])
                + ")"
                for i in range(0, len(ks), key_batch)
            ]
        return spark.read.jdbc(
            url, table, predicates=preds, properties=properties or {}
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load().filter(F.col(key_col).isin(list(keys)))


def jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict | None = None
) -> None:
    """K3 staging append via the Spark JDBC writer: executors open
    their own connections and write partitions in parallel (the
    distributed answer to the reference's single asyncpg COPY,
    src/dao/cardano_block_dao.py:122-137). The merge statement stays
    a driver-side transaction (sinks/merge.DBUpsertSink)."""
    df.write.jdbc(url, table, mode="append", properties=properties or {})


def encode_pg_text_array(arr: Column) -> Column:
    """array<string> -> Postgres array literal text (`{"a","b"}`),
    following PG's documented output quoting (PostgreSQL docs §8.15.6
    "Array Input and Output Syntax"): every non-null element is
    double-quoted with backslash escaping of ``\\`` and ``\"`` — the
    unambiguous form, safe for elements containing commas, braces,
    quotes, or the empty string (``""``) — and a NULL element is the
    unquoted word ``NULL``. A NULL *array* encodes to SQL NULL (a
    missing value, not ``{}``); the empty array is ``{}``."""
    quoted = F.transform(
        arr,
        lambda s: F.when(s.isNull(), F.lit("NULL")).otherwise(
            F.concat(
                F.lit('"'),
                F.regexp_replace(
                    F.regexp_replace(s, r"\\", r"\\\\"), '"', r'\\"'
                ),
                F.lit('"'),
            )
        ),
    )
    return F.when(arr.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("{"), F.concat_ws(",", quoted), F.lit("}"))
    )


def decode_pg_text_array(lit: Column) -> Column:
    """Postgres array literal text (all-non-null-elements-quoted form,
    as produced by :func:`encode_pg_text_array`) -> array<string>.
    Tokenizes quoted elements and unquoted ``NULL`` words, then maps
    ``NULL`` -> null and unescapes ``\\x -> x`` in one pass."""
    toks = F.regexp_extract_all(
        lit, F.lit(r'"(?:[^"\\]|\\.)*"|NULL'), F.lit(0)
    )
    return F.transform(
        toks,
        lambda e: F.when(e == "NULL", F.lit(None).cast("string")).otherwise(
            F.regexp_replace(
                e.substr(F.lit(2), F.length(e) - 2), r"\\(.)", r"$1"
            )
        ),
    )


def encode_pg_text_array_sql(expr: str) -> str:
    """DuckDB text twin of :func:`encode_pg_text_array` (NB duckdb's
    ``array_to_string([]) IS NULL``, hence the coalesce)."""
    return (
        "CASE WHEN " + expr + " IS NULL THEN NULL ELSE "
        "'{' || coalesce(array_to_string(list_transform(" + expr + ", "
        "s -> CASE WHEN s IS NULL THEN 'NULL' ELSE "
        "'\"' || replace(replace(s, '\\', '\\\\'), '\"', '\\\"') || '\"' END"
        "), ','), '') || '}' END"
    )


def decode_pg_text_array_sql(expr: str) -> str:
    """DuckDB text twin of :func:`decode_pg_text_array`."""
    return (
        "list_transform(regexp_extract_all(" + expr + ", "
        "'\"(?:[^\"\\\\]|\\\\.)*\"|NULL', 0), "
        "e -> CASE WHEN e = 'NULL' THEN NULL ELSE "
        "regexp_replace(substr(e, 2, length(e) - 2), '\\\\(.)', '\\1', 'g') END)"
    )
