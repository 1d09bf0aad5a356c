"""StructType -> CREATE TABLE bootstrap for ``DBUpsertSink`` targets.

The reference manages its warehouse DDL with SQLAlchemy metadata + 11
Alembic migrations (database_management/cardano/cardano_tables.py:22-244,
database_management/versions/); a user standing it up runs ``alembic
upgrade head`` and the tables exist.  This module is the Spark-side
equivalent: the single source of truth is the StructType in
``cardano_spark.schemas`` (the same schema every DataFrame in the load
path is validated against), and the DDL is *derived* from it — no
hand-written CREATE TABLE anywhere, so schema and DDL cannot drift.

Dialects:

- ``"postgres"``: the reference's production target — ``TEXT``,
  ``TIMESTAMP``, ``NUMERIC(38,0)``, ``BYTEA``, and a real ``TEXT[]``
  for the one array-typed table (cardano_tables.py:50-63 uses
  ``ARRAY(String)``).
- ``"ansi"`` (default): portable form for embedded engines
  (DuckDB/Derby/sqlite in tests).  Array columns become a VARCHAR
  text-codec column holding the PG array literal encoding
  (``cardano_spark.sources.jdbc.encode_pg_text_array``) — the same
  representation the JDBC read path decodes, so a generic engine
  round-trips arrays losslessly.

Identifiers are double-quoted (ANSI).  That matters here because the
watermark tables have a column literally named ``table``
(cardano_tables.py:222,234) — a reserved word in every dialect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import types as T

from cardano_spark import schemas

_DIALECTS = ("ansi", "postgres")


def quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def sql_type(dtype: T.DataType, dialect: str = "ansi") -> str:
    """SQL column type for a Spark type under the given dialect."""
    if dialect not in _DIALECTS:
        raise ValueError(f"dialect must be one of {_DIALECTS}, got {dialect!r}")
    pg = dialect == "postgres"
    if isinstance(dtype, T.StringType):
        return "TEXT" if pg else "VARCHAR"
    if isinstance(dtype, T.LongType):
        return "BIGINT"
    if isinstance(dtype, T.IntegerType):
        return "INTEGER"
    if isinstance(dtype, T.ShortType):
        return "SMALLINT"
    if isinstance(dtype, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dtype, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dtype, T.DateType):
        return "DATE"
    if isinstance(dtype, T.DoubleType):
        return "DOUBLE PRECISION" if pg else "DOUBLE"
    if isinstance(dtype, T.FloatType):
        return "REAL"
    if isinstance(dtype, T.DecimalType):
        return f"NUMERIC({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.BinaryType):
        return "BYTEA" if pg else "BLOB"
    if isinstance(dtype, T.ArrayType):
        if pg:
            return sql_type(dtype.elementType, dialect) + "[]"
        # generic engines: PG-array-literal text codec column
        # (decoded by sources.jdbc.decode_pg_text_array on read)
        return "VARCHAR"
    raise ValueError(f"no SQL mapping for Spark type {dtype.simpleString()}")


def create_table_sql(
    table: str,
    schema: T.StructType,
    keys: Sequence[str] | None = None,
    dialect: str = "ansi",
    if_not_exists: bool = True,
) -> str:
    """``CREATE TABLE [IF NOT EXISTS]`` for one StructType, with
    NOT NULL from field nullability and PRIMARY KEY from ``keys``."""
    cols = []
    for f in schema.fields:
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"{quote_ident(f.name)} {sql_type(f.dataType, dialect)}{null}")
    if keys:
        missing = [k for k in keys if k not in schema.fieldNames()]
        if missing:
            raise ValueError(f"primary key columns not in schema: {missing}")
        cols.append(
            "PRIMARY KEY (" + ", ".join(quote_ident(k) for k in keys) + ")"
        )
    ine = "IF NOT EXISTS " if if_not_exists else ""
    return (
        f"CREATE TABLE {ine}{quote_ident(table)} (\n  "
        + ",\n  ".join(cols)
        + "\n)"
    )


def bootstrap_sql(
    tables: Sequence[str] | None = None, dialect: str = "ansi"
) -> list[str]:
    """DDL for the full warehouse — all 9 target tables plus the two
    watermark status tables — straight from ``schemas.TARGET_SCHEMAS``
    / ``schemas.PRIMARY_KEYS`` (the Alembic-equivalent bootstrap)."""
    names = list(schemas.TARGET_SCHEMAS) if tables is None else list(tables)
    out = []
    for name in names:
        out.append(
            create_table_sql(
                name,
                schemas.TARGET_SCHEMAS[name],
                schemas.PRIMARY_KEYS.get(name),
                dialect=dialect,
            )
        )
    return out


def ensure_tables(
    con: object,
    tables: Sequence[str] | None = None,
    dialect: str = "ansi",
) -> None:
    """Execute the bootstrap DDL on a DB-API connection (idempotent:
    every statement is IF NOT EXISTS)."""
    cur = con.cursor() if hasattr(con, "cursor") else con
    for stmt in bootstrap_sql(tables, dialect):
        cur.execute(stmt)
    if hasattr(con, "commit"):
        con.commit()
