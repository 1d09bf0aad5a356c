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


# --------------------------------------------------------------------------
# Schema evolution: declared StructType vs LIVE table
# --------------------------------------------------------------------------
#
# The reference evolves its warehouse with an Alembic migration chain
# (12 revisions under database_management/versions/ — e.g. the
# int->timestamp widening in b0673669b6c8_…py:21-31). The Spark-side
# equivalent keeps the StructType as the single source of truth and
# DERIVES the migration: diff the declared schema against the live
# table's information_schema and emit additive ADD COLUMNs plus
# explicitly-allowed type widenings. Never destructive: live columns
# absent from the declared schema are reported, not dropped, and any
# type change outside the widening allowlist raises for a human.

#: live information_schema ``data_type`` spellings -> canonical family.
_TYPE_FAMILY = {
    "character varying": "varchar", "varchar": "varchar", "text": "varchar",
    "smallint": "smallint", "int2": "smallint",
    "integer": "integer", "int": "integer", "int4": "integer",
    "bigint": "bigint", "int8": "bigint",
    "boolean": "boolean", "bool": "boolean",
    "timestamp without time zone": "timestamp", "timestamp": "timestamp",
    "date": "date",
    "double precision": "double", "double": "double", "float8": "double",
    "real": "real", "float4": "real", "float": "real",  # duckdb says FLOAT
    "numeric": "numeric", "decimal": "numeric",
    "bytea": "binary", "blob": "binary",
    "array": "array",
}

#: (live_family, declared_family) pairs that evolve in place without
#: data loss. Everything else is a manual migration.
SAFE_WIDENINGS = {
    ("smallint", "integer"),
    ("smallint", "bigint"),
    ("smallint", "numeric"),
    ("integer", "bigint"),
    ("integer", "numeric"),
    ("bigint", "numeric"),
    ("real", "double"),
    # the reference's b0673669b6c8 case: epoch seconds -> timestamp.
    # Needs a value transform, so it is PG-only (USING to_timestamp);
    # the ansi dialect raises and points at a copy-rewrite.
    ("integer", "timestamp"),
    ("bigint", "timestamp"),
}


def _family(data_type: str) -> str:
    t = data_type.strip().lower()
    t = t.split("(", 1)[0].strip()  # drop precision/length suffixes
    if t.endswith("[]"):
        return "array"
    return _TYPE_FAMILY.get(t, t)


def _declared_family(dtype: T.DataType, dialect: str) -> str:
    return _family(sql_type(dtype, dialect))


def live_columns(con: object, table: str) -> dict[str, str] | None:
    """Column name -> declared SQL type of the LIVE table, from
    ``information_schema.columns`` (Postgres, DuckDB — the engines the
    upsert sink targets; Derby exposes the same facts via
    ``SYS.SYSCOLUMNS`` and would add a dialect branch here). Returns
    None when the table does not exist."""
    cur = con.cursor() if hasattr(con, "cursor") else con
    cur.execute(
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name = ? ORDER BY ordinal_position"
        if _paramstyle(con) == "qmark"
        else "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name = %s ORDER BY ordinal_position",
        (table,),
    )
    rows = cur.fetchall()
    if not rows:
        return None
    return {name: dt for name, dt in rows}


def _paramstyle(con: object) -> str:
    # DB-API modules/connections may advertise their style (the
    # stdlib pg_wire client does); psycopg does not, hence the name
    # sniff; everything else (JDBC/Derby shims) is qmark
    style = getattr(con, "paramstyle", None)
    if isinstance(style, str):
        return style
    mod = type(con).__module__.split(".", 1)[0]
    return "format" if mod.startswith("psycopg") else "qmark"


def evolve_table_sql(
    table: str,
    declared: T.StructType,
    live: dict[str, str],
    dialect: str = "ansi",
) -> tuple[list[str], list[str]]:
    """The migration from a LIVE table to the declared StructType.

    Returns ``(statements, extra_live_columns)``:

    - one ``ALTER TABLE … ADD COLUMN`` per declared column missing
      from the live table. Added columns are forced NULLABLE even if
      the StructType says NOT NULL — existing rows have no value, and
      a NOT NULL addition without a default fails on every engine;
      tightening to NOT NULL after a backfill is a separate, explicit
      step (exactly how Alembic users stage it).
    - one type-widening ``ALTER`` per column whose live family differs
      from the declared one AND is on :data:`SAFE_WIDENINGS`. Postgres
      uses ``ALTER COLUMN … TYPE … [USING to_timestamp(col)]`` (the
      reference migration's shape); ansi uses the standard
      ``SET DATA TYPE`` (Derby/DuckDB), which cannot express the
      int->timestamp value transform — that pair raises under ansi.
    - live columns absent from the declared schema are NEVER dropped;
      they come back in ``extra_live_columns`` for the caller to log.

    Any other type change raises ``ValueError`` — a lossy or
    ambiguous migration needs a human decision, not silent DDL.
    """
    if dialect not in _DIALECTS:
        raise ValueError(f"dialect must be one of {_DIALECTS}, got {dialect!r}")
    stmts: list[str] = []
    qt = quote_ident(table)
    for f in declared.fields:
        new_sql_type = sql_type(f.dataType, dialect)
        if f.name not in live:
            stmts.append(
                f"ALTER TABLE {qt} ADD COLUMN {quote_ident(f.name)} {new_sql_type}"
            )
            continue
        live_fam = _family(live[f.name])
        decl_fam = _declared_family(f.dataType, dialect)
        if live_fam == decl_fam:
            continue
        if (live_fam, decl_fam) not in SAFE_WIDENINGS:
            raise ValueError(
                f"{table}.{f.name}: live type {live[f.name]!r} -> declared "
                f"{new_sql_type!r} is not a safe widening; write a manual "
                "migration (copy-rewrite or staged backfill)"
            )
        qc = quote_ident(f.name)
        if dialect == "postgres":
            using = (
                f" USING to_timestamp({qc})" if decl_fam == "timestamp" else ""
            )
            stmts.append(
                f"ALTER TABLE {qt} ALTER COLUMN {qc} TYPE {new_sql_type}{using}"
            )
        else:
            if decl_fam == "timestamp":
                raise ValueError(
                    f"{table}.{f.name}: int->timestamp needs a value "
                    "transform; only the postgres dialect can express it "
                    "(USING to_timestamp) — use a copy-rewrite here"
                )
            stmts.append(
                f"ALTER TABLE {qt} ALTER COLUMN {qc} SET DATA TYPE {new_sql_type}"
            )
    extra = [c for c in live if c not in declared.fieldNames()]
    return stmts, extra


def evolve_table(
    con: object,
    table: str,
    declared: T.StructType,
    dialect: str = "ansi",
) -> tuple[list[str], list[str]]:
    """Introspect the live table and apply :func:`evolve_table_sql`.
    Creates the table outright when it does not exist yet. Returns the
    executed statements and any extra live columns (kept, reported)."""
    live = live_columns(con, table)
    cur = con.cursor() if hasattr(con, "cursor") else con
    if live is None:
        stmt = create_table_sql(table, declared, dialect=dialect)
        cur.execute(stmt)
        if hasattr(con, "commit"):
            con.commit()
        return [stmt], []
    stmts, extra = evolve_table_sql(table, declared, live, dialect)
    for stmt in stmts:
        cur.execute(stmt)
    if hasattr(con, "commit"):
        con.commit()
    return stmts, extra
