"""DB-side schema evolution (sinks/ddl.py::evolve_table): the second
schema change a deployed warehouse makes. The reference handles this
with a 12-revision Alembic chain
(/root/reference/database_management/versions/, e.g. the
int->timestamp widening in b0673669b6c8_…py:21-31); here the
StructType is the source of truth and the migration is DERIVED by
diffing it against the live information_schema. DuckDB stands in for
Postgres (same information_schema surface the sink's other tests
use); the PG-dialect statements are pinned as golden SQL."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cardano_spark.sinks.ddl import (
    create_table_sql,
    evolve_table,
    evolve_table_sql,
    live_columns,
)

# NOTE: the widened columns are non-key on purpose — DuckDB refuses to
# retype a PRIMARY KEY column (Postgres allows it; the PG golden test
# below pins that statement shape).
V1 = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("cnt", T.IntegerType(), True),
        T.StructField("score", T.FloatType(), True),
        T.StructField("note", T.StringType(), True),
    ]
)
# v2: cnt widened int->bigint, score real->double, new column added
V2 = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("cnt", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("note", T.StringType(), True),
        T.StructField("added_at", T.DateType(), False),  # forced nullable on ADD
    ]
)


def _duck(tmp_path):
    import duckdb

    return duckdb.connect(str(tmp_path / "evo.db"))


def test_evolve_add_column_and_widenings_duckdb(tmp_path):
    con = _duck(tmp_path)
    con.execute(create_table_sql("t", V1, keys=["k"]))
    con.execute("INSERT INTO t VALUES (1, 7, 1.5, 'a'), (2, NULL, NULL, 'b')")

    stmts, extra = evolve_table(con, "t", V2)
    assert extra == []
    assert len(stmts) == 3  # two widenings + one add
    live = live_columns(con, "t")
    assert live is not None
    assert live["cnt"].lower().startswith("bigint")
    assert live["score"].lower().startswith("double")
    assert "added_at" in live
    # existing rows intact, new column NULL
    rows = con.execute(
        "SELECT k, cnt, score, note, added_at FROM t ORDER BY k"
    ).fetchall()
    assert rows == [(1, 7, 1.5, "a", None), (2, None, None, "b", None)]
    # idempotent: a second run has nothing to do
    again, _ = evolve_table(con, "t", V2)
    assert again == []


def test_evolve_then_merge_still_green(spark, tmp_path):
    """After evolution, the upsert sink merges v2-shaped batches into
    the evolved table — the end state a real deployment needs."""
    import datetime

    import duckdb

    db = str(tmp_path / "m.db")
    con = duckdb.connect(db)
    con.execute(create_table_sql("target", V1, keys=["k"]))
    con.execute("INSERT INTO target VALUES (1, 5, 1.0, 'old')")
    evolve_table(con, "target", V2)
    con.close()

    from cardano_spark.sinks.merge import DBUpsertSink

    sink = DBUpsertSink.from_schema(
        connection_factory=lambda: duckdb.connect(db),
        table="target",
        schema=V2,
        keys=["k"],
    )
    d = datetime.date(2026, 8, 14)
    batch = spark.createDataFrame(
        [(1, 6, 2.0, "new", d), (3, 7, 3.0, "fresh", d)], V2
    )
    sink.merge(batch, via_driver=True, mode="upsert")
    con = duckdb.connect(db)
    rows = con.execute(
        "SELECT k, cnt, score, note, added_at FROM target ORDER BY k"
    ).fetchall()
    assert rows == [(1, 6, 2.0, "new", d), (3, 7, 3.0, "fresh", d)]


def test_evolve_missing_table_bootstraps():
    import duckdb

    con = duckdb.connect()
    stmts, extra = evolve_table(con, "fresh_t", V1)
    assert len(stmts) == 1 and stmts[0].startswith("CREATE TABLE")
    assert live_columns(con, "fresh_t") is not None


def test_postgres_golden_widening_sql():
    """PG dialect pins the reference migration's exact shape: USING
    to_timestamp for the epoch->timestamp widening
    (b0673669b6c8_…py:23-30), plain TYPE for lossless widenings."""
    declared = T.StructType(
        [
            T.StructField("block_time", T.TimestampType(), False),
            T.StructField("height", T.LongType(), True),
        ]
    )
    live = {"block_time": "integer", "height": "integer"}
    stmts, extra = evolve_table_sql("blocks", declared, live, dialect="postgres")
    assert stmts == [
        'ALTER TABLE "blocks" ALTER COLUMN "block_time" TYPE TIMESTAMP'
        ' USING to_timestamp("block_time")',
        'ALTER TABLE "blocks" ALTER COLUMN "height" TYPE BIGINT',
    ]
    assert extra == []


def test_unsafe_changes_raise_never_drop():
    declared = T.StructType([T.StructField("v", T.IntegerType(), True)])
    # narrowing bigint -> integer: manual migration
    with pytest.raises(ValueError, match="not a safe widening"):
        evolve_table_sql("t", declared, {"v": "bigint"})
    # int->timestamp under ansi: needs the PG USING transform
    ts = T.StructType([T.StructField("v", T.TimestampType(), True)])
    with pytest.raises(ValueError, match="to_timestamp"):
        evolve_table_sql("t", ts, {"v": "integer"})
    # extra live columns are reported, never dropped
    stmts, extra = evolve_table_sql(
        "t", declared, {"v": "integer", "legacy": "text"}
    )
    assert stmts == [] and extra == ["legacy"]


def test_sink_evolve_target_convenience(spark, tmp_path):
    """DBUpsertSink.evolve_target: deploy-time one-liner — bootstrap
    when absent, evolve in place when the declared schema moved."""
    import duckdb

    from cardano_spark.sinks.merge import DBUpsertSink

    db = str(tmp_path / "s.db")
    v1sink = DBUpsertSink.from_schema(
        connection_factory=lambda: duckdb.connect(db),
        table="t",
        schema=V1,
        keys=["k"],
    )
    stmts, _ = v1sink.evolve_target()
    assert stmts and stmts[0].startswith("CREATE TABLE")
    v2sink = DBUpsertSink.from_schema(
        connection_factory=lambda: duckdb.connect(db),
        table="t",
        schema=V2,
        keys=["k"],
    )
    stmts, extra = v2sink.evolve_target()
    assert len(stmts) == 3 and extra == []
    assert live_columns(duckdb.connect(db), "t")["cnt"].lower().startswith("bigint")


def test_evolution_is_idempotent_and_total_property():
    """Property over random StructTypes: (1) evolving a table created
    from schema S to S itself is always a no-op; (2) evolving v1 -> v2
    where v2 = v1 + random additions + random safe widenings always
    produces exactly |additions| + |widenings| statements, and the
    resulting statement list re-applied to the widened live map is
    empty (idempotence)."""
    import random

    from cardano_spark.sinks.ddl import (
        SAFE_WIDENINGS,
        _declared_family,
        evolve_table_sql,
        sql_type,
    )

    rng = random.Random(7)
    pool = [
        T.IntegerType(), T.LongType(), T.SmallIntegerType()
        if hasattr(T, "SmallIntegerType") else T.ShortType(),
        T.FloatType(), T.DoubleType(), T.StringType(), T.BooleanType(),
        T.DateType(), T.DecimalType(18, 2),
    ]
    widen_map = {
        "smallint": T.IntegerType(),
        "integer": T.LongType(),
        "bigint": T.DecimalType(38, 0),
        "real": T.DoubleType(),
    }
    for trial in range(25):
        n = rng.randint(1, 6)
        v1_fields = [
            T.StructField(f"c{i}", rng.choice(pool), True) for i in range(n)
        ]
        v1 = T.StructType(v1_fields)
        live = {f.name: sql_type(f.dataType) for f in v1.fields}
        # S -> S: no-op
        stmts, extra = evolve_table_sql("t", v1, live)
        assert stmts == [] and extra == []
        # build v2: widen every widenable column with prob .5, add 0-2
        v2_fields = []
        n_widen = 0
        for f in v1.fields:
            fam = _declared_family(f.dataType, "ansi")
            if fam in widen_map and rng.random() < 0.5:
                tgt = widen_map[fam]
                assert (fam, _declared_family(tgt, "ansi")) in SAFE_WIDENINGS
                v2_fields.append(T.StructField(f.name, tgt, True))
                n_widen += 1
            else:
                v2_fields.append(f)
        n_add = rng.randint(0, 2)
        for j in range(n_add):
            v2_fields.append(T.StructField(f"new{j}", rng.choice(pool), True))
        v2 = T.StructType(v2_fields)
        stmts, extra = evolve_table_sql("t", v2, live)
        assert len(stmts) == n_widen + n_add, (trial, stmts)
        assert extra == []
        # idempotence: the evolved live map needs nothing further
        live2 = {f.name: sql_type(f.dataType) for f in v2.fields}
        again, _ = evolve_table_sql("t", v2, live2)
        assert again == []
