"""Unit tests: watermark store/gates, parquet merge sink, DB upsert
sink (against duckdb as the ON CONFLICT database)."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest
from pyspark.sql import types as T

from cardano_spark.sinks.merge import DBUpsertSink, ParquetMergeSink
from cardano_spark.watermark import (
    DEFAULT_START_BLOCK,
    ParquetWatermarkStore,
    dependency_gate,
    next_block_window,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def test_watermark_roundtrip(spark, tmp_path):
    store = ParquetWatermarkStore(spark, str(tmp_path / "wm"), "block_height", T.LongType())
    assert store.read_latest("cardano_blocks") is None
    store.upsert("cardano_blocks", 100)
    store.upsert("cardano_blocks", 200)
    store.upsert("other_table", 999)
    assert store.read_latest("cardano_blocks") == 200
    # replayed upsert (PK dup) is harmless
    store.upsert("cardano_blocks", 200)
    assert store.read_latest("cardano_blocks") == 200


def test_window_and_gate_logic():
    assert next_block_window(None, 2000) == (DEFAULT_START_BLOCK, DEFAULT_START_BLOCK + 1999)
    assert next_block_window(10, 5) == (11, 15)
    assert dependency_gate(None, None) is None  # parent never ran
    assert dependency_gate(None, 50) == (DEFAULT_START_BLOCK, 50) or dependency_gate(
        None, DEFAULT_START_BLOCK + 50
    ) == (DEFAULT_START_BLOCK, DEFAULT_START_BLOCK + 50)
    assert dependency_gate(50, 50) is None  # caught up
    assert dependency_gate(40, 50) == (41, 50)


def test_parquet_merge_sink(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), SCHEMA, ["k"])
    sink.merge(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    sink.merge(spark.createDataFrame([(2, "CHANGED"), (3, "c"), (3, "c2")], SCHEMA))
    rows = {r.k: r.v for r in sink.read().collect()}
    assert rows[1] == "a" and rows[2] == "b" and rows[3] in ("c", "c2")
    assert len(rows) == 3


def test_parquet_merge_sink_delete(spark, tmp_path):
    """Key-delete touches only buckets containing the keys, absent
    keys are a no-op, replay is idempotent, and a bucket emptied by
    the delete reads back empty (not an error)."""
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=4)
    sink.merge(
        spark.createDataFrame([(i, f"v{i}") for i in range(12)], SCHEMA)
    )
    dels = spark.createDataFrame([(2, "x"), (7, "x"), (99, "x")], SCHEMA)
    sink.delete(dels)
    rows = {r.k for r in sink.read().collect()}
    assert rows == set(range(12)) - {2, 7}
    sink.delete(dels)  # idempotent replay
    assert {r.k for r in sink.read().collect()} == set(range(12)) - {2, 7}
    # delete everything: table reads back empty, then accepts merges
    sink.delete(spark.createDataFrame([(i, "x") for i in range(12)], SCHEMA))
    assert sink.read().count() == 0
    # emptied buckets are REMOVED, not kept as empty placeholder dirs
    # (r9 ADVICE): no _bucket=K dirs remain after a full delete
    import os as _os

    assert not [
        d for d in _os.listdir(tmp_path / "t") if d.startswith("_bucket=")
    ]
    sink.merge(spark.createDataFrame([(42, "back")], SCHEMA))
    assert {r.k for r in sink.read().collect()} == {42}


def test_parquet_merge_sink_delete_before_create_is_noop(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), SCHEMA, ["k"])
    sink.delete(spark.createDataFrame([(1, "x")], SCHEMA))
    assert sink.read().count() == 0


def test_parquet_merge_sink_rejects_bucket_column(spark, tmp_path):
    """A schema partition-discovered from a live sink path carries the
    internal `_bucket` directory key as an int column (ADVICE r7);
    the constructor must reject it rather than persist it as data."""
    import pytest
    from pyspark.sql import types as T

    path = str(tmp_path / "t")
    sink = ParquetMergeSink(spark, path, SCHEMA, ["k"])
    sink.merge(spark.createDataFrame([(1, "a")], SCHEMA))
    discovered = spark.read.parquet(path).schema
    assert "_bucket" in discovered.fieldNames()  # the hazard is real
    with pytest.raises(ValueError, match="_bucket"):
        ParquetMergeSink(spark, path, discovered, ["k"])
    # the CLI strips it before constructing the sink
    stripped = T.StructType(
        [f for f in discovered.fields if f.name != "_bucket"]
    )
    reopened = ParquetMergeSink(spark, path, stripped, ["k"])
    assert {r.k for r in reopened.read().collect()} == {1}


def test_parquet_merge_sink_upsert_mode(spark, tmp_path):
    """upsert: incoming rows replace same-key rows, absent keys
    append, and replaying the same batch is a no-op."""
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), SCHEMA, ["k"])
    sink.merge(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    sink.merge(spark.createDataFrame([(2, "B2"), (3, "c")], SCHEMA), mode="upsert")
    rows = {r.k: r.v for r in sink.read().collect()}
    assert rows == {1: "a", 2: "B2", 3: "c"}
    sink.merge(spark.createDataFrame([(2, "B2"), (3, "c")], SCHEMA), mode="upsert")
    assert {r.k: r.v for r in sink.read().collect()} == {1: "a", 2: "B2", 3: "c"}
    with pytest.raises(ValueError):
        sink.merge(spark.createDataFrame([], SCHEMA), mode="replace")


def test_stream_update_rollup_upsert_is_incremental_matview(spark, tmp_path):
    """Incremental materialized view: an update-mode streaming
    aggregation emits re-computed (hour, event_type) aggregate rows
    per microbatch; upserting each emission into the bucketed sink
    converges the stored rollup to the full batch recompute — the
    hypertable-continuous-aggregate pattern with merge I/O bounded by
    touched buckets, not table size."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from cardano_spark.catalog import table as cat_table
    from cardano_spark.streaming import jobs
    from tests.conftest import SF_SMALL

    d = str(tmp_path / "events_dir")
    os.makedirs(d)
    ev = cat_table(spark, SF_SMALL, "events")
    for name, part in (("a", ev.filter(F.col("event_id") % 2 == 0)),
                       ("b", ev.filter(F.col("event_id") % 2 == 1))):
        tmp = str(tmp_path / f"w_{name}")
        part.withColumn("ts", F.col("ts").cast("timestamp_ntz")).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        f = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        shutil.copy(os.path.join(tmp, f), os.path.join(d, f"{name}_events.parquet"))

    rollup_schema = T.StructType(
        [
            T.StructField("hour", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    sink = ParquetMergeSink(
        spark, str(tmp_path / "rollup"), rollup_schema, ["hour", "event_type"]
    )

    raw = (
        spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(d)
    )
    agg = jobs.hourly_rollup(jobs.normalize_event_ts(raw))

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(lambda b, _i: sink.merge(b, mode="upsert"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        map(tuple, sink.read().select(*[f.name for f in rollup_schema]).collect())
    )
    want = sorted(map(tuple, jobs.hourly_rollup(ev).collect()))
    assert got == want


def test_parquet_merge_sink_compact(spark, tmp_path):
    """Repeated merges accumulate files per bucket; compact rewrites
    each fat bucket to one file with identical contents and skips
    already-compact buckets."""
    import os

    sink = ParquetMergeSink(spark, str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=4)
    for i in range(4):
        sink.merge(
            spark.createDataFrame([(j, f"v{j}") for j in range(i * 20, i * 20 + 20)], SCHEMA)
        )
    before = {r.k: r.v for r in sink.read().select("k", "v").collect()}

    def files_in(b):
        d = os.path.join(str(tmp_path / "t"), f"_bucket={b}")
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert any(len(files_in(b)) > 1 for b in range(4))
    compacted = sink.compact()
    assert compacted  # something was fat
    for b in range(4):
        assert len(files_in(b)) == 1
    assert {r.k: r.v for r in sink.read().select("k", "v").collect()} == before
    assert sink.compact() == []  # second pass: nothing left to do


def test_parquet_merge_sink_recovers_interrupted_swap(spark, tmp_path):
    """A crash between the two swap renames must not lose rows or
    duplicate them: the parked bucket lives OUTSIDE the table root
    (invisible to read()), and the next read/merge re-converges."""
    import os
    import shutil

    path = str(tmp_path / "t")
    sink = ParquetMergeSink(spark, path, SCHEMA, ["k"], n_buckets=4)
    sink.merge(spark.createDataFrame([(i, f"v{i}") for i in range(20)], SCHEMA))
    want = {r.k: r.v for r in sink.read().collect()}

    # crash case A: dst renamed away, new bucket never landed
    bucket = next(d for d in os.listdir(path) if d.startswith("_bucket="))
    b = int(bucket.split("=")[1])
    parked = f"{path}.old-b{b}-deadbeef"
    os.rename(os.path.join(path, bucket), parked)
    assert {r.k: r.v for r in sink.read().collect()} == want  # restored
    assert not os.path.isdir(parked)

    # crash case B: swap completed but parked copy never deleted —
    # the stale copy must NOT be readable (it sits outside the root)
    shutil.copytree(os.path.join(path, bucket), f"{path}.old-b{b}-cafe0000")
    assert {r.k: r.v for r in sink.read().collect()} == want
    assert not os.path.isdir(f"{path}.old-b{b}-cafe0000")  # swept

    # and a replayed merge after recovery stays idempotent
    sink.merge(spark.createDataFrame([(3, "REPLAY"), (100, "new")], SCHEMA))
    rows = {r.k: r.v for r in sink.read().collect()}
    assert rows[3] == "v3" and rows[100] == "new" and len(rows) == 21


def test_parquet_merge_sink_rewrites_only_touched_buckets(spark, tmp_path):
    """Merge I/O must be O(touched buckets): bucket files whose keys
    are disjoint from the incoming batch stay BYTE-IDENTICAL (never
    re-read or rewritten) — the property that makes an incremental
    merge into a 100 TB table affordable."""
    import hashlib
    import os

    def snapshot(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
        return out

    path = str(tmp_path / "t")
    sink = ParquetMergeSink(spark, path, SCHEMA, ["k"], n_buckets=8)
    sink.merge(spark.createDataFrame([(i, f"v{i}") for i in range(40)], SCHEMA))
    before = snapshot(path)

    # incoming batch: one replayed key + one new key -> <=2 buckets touched
    sink.merge(spark.createDataFrame([(3, "REPLAY"), (1000, "new")], SCHEMA))
    after = snapshot(path)

    from pyspark.sql import functions as F

    bucket_of = lambda k: spark.createDataFrame([(k,)], "k long").select(
        F.pmod(F.xxhash64("k"), F.lit(8)).cast("int").alias("b")
    ).first().b
    touched = {f"_bucket={bucket_of(3)}", f"_bucket={bucket_of(1000)}"}

    untouched_before = {p: h for p, h in before.items() if p.split(os.sep)[0] not in touched}
    untouched_after = {p: h for p, h in after.items() if p.split(os.sep)[0] not in touched}
    assert untouched_before and untouched_before == untouched_after

    rows = {r.k: r.v for r in sink.read().collect()}
    assert rows[3] == "v3" and rows[1000] == "new" and len(rows) == 41


def test_db_upsert_sink_on_conflict(spark, tmp_path):
    """Tables are bootstrapped FROM the StructTypes (no hand-written
    DDL): the target via from_schema + ensure_target, the watermark
    table via ddl.ensure_tables on the real
    provider_to_s3_import_status schema — whose `table` column is a
    reserved word, exercising identifier quoting end-to-end."""
    from cardano_spark.sinks import ddl

    db = str(tmp_path / "t.duckdb")
    factory = lambda: duckdb.connect(db)  # noqa: E731

    sink = DBUpsertSink.from_schema(
        connection_factory=factory, table="target", schema=SCHEMA, keys=["k"]
    )
    sink.ensure_target()
    ddl.ensure_tables(factory(), tables=["provider_to_s3_import_status"])
    con = duckdb.connect(db)
    con.execute("INSERT INTO target VALUES (1, 'existing')")
    con.close()

    df = spark.createDataFrame([(1, "replayed"), (2, "new"), (2, "dup")], SCHEMA).withColumnRenamed("k", "k")
    sink.merge(
        df,
        watermark_sql=(
            "INSERT INTO provider_to_s3_import_status "
            "VALUES ('target', 2, now()::TIMESTAMP)"
        ),
        via_driver=True,
    )

    con = duckdb.connect(db)
    rows = dict(con.execute("SELECT k, v FROM target ORDER BY k").fetchall())
    assert rows == {1: "existing", 2: "new"} or rows == {1: "existing", 2: "dup"}
    assert (
        con.execute(
            "SELECT max(block_height) FROM provider_to_s3_import_status"
        ).fetchone()[0]
        == 2
    )
    assert (
        con.execute(
            "SELECT count(*) FROM information_schema.tables WHERE table_name LIKE 'staging%'"
        ).fetchone()[0]
        == 0
    )
    con.close()


def test_db_upsert_sink_do_update_mode(spark, tmp_path):
    """mode='upsert' generates ON CONFLICT DO UPDATE: same-key rows
    are replaced, absent keys insert — the DB-side twin of the
    parquet sink's incremental-materialized-view path."""
    db = str(tmp_path / "u.duckdb")
    sink = DBUpsertSink.from_schema(
        connection_factory=lambda: duckdb.connect(db),
        table="target",
        schema=SCHEMA,
        keys=["k"],
    )
    sink.ensure_target()
    con = duckdb.connect(db)
    con.execute("INSERT INTO target VALUES (1, 'old'), (3, 'keep')")
    con.close()
    df = spark.createDataFrame([(1, "NEW"), (2, "ins")], SCHEMA)
    sink.merge(df, via_driver=True, mode="upsert")

    con = duckdb.connect(db)
    assert dict(con.execute("SELECT k, v FROM target ORDER BY k").fetchall()) == {
        1: "NEW",
        2: "ins",
        3: "keep",
    }
    con.close()
    assert 'DO UPDATE SET "v" = excluded."v"' in sink.merge_sql("upsert")
    with pytest.raises(ValueError):
        sink.merge_sql("replace")
    # key-only tables degrade to DO NOTHING (nothing to update)
    keyonly = DBUpsertSink(lambda: None, "t", ["k"], ["k"])
    assert "DO NOTHING" in keyonly.merge_sql("upsert")


def test_db_upsert_sink_parallel_staging(spark, tmp_path):
    """The scale default (staging_parallelism=None) must write staging
    partitions executor-parallel: one connection per partition, no
    coalesce(1) funnel. sqlite file locking serializes writers safely,
    so it stands in for a server DB here."""
    import os
    import sqlite3
    import uuid as _uuid

    from cardano_spark.sinks.ddl import create_table_sql

    db = str(tmp_path / "t.sqlite")
    con = sqlite3.connect(db)
    con.execute(create_table_sql("target", SCHEMA, ["k"]))
    con.execute("INSERT INTO target VALUES (1, 'existing')")
    con.commit()
    con.close()

    marks = tmp_path / "conns"
    marks.mkdir()

    def factory():
        # one marker file per opened connection = per staged partition
        (marks / f"{os.getpid()}-{_uuid.uuid4().hex}").touch()
        c = sqlite3.connect(db, timeout=60)
        c.execute("PRAGMA busy_timeout=60000")
        return c

    sink = DBUpsertSink(
        connection_factory=factory, table="target", columns=["k", "v"], keys=["k"]
    )
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 101)], SCHEMA
    ).repartition(4)
    sink.merge(df)

    con = sqlite3.connect(db)
    rows = dict(con.execute("SELECT k, v FROM target ORDER BY k").fetchall())
    con.close()
    assert rows[1] == "existing" and len(rows) == 100
    # 4 staging partitions + 1 driver connection => >= 5 connections;
    # the old coalesce(1) default would open exactly 2
    assert len(list(marks.iterdir())) >= 5


def test_incremental_file_listing(spark, tmp_path):
    """modifiedAfter semantics (S9/P3): only files newer than the
    watermark are read."""
    import json
    import os
    import time

    from cardano_spark.sources.files import max_modified, read_json_zone

    zone = tmp_path / "zone"
    (zone / "old").mkdir(parents=True)
    (zone / "new").mkdir(parents=True)
    (zone / "old" / "a.json").write_text(json.dumps({"x": 1}))
    old_mtime = time.time() - 3600
    os.utime(zone / "old" / "a.json", (old_mtime, old_mtime))
    (zone / "new" / "b.json").write_text(json.dumps({"x": 2}))

    schema = T.StructType([T.StructField("x", T.LongType())])
    all_rows = read_json_zone(spark, str(zone / "*"), schema)
    assert all_rows.count() == 2
    wm = datetime.utcfromtimestamp(time.time() - 1800)
    fresh = read_json_zone(spark, str(zone / "*"), schema, modified_after=wm)
    assert [r.x for r in fresh.collect()] == [2]
    assert max_modified(fresh) is not None


# --------------------------------------------------------------------------
# StructType -> DDL bootstrap (sinks/ddl.py)
# --------------------------------------------------------------------------


def test_ddl_bootstrap_creates_full_warehouse(tmp_path):
    """The Alembic-equivalent: every target + watermark table springs
    from its StructType, idempotently (IF NOT EXISTS), with the
    reserved-word `table` column quoted — verified by actually
    creating and querying the warehouse on duckdb."""
    from cardano_spark import schemas
    from cardano_spark.sinks import ddl

    con = duckdb.connect(str(tmp_path / "wh.duckdb"))
    ddl.ensure_tables(con)
    ddl.ensure_tables(con)  # idempotent second run must not raise

    made = {
        r[0]
        for r in con.execute(
            "SELECT table_name FROM information_schema.tables"
        ).fetchall()
    }
    assert made >= set(schemas.TARGET_SCHEMAS)

    # reserved-word column round-trips through quoting
    con.execute(
        "INSERT INTO provider_to_s3_import_status VALUES"
        " ('cardano_blocks', 7, now()::TIMESTAMP)"
    )
    assert (
        con.execute(
            'SELECT "table", block_height FROM provider_to_s3_import_status'
        ).fetchone()[0]
        == "cardano_blocks"
    )
    # PK enforcement came from PRIMARY_KEYS
    with pytest.raises(duckdb.ConstraintException):
        con.execute(
            "INSERT INTO cardano_blocks (time, height, hash, slot,"
            " slot_leader, size, tx_count, confirmations, created_at)"
            " VALUES (now()::TIMESTAMP, 1, 'h', 1, 'l', 1, 1, 1,"
            " now()::TIMESTAMP),"
            " (now()::TIMESTAMP, 1, 'h2', 2, 'l', 1, 1, 1, now()::TIMESTAMP)"
        )
    con.close()


def test_ddl_dialect_mapping():
    from cardano_spark import schemas
    from cardano_spark.sinks import ddl

    arr = T.ArrayType(T.StringType())
    assert ddl.sql_type(arr, "postgres") == "TEXT[]"
    assert ddl.sql_type(arr, "ansi") == "VARCHAR"  # text-codec column
    assert ddl.sql_type(T.DecimalType(38, 0), "postgres") == "NUMERIC(38,0)"
    assert ddl.sql_type(T.BinaryType(), "postgres") == "BYTEA"
    assert ddl.sql_type(T.DoubleType(), "postgres") == "DOUBLE PRECISION"
    with pytest.raises(ValueError):
        ddl.sql_type(T.StringType(), "oracle")
    with pytest.raises(ValueError):
        ddl.sql_type(T.MapType(T.StringType(), T.StringType()))

    sql = ddl.create_table_sql(
        "cardano_block_transactions",
        schemas.CARDANO_BLOCK_TRANSACTIONS,
        schemas.PRIMARY_KEYS["cardano_block_transactions"],
        dialect="postgres",
    )
    assert '"tx_hash" TEXT[] NOT NULL' in sql
    assert 'PRIMARY KEY ("block")' in sql

    with pytest.raises(ValueError):
        ddl.create_table_sql("t", schemas.CARDANO_BLOCKS, keys=["nope"])


def test_dedup_by_key_deterministic_survivor(spark):
    """Conflicting same-key rows collapse to the smallest non-key
    tuple (nulls first) — the batch-internal dedup is a pure function
    of batch contents, not of partition scheduling."""
    from cardano_spark.sinks.merge import dedup_by_key

    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, None), (2, "z")], SCHEMA
    ).repartition(7)
    got = {(r.k, r.v) for r in dedup_by_key(df, ["k"]).collect()}
    assert got == {(1, None), (2, "z")}

    # key-only frames fall back to plain dropDuplicates
    ids = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    assert dedup_by_key(ids, ["k"]).count() == 2


def test_parquet_merge_upsert_deterministic_with_conflicting_batch(spark, tmp_path):
    sink = ParquetMergeSink(
        spark, str(tmp_path / "t"), SCHEMA, keys=["k"], n_buckets=4
    )
    batch = spark.createDataFrame(
        [(1, "x"), (1, "w"), (2, "q")], SCHEMA
    ).repartition(5)
    sink.merge(batch, mode="upsert")
    assert {(r.k, r.v) for r in sink.read().collect()} == {(1, "w"), (2, "q")}


# --------------------------------------------------------------------------
# Bucket-count evolution (rebucket) + size-targeted compaction
# --------------------------------------------------------------------------


def test_rebucket_grows_table_byte_identical(spark, tmp_path):
    """Grow a live table 4 -> 8 buckets: row content is identical,
    the new layout is real (8 bucket dirs), the bucket count persists
    in table meta (a NEW sink built with a stale constructor arg picks
    up 8), and post-rebucket merges keep working bucket-locally."""
    import os

    path = str(tmp_path / "t")
    sink = ParquetMergeSink(spark, path, SCHEMA, keys=["k"], n_buckets=4)
    sink.merge(spark.createDataFrame([(i, f"v{i}") for i in range(50)], SCHEMA))
    before = sorted(map(tuple, sink.read().collect()))

    sink.rebucket(8)
    assert sink.n_buckets == 8
    dirs = {d for d in os.listdir(path) if d.startswith("_bucket=")}
    assert len(dirs) > 4  # keys actually spread over the new space
    assert sorted(map(tuple, sink.read().collect())) == before

    stale = ParquetMergeSink(spark, path, SCHEMA, keys=["k"], n_buckets=4)
    assert stale.n_buckets == 8  # meta wins over the constructor arg
    stale.merge(spark.createDataFrame([(100, "new"), (3, "dup")], SCHEMA))
    rows = {r.k: r.v for r in stale.read().collect()}
    assert rows[100] == "new" and rows[3] == "v3" and len(rows) == 51

    # no-op and validation paths
    sink.rebucket(8)
    with pytest.raises(ValueError):
        sink.rebucket(0)


def test_rebucket_interrupted_swap_recovers(spark, tmp_path):
    """Crash between the two whole-table renames (root parked as
    .rebucket-old, new layout not yet promoted): the next read must
    promote the completed new layout and adopt its bucket count."""
    import os
    import shutil

    path = str(tmp_path / "t")
    sink = ParquetMergeSink(spark, path, SCHEMA, keys=["k"], n_buckets=2)
    sink.merge(spark.createDataFrame([(i, f"v{i}") for i in range(20)], SCHEMA))
    before = sorted(map(tuple, sink.read().collect()))

    # manufacture the mid-rebucket crash state by hand: fully-written
    # new layout sibling + parked old root, no live root
    fresh = ParquetMergeSink(spark, path + ".stage", SCHEMA, ["k"], n_buckets=5)
    fresh.merge(spark.createDataFrame([(i, f"v{i}") for i in range(20)], SCHEMA))
    os.rename(path + ".stage", path + ".rebucket-new-deadbeef")
    os.rename(path, path + ".rebucket-old-deadbeef")

    recovered = ParquetMergeSink(spark, path, SCHEMA, keys=["k"], n_buckets=2)
    assert sorted(map(tuple, recovered.read().collect())) == before
    assert recovered.n_buckets == 5  # from the promoted layout's meta
    assert not os.path.isdir(path + ".rebucket-old-deadbeef")
    assert not os.path.isdir(path + ".rebucket-new-deadbeef")

    # aborted-write state (root still live, orphan new sibling): the
    # orphan is garbage-collected, the live root wins
    shutil.copytree(path, path + ".rebucket-new-cafe")
    again = ParquetMergeSink(spark, path, SCHEMA, keys=["k"])
    assert sorted(map(tuple, again.read().collect())) == before
    assert not os.path.isdir(path + ".rebucket-new-cafe")


def test_compact_size_targeted(spark, tmp_path):
    """target_file_bytes splits a fat bucket into ~ceil(bytes/target)
    files instead of one; content unchanged."""
    import os

    path = str(tmp_path / "t")
    sink = ParquetMergeSink(spark, path, SCHEMA, keys=["k"], n_buckets=1)
    for batch in range(6):  # 6 merges -> many files in bucket 0
        sink.merge(
            spark.createDataFrame(
                [(batch * 100 + i, "x" * 200) for i in range(50)], SCHEMA
            )
        )
    before = sorted(map(tuple, sink.read().collect()))
    n_files, n_bytes = sink._bucket_stats(0)
    assert n_files >= 6
    target = max(1, n_bytes // 3)  # aim for ~3 files
    assert sink.compact(target_file_bytes=target) == [0]
    after_files, _ = sink._bucket_stats(0)
    assert 1 < after_files <= 6
    assert sorted(map(tuple, sink.read().collect())) == before
    # already-compacted bucket is left alone on a second pass
    assert sink.compact(target_file_bytes=target) == []


def test_rebucket_chain_random_counts(spark, tmp_path):
    """Content survives an arbitrary chain of bucket-count
    transitions (grow, shrink, repeat), with merges interleaved."""
    import random

    rng = random.Random(4)
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=3)
    rows = {}
    next_k = 0
    for n in [7, 2, 5, 16, 3]:
        batch = [(next_k + i, f"v{next_k + i}") for i in range(rng.randint(5, 30))]
        next_k += len(batch)
        rows.update(dict(batch))
        sink.merge(spark.createDataFrame(batch, SCHEMA))
        sink.rebucket(n)
        assert sink.n_buckets == n
        assert {(r.k, r.v) for r in sink.read().collect()} == set(rows.items())


def test_cli_maintain_compact_and_rebucket(spark, tmp_path, capsys):
    """The `maintain` CLI subcommand reaches compact/rebucket (the
    operational runbook step): build a fragmented merge-sink table,
    run `maintain --compact --rebucket`, and verify the table is
    byte-identical with the new layout."""
    import os

    from cardano_spark.__main__ import main

    path = str(tmp_path / "t")
    sink = ParquetMergeSink(spark, path, SCHEMA, ["k"], n_buckets=4)
    for i in range(4):
        sink.merge(
            spark.createDataFrame(
                [(j, f"v{j}") for j in range(i * 20, i * 20 + 20)], SCHEMA
            )
        )
    before = {r.k: r.v for r in sink.read().select("k", "v").collect()}

    rc = main(
        ["maintain", "--path", path, "--keys", "k",
         "--rebucket", "8", "--compact"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "rebucketed" in out and "compacted" in out
    reopened = ParquetMergeSink(spark, path, SCHEMA, ["k"])
    assert reopened.n_buckets == 8
    assert {
        r.k: r.v for r in reopened.read().select("k", "v").collect()
    } == before
    for b in range(8):
        d = os.path.join(path, f"_bucket={b}")
        if os.path.isdir(d):
            assert (
                len([f for f in os.listdir(d) if f.endswith(".parquet")])
                == 1
            )
