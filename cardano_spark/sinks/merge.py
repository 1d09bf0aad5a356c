"""Idempotent merge sinks — the reference's exactly-once-per-key load
path (SURVEY.md §2.2 K3/K4, §2.7 D1) re-expressed for Spark.

Two implementations of the same contract (``merge(df)``):

- ``ParquetMergeSink``: a parquet-backed managed table for local /
  lakehouse use. Insert-if-absent is a left-anti join against the
  current snapshot, then an atomic directory swap. At 100 TB you'd
  use an Iceberg/Delta table and its MERGE INTO; the anti-join plan
  is identical — this sink is the dependency-free stand-in.
- ``DBUpsertSink``: staging + single merge statement against a
  DB-API database (the reference's temp table + asyncpg COPY +
  ``INSERT ... SELECT ... ON CONFLICT DO NOTHING``,
  src/dao/cardano_block_dao.py:93-148). Rows travel executor-side via
  ``foreachPartition``; the merge + watermark update run in ONE
  driver-side transaction, mirroring the reference's
  ``engine.begin()`` scope (s3_to_db_cardano_blocks_pipeline.py:105-127).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cardano_spark.sinks.ddl import create_table_sql, quote_ident


def dedup_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Batch-internal dedup (D2) with a DETERMINISTIC survivor: among
    same-key rows the one with the smallest non-key column tuple wins
    (nulls first — Spark's ascending default).  ``dropDuplicates``
    keeps an arbitrary row, which is harmless for identical-value
    replays but silently nondeterministic when a batch carries
    conflicting values per key; this pins the choice so upsert output
    is a pure function of the batch contents."""
    non_keys = [c for c in df.columns if c not in keys]
    if not non_keys:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in non_keys])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


class ParquetMergeSink:
    """Managed parquet table with INSERT-if-absent merge semantics,
    hash-bucketed on the merge key so a merge touches only the
    buckets containing incoming keys.

    Layout: ``path/_bucket=K/*.parquet`` with
    ``K = pmod(xxhash64(*keys), n_buckets)`` — a pure function of the
    key, so an existing row and any incoming duplicate of it land in
    the same bucket and the anti-join stays correct bucket-locally.

    Merge I/O is O(touched buckets), not O(table): round 1 re-read
    and rewrote the WHOLE snapshot per merge, which is a scale-killer
    for an incremental load path (a 100 TB table absorbing a 100 GB
    batch rewrote 100 TB). Untouched bucket directories are never
    opened or rewritten (their files stay byte-identical — pinned by
    tests/test_watermark_and_sinks.py).

    Crash safety: each touched bucket is rewritten to a tmp dir and
    atomically swapped. Cross-bucket atomicity is NOT needed because
    the merge is insert-if-absent idempotent — a crash between bucket
    swaps re-runs to the same converged state (already-swapped
    buckets anti-join incoming to nothing). At 100 TB you'd use an
    Iceberg/Delta table and its transactional MERGE INTO; the plan
    per bucket is identical.

    The displaced live bucket is parked OUTSIDE the table root
    (``{path}.old-b{K}-*``, a sibling dir) — never under ``path`` —
    so a crash mid-swap can't leave stale rows readable: Spark's
    hidden-path filter skips only ``_``/``.``-prefixed names, and
    ``_bucket=K.old-...`` contains ``=`` so it would be picked up as
    a partition dir. ``_recover_partial_swaps`` (run before every
    read and merge) finishes the job deterministically: an ``.old``
    whose bucket dir is missing is restored (the swap never
    completed); one whose bucket dir exists is garbage from after a
    completed swap and is dropped.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        keys: Sequence[str],
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        # `_bucket` is the sink's internal partition-directory key, not
        # table data. A schema discovered via spark.read.parquet(path)
        # on a live sink partition-discovers it as an int column;
        # accepting it would persist a spurious `_bucket` data column on
        # the next merge() and surface it from read().
        if any(f.name == "_bucket" for f in schema.fields):
            raise ValueError(
                "ParquetMergeSink schema must not contain the internal "
                "'_bucket' column (partition-discovered from a live "
                "sink path? strip it before constructing the sink)"
            )
        self.schema = schema
        self.keys = list(keys)
        # a live table's bucket count is TABLE state, not caller
        # opinion: honor the persisted meta when present (written at
        # first merge / updated by rebucket), else the argument is the
        # creation default. A stale constructor arg after a rebucket
        # would otherwise mis-route every future merge.
        self.n_buckets = self._read_meta() or n_buckets

    _META = "_table_meta.json"  # leading "_": invisible to Spark scans

    def _meta_path(self) -> str:
        return os.path.join(self.path, self._META)

    def _read_meta(self) -> int | None:
        try:
            import json

            with open(self._meta_path()) as f:
                return int(json.load(f)["n_buckets"])
        except (OSError, ValueError, KeyError):
            return None

    def _write_meta(self, n_buckets: int) -> None:
        import json

        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_buckets": n_buckets}, f)
        os.replace(tmp, self._meta_path())  # atomic on POSIX

    def exists(self) -> bool:
        return os.path.isdir(self.path)

    def _bucket_col(self) -> Column:
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in self.keys]), F.lit(self.n_buckets)
        ).cast("int")

    def _bucket_dir(self, b: int) -> str:
        return os.path.join(self.path, f"_bucket={b}")

    def _old_dir(self, b: int) -> str:
        return f"{self.path}.old-b{b}-{uuid.uuid4().hex[:8]}"

    def _recover_partial_swaps(self) -> None:
        """Re-converge any swap interrupted between renames — per-bucket
        merge swaps AND whole-table rebucket swaps. Idempotent; scalar
        driver-side I/O.

        Rebucket invariant: the table root is renamed away only AFTER
        the new layout is fully written, so `path` missing + a
        ``.rebucket-new`` sibling present always means the new layout
        is complete — promote it. `path` present means any rebucket
        siblings are garbage (completed swap's parked copy, or an
        aborted write)."""
        parent, base = os.path.split(self.path.rstrip("/"))
        if not os.path.isdir(parent or "."):
            return
        names = os.listdir(parent or ".")
        # --- whole-table rebucket swaps -----------------------------
        news = sorted(n for n in names if n.startswith(f"{base}.rebucket-new-"))
        olds = sorted(n for n in names if n.startswith(f"{base}.rebucket-old-"))
        if os.path.isdir(self.path):
            for n in news + olds:
                shutil.rmtree(os.path.join(parent, n))
        elif news or olds:
            promote = news[0] if news else olds[0]
            os.rename(os.path.join(parent, promote), self.path)
            for n in news + olds:
                p = os.path.join(parent, n)
                if os.path.isdir(p):
                    shutil.rmtree(p)
            self.n_buckets = self._read_meta() or self.n_buckets
        # --- per-bucket merge swaps ---------------------------------
        prefix = f"{base}.old-b"
        for name in names:
            if not name.startswith(prefix):
                continue
            bucket = name[len(prefix):].split("-", 1)[0]
            old = os.path.join(parent, name)
            if not os.path.isdir(old):
                continue  # already consumed by the rebucket pass
            dst = self._bucket_dir(int(bucket))
            if os.path.isdir(dst):
                shutil.rmtree(old)  # swap completed; parked copy is garbage
            else:
                os.rename(old, dst)  # swap never completed; restore

    def read(self) -> DataFrame:
        """The table under exactly the declared schema (the `_bucket`
        partition directory key is an internal layout detail, not a
        column — partition discovery would otherwise append it)."""
        self._recover_partial_swaps()  # may restore a missing root
        if not self.exists():
            return self.spark.createDataFrame([], self.schema)
        return (
            self.spark.read.schema(self.schema)
            .parquet(self.path)
            .select(*[f.name for f in self.schema.fields])
        )

    def _read_buckets(self, buckets: Sequence[int]) -> DataFrame:
        dirs = [self._bucket_dir(b) for b in buckets if os.path.isdir(self._bucket_dir(b))]
        if not dirs:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*dirs)

    def merge(self, incoming: DataFrame, mode: str = "insert") -> None:
        """Key-merge a batch into the table, touching only the buckets
        containing incoming keys (read, anti-join, rewrite, swap).

        - ``mode="insert"``: rows whose key is absent are appended;
          existing rows win (ON CONFLICT DO NOTHING — the reference's
          idempotency primitive, D1).
        - ``mode="upsert"``: incoming rows REPLACE existing rows with
          the same key (ON CONFLICT DO UPDATE). This is the
          incremental-materialized-view path: a streaming update-mode
          aggregation emits re-computed aggregate rows per key each
          microbatch, and upserting them keeps the stored rollup equal
          to the full recompute. Idempotent for replayed batches as
          long as replays carry the same values (update-mode streaming
          state guarantees that).

        Batch-internal dups collapse first (D2) with a deterministic
        survivor (:func:`dedup_by_key` — smallest non-key tuple), so a
        batch carrying conflicting values per key upserts a
        well-defined row."""
        if mode not in ("insert", "upsert"):
            raise ValueError(f"mode must be insert|upsert, got {mode!r}")
        # recovery BEFORE the bucket expression: a pending rebucket
        # promote may change n_buckets
        self._recover_partial_swaps()
        os.makedirs(self.path, exist_ok=True)
        if self._read_meta() is None:
            self._write_meta(self.n_buckets)
        fresh = dedup_by_key(incoming, self.keys).withColumn(
            "_bucket", self._bucket_col()
        )
        # touched-bucket ids: <= n_buckets scalars, driver-side by design
        touched = sorted(
            r._bucket for r in fresh.select("_bucket").distinct().collect()
        )
        if not touched:
            return
        existing = self._read_buckets(touched).withColumn(
            "_bucket", self._bucket_col()
        )
        if mode == "insert":
            merged = existing.unionByName(
                fresh.join(existing.select(*self.keys), self.keys, "left_anti")
            )
        else:
            merged = fresh.unionByName(
                existing.join(fresh.select(*self.keys), self.keys, "left_anti")
            )
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        self._swap_buckets(tmp, touched)

    def delete(self, keys: DataFrame) -> None:
        """Key-delete a batch from the table, touching only the
        buckets containing the keys (read, anti-join, rewrite, swap —
        the removal twin of :meth:`merge`, |keys|-bounded the same
        way). Keys absent from the table are a no-op; the operation
        is idempotent under replay. Added for the corpus build's
        late-decontamination retraction flow (r8 verdict task 4)."""
        self._recover_partial_swaps()
        if self._read_meta() is None:
            return  # table never created — nothing to delete
        fresh = keys.select(*self.keys).distinct().withColumn(
            "_bucket", self._bucket_col()
        )
        touched = sorted(
            r._bucket for r in fresh.select("_bucket").distinct().collect()
        )
        if not touched:
            return
        existing = self._read_buckets(touched).withColumn(
            "_bucket", self._bucket_col()
        )
        remaining = existing.join(
            fresh.select(*self.keys), self.keys, "left_anti"
        )
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        remaining.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        # a bucket emptied by the delete writes no dir under tmp:
        # _swap_buckets removes the live dir outright (swap in
        # nothing), so emptied buckets don't accumulate as empty
        # placeholder dirs in the table root — read()/merge() treat a
        # missing bucket dir and an empty one identically, and a
        # later merge that re-touches the bucket recreates it
        self._swap_buckets(tmp, touched, allow_empty=True)

    def _swap_buckets(
        self, tmp: str, buckets: Sequence[int], allow_empty: bool = False
    ) -> None:
        """Atomically swap freshly-written bucket dirs from ``tmp``
        into the table root (displaced buckets parked outside it).

        ``allow_empty`` (the :meth:`delete` path): a touched bucket
        with no dir under ``tmp`` was EMPTIED by the rewrite — remove
        its live dir instead of leaving a stale or empty placeholder
        (readers treat a missing bucket dir as empty; a later merge
        recreates it). merge/compact never produce this case (every
        bucket they touch carries at least the incoming rows), so
        a missing src there is a contract violation, not a state."""
        for b in buckets:
            src = os.path.join(tmp, f"_bucket={b}")
            dst = self._bucket_dir(b)
            if not os.path.isdir(src):
                if not allow_empty:
                    raise AssertionError(
                        f"_swap_buckets: bucket {b} missing from {tmp} "
                        "outside the delete path"
                    )
                if os.path.isdir(dst):
                    # park-then-remove, same crash discipline as the
                    # swap: a crash after the rename is recovered by
                    # _recover_partial_swaps (dst missing -> restore;
                    # the replayed delete then empties it again)
                    old = self._old_dir(b)
                    os.rename(dst, old)
                    shutil.rmtree(old)
                continue
            old = self._old_dir(b)  # parked OUTSIDE the table root
            if os.path.isdir(dst):
                os.rename(dst, old)
                os.rename(src, dst)
                shutil.rmtree(old)
            else:
                os.rename(src, dst)
        shutil.rmtree(tmp)

    def _bucket_stats(self, b: int) -> tuple[int, int]:
        """(parquet file count, total bytes) for one bucket dir."""
        d = self._bucket_dir(b)
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        return len(files), sum(
            os.path.getsize(os.path.join(d, f)) for f in files
        )

    def compact(
        self,
        max_files_per_bucket: int = 1,
        target_file_bytes: int | None = None,
    ) -> list[int]:
        """Small-files maintenance: every incremental merge appends a
        file set to each touched bucket, so a long-running table
        accumulates files that degrade scan planning (one task per
        tiny file at 100 TB). Rewrite each over-threshold bucket and
        swap it atomically — same crash-safe swap and recovery path as
        merge, so an interrupted compaction re-converges. Untouched
        buckets are never opened. Returns the compacted bucket ids
        (driver-side scalars, <= n_buckets).

        ``target_file_bytes=None``: one file per bucket — the right
        contract when a bucket is sized to a core's working set.
        At 100 TB a bucket outgrows one file: pass
        ``target_file_bytes`` and each bucket is rewritten to
        ``ceil(bucket_bytes / target)`` files via a key-hash salt, so
        files land near the target size; compaction triggers once the
        file count exceeds that ideal PLUS ONE (the +1 hysteresis —
        a just-compacted bucket whose bytes shrank under
        recompression must not immediately re-trigger)."""
        self._recover_partial_swaps()
        if not self.exists():
            return []
        want: dict[int, int] = {}  # bucket -> target file count
        for b in range(self.n_buckets):
            if not os.path.isdir(self._bucket_dir(b)):
                continue
            n_files, n_bytes = self._bucket_stats(b)
            if target_file_bytes is None:
                ideal, threshold = 1, max_files_per_bucket
            else:
                ideal = max(1, -(-n_bytes // target_file_bytes))
                # +1 hysteresis: a just-compacted bucket whose bytes
                # shrank under recompression must not re-trigger
                threshold = ideal + 1
            if n_files > threshold:
                want[b] = ideal
        fat = sorted(want)
        if not fat:
            return []
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        df = self._read_buckets(fat).withColumn("_bucket", self._bucket_col())
        if target_file_bytes is None:
            out = df.repartition(len(fat), "_bucket")
        else:
            # per-bucket salt in [0, ideal): ceil(bytes/target) files
            # per bucket, spread by a second key hash
            salt_mod = F.lit(1)
            for b, n in want.items():
                salt_mod = F.when(F.col("_bucket") == b, F.lit(n)).otherwise(
                    salt_mod
                )
            out = (
                df.withColumn(
                    "_salt",
                    F.pmod(
                        F.xxhash64(*[F.col(k) for k in self.keys], F.lit(7)),
                        salt_mod,
                    ).cast("int"),
                )
                .repartition(sum(want.values()), "_bucket", "_salt")
                .drop("_salt")
            )
        out.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        self._swap_buckets(tmp, fat)
        return fat

    def rebucket(self, new_n: int) -> None:
        """Bucket-count evolution: rewrite the WHOLE table into
        ``new_n`` hash buckets (a growing table's per-bucket working
        set eventually outgrows a core; a shrinking one wastes tasks).
        Reuses the crash-safe sibling-swap discipline: the new layout
        (with its meta) is fully written to a ``.rebucket-new`` sibling
        first, the live root is parked as ``.rebucket-old``, the new
        root is promoted, and ``_recover_partial_swaps`` re-converges
        any interruption deterministically from whichever rename the
        crash fell between. Rows are byte-identical — only the
        directory a row lives in changes.

        This is O(table) I/O by nature (every row changes bucket with
        probability ~1 - 1/max(old,new)); at lakehouse scale the same
        operation is an Iceberg/Delta partition-spec evolution +
        rewrite."""
        if new_n < 1:
            raise ValueError(f"new_n must be >= 1, got {new_n}")
        self._recover_partial_swaps()
        if not self.exists():
            self.n_buckets = new_n  # nothing on disk yet
            return
        if new_n == self.n_buckets:
            return
        token = uuid.uuid4().hex[:8]
        new_dir = f"{self.path}.rebucket-new-{token}"
        old_dir = f"{self.path}.rebucket-old-{token}"
        new_bucket = F.pmod(
            F.xxhash64(*[F.col(k) for k in self.keys]), F.lit(new_n)
        ).cast("int")
        (
            self.read()
            .withColumn("_bucket", new_bucket)
            .repartition(min(new_n, 64), "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(new_dir)
        )
        import json

        with open(os.path.join(new_dir, self._META), "w") as f:
            json.dump({"n_buckets": new_n}, f)
        os.rename(self.path, old_dir)
        os.rename(new_dir, self.path)
        shutil.rmtree(old_dir)
        self.n_buckets = new_n


def pg_copy_sql(table: str, columns: Sequence[str]) -> str:
    """The PG bulk-load statement for a staging table:
    ``COPY "t" ("a","b") FROM STDIN WITH (FORMAT text)``."""
    cols = ", ".join(quote_ident(c) for c in columns)
    return f"COPY {quote_ident(table)} ({cols}) FROM STDIN WITH (FORMAT text)"


def _pg_array_literal(arr: Sequence) -> str:
    """Python twin of sources/jdbc.py::encode_pg_text_array (PG docs
    §8.15.6): every non-null element double-quoted with ``\\`` and
    ``\"`` escaped; NULL elements as the bare word NULL."""
    parts = []
    for e in arr:
        if e is None:
            parts.append("NULL")
        else:
            s = e if isinstance(e, str) else str(e)
            parts.append('"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"')
    return "{" + ",".join(parts) + "}"


def encode_copy_text_row(values: Sequence) -> str:
    """One row in PG COPY text format (PostgreSQL docs, COPY "Text
    Format"): tab-separated fields, ``\\N`` for NULL, backslash
    escapes for the four metacharacters (backslash, tab, newline,
    carriage return), and list/tuple values emitted as PG array
    literals (the TEXT[] columns from ddl.py) — ``str()`` of a Python
    list is NOT a PG array and COPY would reject it. No trailing
    newline — the caller frames rows."""
    out = []
    for v in values:
        if v is None:
            out.append(r"\N")
            continue
        if isinstance(v, (list, tuple)):
            s = _pg_array_literal(v)
        else:
            s = v if isinstance(v, str) else str(v)
        s = (
            s.replace("\\", "\\\\")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )
        out.append(s)
    return "\t".join(out)


class DBUpsertSink:
    """Staging-table + merge-statement upsert into a SQL database.

    ``connection_factory`` returns a DB-API connection; executors open
    their own for the staging inserts (partition-parallel, the Spark
    answer to the reference's single asyncpg COPY), and the driver
    opens one for the DDL + merge + watermark transaction.

    ``staging_parallelism=None`` (the default) keeps the incoming
    frame's partitioning — every executor writes its partition
    concurrently, which is the only default that survives a 100 TB
    staging load. Pass an int to bound concurrent DB connections
    (``1`` = the single-writer path for embedded/file databases).

    For engines with COPY (Postgres), pass ``copy_partition`` to
    replace executemany with the bulk path — same structure the
    reference uses (asyncpg ``copy_to_table``,
    cardano_block_dao.py:122-137). It is called per staged partition
    as ``copy_partition(conn, sql, payload)`` where ``sql`` is
    :func:`pg_copy_sql` for the staging table and ``payload`` is the
    newline-framed :func:`encode_copy_text_row` text; a psycopg
    implementation is one line
    (``conn.cursor().copy_expert(sql, io.StringIO(payload))``).
    """

    def __init__(
        self,
        connection_factory: Callable[[], object],
        table: str,
        columns: Sequence[str],
        keys: Sequence[str],
        staging_parallelism: int | None = None,
        copy_partition: Callable[[object, str, str], None] | None = None,
    ):
        self.connection_factory = connection_factory
        self.table = table
        self.columns = list(columns)
        self.keys = list(keys)
        self.staging_parallelism = staging_parallelism
        self.copy_partition = copy_partition

    @classmethod
    def from_schema(
        cls,
        connection_factory: Callable[[], object],
        table: str,
        schema: T.StructType | None = None,
        keys: Sequence[str] | None = None,
        staging_parallelism: int | None = None,
    ) -> "DBUpsertSink":
        """Build the sink straight from a StructType — columns and keys
        derive from ``cardano_spark.schemas`` (``TARGET_SCHEMAS`` /
        ``PRIMARY_KEYS``) when not given, mirroring how the reference's
        DAOs derive their column lists from SQLAlchemy metadata."""
        from cardano_spark import schemas as _schemas

        if schema is None:
            schema = _schemas.TARGET_SCHEMAS[table]
        if keys is None:
            keys = _schemas.PRIMARY_KEYS[table]
        sink = cls(
            connection_factory,
            table,
            schema.fieldNames(),
            keys,
            staging_parallelism=staging_parallelism,
        )
        sink.schema = schema
        return sink

    def ensure_target(self, dialect: str = "ansi") -> None:
        """Idempotent CREATE TABLE IF NOT EXISTS for the target from
        its StructType (requires ``from_schema`` construction — the
        plain constructor has no type information). The Alembic-
        equivalent bootstrap step."""
        schema = getattr(self, "schema", None)
        if schema is None:
            raise ValueError(
                "ensure_target needs a StructType: construct via from_schema"
            )
        con = self.connection_factory()
        cur = con.cursor() if hasattr(con, "cursor") else con
        cur.execute(
            create_table_sql(self.table, schema, self.keys, dialect=dialect)
        )
        if hasattr(con, "commit"):
            con.commit()

    def evolve_target(self, dialect: str = "ansi") -> tuple[list[str], list[str]]:
        """Bring an ALREADY-DEPLOYED target up to this sink's declared
        StructType: additive ADD COLUMNs + safe widenings only
        (sinks/ddl.evolve_table — the derived-Alembic step; creates
        the table when absent). Run before ``merge`` after a schema
        release; returns (executed statements, extra live columns kept
        untouched)."""
        schema = getattr(self, "schema", None)
        if schema is None:
            raise ValueError(
                "evolve_target needs a StructType: construct via from_schema"
            )
        from cardano_spark.sinks.ddl import evolve_table

        return evolve_table(
            self.connection_factory(), self.table, schema, dialect=dialect
        )

    # -- SQL builders (dialect: ANSI + ON CONFLICT, works for PG/DuckDB;
    #    identifiers double-quoted so reserved-word columns — the
    #    watermark tables' `table` — survive every dialect) --

    def staging_name(self) -> str:
        return f"staging_{self.table}"

    def create_staging_sql(self) -> str:
        # LIKE-less portable form: copy structure from target
        return (
            f"CREATE TABLE {quote_ident(self.staging_name())} AS "
            f"SELECT * FROM {quote_ident(self.table)} WHERE 1=0"
        )

    def insert_sql(self) -> str:
        cols = ", ".join(quote_ident(c) for c in self.columns)
        ph = ", ".join(["?"] * len(self.columns))
        return (
            f"INSERT INTO {quote_ident(self.staging_name())} ({cols}) "
            f"VALUES ({ph})"
        )

    def merge_sql(self, mode: str = "insert") -> str:
        """INSERT ... SELECT DISTINCT ON key ... ON CONFLICT DO
        NOTHING (cardano_block_dao.py:138-148), or with
        ``mode="upsert"`` DO UPDATE SET (the incremental-
        materialized-view twin of ParquetMergeSink.merge(upsert)).

        The staging dedup window orders by the NON-key columns, so the
        surviving row among same-key staging rows is deterministic
        (smallest non-key tuple under the engine's default sort) —
        same contract as :func:`dedup_by_key` on the parquet sink."""
        if mode not in ("insert", "upsert"):
            raise ValueError(f"mode must be insert|upsert, got {mode!r}")
        cols = ", ".join(quote_ident(c) for c in self.columns)
        keys = ", ".join(quote_ident(k) for k in self.keys)
        non_keys = [c for c in self.columns if c not in self.keys]
        # NULLS FIRST matches Spark's ascending default, so this sink
        # and ParquetMergeSink's dedup_by_key pick the SAME survivor
        # for same-key rows with NULL non-key values (SQL's default
        # ASC is NULLS LAST on PG/DuckDB — they would diverge)
        order = (
            ", ".join(f"{quote_ident(c)} NULLS FIRST" for c in non_keys)
            if non_keys
            else keys
        )
        if mode == "insert":
            conflict = "DO NOTHING"
        elif not non_keys:
            conflict = "DO NOTHING"  # key-only table: nothing to update
        else:
            sets = ", ".join(
                f"{quote_ident(c)} = excluded.{quote_ident(c)}"
                for c in non_keys
            )
            conflict = f"DO UPDATE SET {sets}"
        return (
            f"INSERT INTO {quote_ident(self.table)} ({cols}) "
            f"SELECT {cols} FROM ("
            f"  SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order}) AS rn"
            f"  FROM {quote_ident(self.staging_name())}"
            f") dedup WHERE rn = 1 "
            f"ON CONFLICT ({keys}) {conflict}"
        )

    def drop_staging_sql(self) -> str:
        return f"DROP TABLE IF EXISTS {quote_ident(self.staging_name())}"

    def merge(
        self,
        df: DataFrame,
        watermark_sql: str | None = None,
        via_driver: bool = False,
        mode: str = "insert",
    ) -> None:
        """Stage rows, then run merge (+ optional watermark update)
        in one driver transaction. ``mode="upsert"`` replaces
        same-key rows (ON CONFLICT DO UPDATE) instead of skipping
        them.

        ``via_driver=True`` streams rows through the driver
        (``toLocalIterator`` consumed in fixed-size chunks — memory
        bounded by the chunk, never the frame) for databases that
        allow only one writing process (single-file duckdb/sqlite in
        tests). Real servers keep the default executor-side
        ``foreachPartition`` path.
        """
        cols = self.columns
        factory = self.connection_factory
        insert = self.insert_sql()
        copy_fn = self.copy_partition
        copy_stmt = pg_copy_sql(self.staging_name(), cols)

        con = factory()
        cur = con.cursor() if hasattr(con, "cursor") else con
        cur.execute(self.drop_staging_sql())
        cur.execute(self.create_staging_sql())

        def write_rows(conn, rows) -> None:
            batch = [tuple(r[col] for col in cols) for r in rows]
            if not batch:
                return
            if copy_fn is not None:
                payload = "".join(
                    encode_copy_text_row(b) + "\n" for b in batch
                )
                copy_fn(conn, copy_stmt, payload)
                return
            k = conn.cursor() if hasattr(conn, "cursor") else conn
            k.executemany(insert, batch)

        if via_driver:
            import itertools

            it = df.toLocalIterator()
            while True:
                chunk = list(itertools.islice(it, 10_000))
                if not chunk:
                    break
                write_rows(con, chunk)
        else:

            def write_partition(rows) -> None:
                c = factory()
                write_rows(c, rows)
                if hasattr(c, "commit"):
                    c.commit()

            # staging_parallelism (when set) bounds concurrent DB
            # connections; the None default writes all partitions.
            staged = (
                df
                if self.staging_parallelism is None
                else df.coalesce(self.staging_parallelism)
            )
            staged.foreachPartition(write_partition)

        try:
            if hasattr(con, "begin"):
                con.begin()
            cur.execute(self.merge_sql(mode))
            if watermark_sql:
                cur.execute(watermark_sql)
            if hasattr(con, "commit"):
                con.commit()
        finally:
            cur.execute(self.drop_staging_sql())
            if hasattr(con, "commit"):
                con.commit()
