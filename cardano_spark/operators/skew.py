"""Skew-mitigation joins: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime by splitting oversized shuffle partitions. Salting is the
complementary *plan-level* tool for the pathological case AQE can't
fix: one join key so hot that a single key's rows exceed an
executor's memory. It spreads each hot key over ``n_salts``
partitions by joining on (key, salt) instead of (key):

- fact side: deterministic salt from a high-cardinality column
  (``pmod(xxhash64(id), n)``) — NOT ``rand()``, which breaks task
  retry determinism;
- dim side: replicated ``n_salts`` times via an explode.

Result rows are identical to the unsalted join (each fact row meets
exactly one replica of its dim row); only the shuffle distribution
changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_narrow_input(
    df: DataFrame,
    min_parts: int | None = None,
    by: list[str] | None = None,
    est_parts: int | None = None,
) -> DataFrame:
    """Round-robin repartition applied ONLY when the physical input
    yields fewer partitions than the session's parallelism — the
    optimization guide's §2.5 "input skew: one huge unsplittable file
    … repartition immediately after the read".

    The driver's fixture tables are single-row-group parquet files:
    parquet cannot split a row group, so every scan stage is ONE task
    and all per-row compute downstream of the scan serializes on one
    core no matter how many the session has. Callers wrap the
    *compute-heavy* scan inputs (tokenization, hashing, vector math)
    so that work spreads across cores. On production layouts (many
    files / row groups per file) the gate sees partitions >=
    parallelism and returns the frame untouched — no exchange is ever
    added at the 100 TB design point, where an unconditional
    ``repartition`` would be the accidental-shuffle anti-pattern of
    guide §2.4.

    Value-neutral by construction: round-robin placement feeds only
    partition-order-insensitive consumers (aggregations, equi-joins,
    keyed windows) in this repo; callers that depend on input order
    must not use it.

    ``by``: columns to HASH-partition on instead of round-robin.
    ALWAYS prefer a key when the frame has any high-cardinality
    column (a unique id works even when nothing downstream groups by
    it): a keyless round-robin repartition first SORTS its input
    inside each task (``spark.sql.execution.sortBeforeRepartition``,
    required for RR retry-determinism — guide §2.5), and on the
    single-task narrow inputs this helper exists for, that pre-sort
    is serial — measured 1.29 s -> 0.69 s (r11, full-width lineitem
    sf0.1) just by switching the bare spread RR -> hash(l_orderkey).
    Hash placement is also deterministic under retries by itself.
    Two further effects when the key IS the downstream groupBy/window
    key (high-cardinality case): a round-robin spread leaves each
    task with mostly-unique keys, so the partial aggregation stops
    collapsing and the next exchange carries ~raw rows twice;
    hash-partitioning on the key makes the spread exchange double as
    the aggregation's own exchange (guide §2.4 — two operations keyed
    the same way share one exchange) and the aggregate runs complete,
    no partial pass. Do NOT key on a low-cardinality column (fewer
    distinct values than cores idles the rest). Round-robin remains
    for frames with no usable key; such consumers must be
    partition-order-insensitive.

    ``est_parts``: caller-supplied partition estimate (e.g. from
    ``catalog.scan_partitions_estimate`` — file stats, no Spark call).
    The exact ``df.rdd.getNumPartitions()`` probe costs ~0.15-0.25 s
    of driver-side physical planning PER CALL (measured, r11), which
    the bench pays on every query build; callers that know their
    input is a bare scan should pass the stat-based estimate instead.
    Callers passing mid-plan frames (operators) must NOT estimate from
    source files — a post-shuffle frame is already wide even when its
    source is one file — and leave this None for the exact probe."""
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    n = est_parts if est_parts is not None else df.rdd.getNumPartitions()
    if n >= min_parts:
        return df
    if by:
        return df.repartition(min_parts, *[F.col(c) for c in by])
    return df.repartition(min_parts)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` and ``dim`` on ``key`` with ``n_salts``-way
    salting. ``salt_source`` must be a deterministic high-cardinality
    expression on the fact side (e.g. a row id)."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")


#: merge functions usable in BOTH phases of a salted aggregation:
#: each is associative/commutative and idempotent to re-merge
_SALT_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[Column, str] | tuple[Column, str, str]],
    salt_source: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with explicit salting for PATHOLOGICAL
    key skew: phase 1 aggregates on (keys..., salt) — the hot key's
    rows spread over ``n_salts`` reducers — phase 2 re-aggregates the
    <= n_salts partials per key. Identical output to the plain
    groupBy for DECOMPOSABLE aggregates (sum/count/min/max — pass
    exact types: decimal/long sums re-associate losslessly, double
    sums do NOT and are the caller's risk).

    ``aggs`` is [(column_expr, name)] or [(column_expr, name, fn)]
    with ``fn`` in {"sum", "min", "max"} (default "sum"; encode count
    as ``F.lit(1)`` with "sum"). The SAME merge function runs in both
    phases — sum-of-sums, min-of-mins, max-of-maxes are the
    decomposable merges; anything else (avg, count_distinct) must be
    rewritten into these before salting. When is this needed at all?
    Spark's own partial aggregation already combines map-side, which
    handles most skew; the residual case is a LOW-CARDINALITY
    group-by (the reducer count collapses to |keys|) where one
    reducer still receives every partial for the hot key AND the
    per-key partial stream is huge (e.g. high-cardinality
    intermediate state upstream of the final agg). The salt keeps
    reduce-side parallelism at |keys| x n_salts until the final tiny
    pass."""
    norm = []
    for a in aggs:
        expr, name = a[0], a[1]
        fn = a[2] if len(a) > 2 else "sum"
        if fn not in _SALT_FNS:
            raise ValueError(f"fn must be one of {sorted(_SALT_FNS)}, got {fn!r}")
        norm.append((expr, name, _SALT_FNS[fn]))
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[fn(expr).alias(name) for expr, name, fn in norm]
    )
    return phase1.groupBy(*keys).agg(
        *[fn(F.col(name)).alias(name) for _, name, fn in norm]
    )
