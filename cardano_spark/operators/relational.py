"""Core relational building blocks re-expressed Spark-first.

These are the engine equivalents of the reference's hand-written SQL /
DAO patterns (SURVEY.md §2.4, §2.6, §2.7). Each is a thin, composable
DataFrame transform so Catalyst sees the whole plan (pushdown, join
re-ordering, AQE all apply).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def insert_if_absent(existing: DataFrame, incoming: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``INSERT ... ON CONFLICT (pk) DO NOTHING`` as a DataFrame op.

    The reference's idempotency primitive (D1: temp table + ON CONFLICT,
    src/dao/cardano_block_dao.py:93-148) = keep all existing rows, add
    only incoming rows whose key is absent. Incoming is deduped on the
    key first (D2) because raw batches may overlap on re-run.

    Scale: the anti-join shuffles both sides on ``keys``; when
    ``existing`` is a real table, pre-filter it to the incoming key
    range (partition pruning) before calling — the JDBC sink variant
    (sinks/jdbc_upsert.py) pushes this server-side instead.
    """
    fresh = incoming.dropDuplicates(list(keys)).join(existing, list(keys), "left_anti")
    return existing.unionByName(fresh)


def topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k (O1). Spark plans this as
    TakeOrderedAndProject — per-partition heap + driver merge, no full
    sort, no shuffle of the full input. ``order`` must be a total
    order (include a unique tiebreak) for deterministic results."""
    return df.orderBy(*order).limit(k)


def missing_children(
    parents: DataFrame, children: DataFrame, on: Sequence[str]
) -> DataFrame:
    """Ingestion-gap anti-join (J1; reference README.md:117-121 wrote
    it as LEFT JOIN ... WHERE child.col IS NULL). left_anti skips
    materializing the null-padded rows."""
    return parents.join(children, list(on), "left_anti")


def with_running(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[str],
    agg_col: Column,
    out: str,
) -> DataFrame:
    """Running aggregate over an explicit total order. The aggregated
    expression should be exact-typed (decimal/long) so the result is
    order-of-evaluation independent."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*partition)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn(out, F.sum(agg_col).over(w))
