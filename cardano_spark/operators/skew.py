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
