"""Data-layout keys: Z-order (Morton) interleaving for
multi-dimensional clustering.

Sorting a 100 TB table by ONE key gives parquet min/max (zone-map)
pruning on that key only; interleaving the bits of two bucketed
dimensions gives useful pruning on BOTH — the technique behind
Delta/Iceberg ``ZORDER BY`` / cluster keys, here as a plain column
expression so any writer (`repartitionByRange(zkey).sortWithin
Partitions(zkey)`, or `write_training_shards` with the zkey as the
shard key) produces the clustered layout with no engine extension.

Everything is integer shift/mask arithmetic — identical in Spark and
DuckDB, so layout keys are oracle-verifiable like any other column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of
    ``x`` lands at position 2i, bit i of ``y`` at 2i+1. Inputs must
    already be BUCKETED to the key range (e.g. ``pmod(hash, 2^bits)``
    or ``floor(ts / window)``): Z-order clusters bucket ids, the
    caller chooses bucket resolution."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftrightunsigned(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftrightunsigned(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB text twin of :func:`zorder_key`."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
