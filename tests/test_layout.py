"""Z-order layout: interleave correctness + a MEASURED layout win —
per-row-group bounding boxes of a z-sorted write cover less of the
(user, time) plane than a single-key sort, which is exactly what
makes two-dimensional zone-map pruning work."""

from __future__ import annotations

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from cardano_spark.catalog import table
from cardano_spark.functions.layout import zorder_key
from tests.conftest import SF_SMALL


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in out.items():
        assert z == ref(x, y), (x, y)


def _rowgroup_ranges(path: str) -> list[tuple[tuple[int, int], tuple[int, int]]]:
    out = []
    for piece in pq.ParquetDataset(path).fragments:
        md = piece.metadata
        names = {c: i for i, c in enumerate(md.schema.names)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            ub = g.column(names["user_bucket"]).statistics
            tb = g.column(names["time_bucket"]).statistics
            out.append(((ub.min, ub.max), (tb.min, tb.max)))
    return out


def _groups_scanned(path: str, n_buckets: int) -> tuple[int, int]:
    """Zone-map pruning cost: for every point predicate on each
    dimension, how many row groups survive min/max pruning (must be
    read). Returns (total for all user_bucket points, total for all
    time_bucket points)."""
    ranges = _rowgroup_ranges(path)
    u_cost = sum(
        sum(1 for (u, _) in ranges if u[0] <= v <= u[1])
        for v in range(n_buckets)
    )
    t_cost = sum(
        sum(1 for (_, t) in ranges if t[0] <= v <= t[1])
        for v in range(n_buckets)
    )
    return u_cost, t_cost


def test_zsorted_write_balances_zone_map_pruning(spark, tmp_path):
    # sf0.01: enough rows (10k) for ~10 row groups at a 64 KiB block
    e = table(spark, "/root/testdata/sf0.01", "events")
    ub = F.pmod(F.col("user_id"), F.lit(64))
    tb = F.pmod(F.floor(F.unix_timestamp(F.col("ts")) / F.lit(3600)), F.lit(64))
    base = e.select(
        "event_id",
        ub.cast("long").alias("user_bucket"),
        tb.cast("long").alias("time_bucket"),
        zorder_key(ub, tb, bits=6).alias("zkey"),
    )
    opts = {"parquet.block.size": str(64 * 1024)}  # many small row groups
    z_path, u_path = str(tmp_path / "z"), str(tmp_path / "u")
    (
        base.repartition(1)
        .sortWithinPartitions("zkey")
        .write.options(**opts)
        .parquet(z_path)
    )
    (
        base.repartition(1)
        .sortWithinPartitions("user_bucket")
        .write.options(**opts)
        .parquet(u_path)
    )
    zu, zt = _groups_scanned(z_path, 64)
    uu, ut = _groups_scanned(u_path, 64)
    gz, gu = len(_rowgroup_ranges(z_path)), len(_rowgroup_ranges(u_path))
    # fraction of row groups a point predicate must scan, per dim
    z_frac_u, z_frac_t = zu / (64 * gz), zt / (64 * gz)
    u_frac_u, u_frac_t = uu / (64 * gu), ut / (64 * gu)
    # single-key sort: optimal on its own key, but a time predicate
    # scans EVERY row group (no pruning at all on the second dim)
    assert u_frac_t > 0.95, (u_frac_t,)
    # z-order: BOTH dimensions prune — neither degenerates to a full
    # scan (the balanced-pruning property that is the point of the
    # curve; it trades a little single-key optimality for it)
    assert z_frac_t < 0.6, (z_frac_t, u_frac_t)
    assert z_frac_u < 0.8, (z_frac_u,)
    assert max(z_frac_u, z_frac_t) < max(u_frac_u, u_frac_t) * 0.8
