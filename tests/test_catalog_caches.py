"""The catalog's metadata caches must be (path, mtime)-keyed so a
regenerated fixture of a different size in the same process never
serves a stale estimate (r11 verdict, What's wrong #4). Pure os.stat
logic — no Spark session needed."""

from __future__ import annotations

import os

from cardano_spark.catalog import (
    _MAX_SPLIT_BYTES,
    scan_partitions_estimate,
    table_bytes,
)


def _write(path: str, n_bytes: int, mtime: float) -> None:
    with open(path, "wb") as f:
        f.write(b"\0" * n_bytes)
    os.utime(path, (mtime, mtime))


def test_scan_partitions_estimate_refreshes_on_mtime(tmp_path):
    sf = str(tmp_path)
    p = os.path.join(sf, "lineitem.parquet")
    _write(p, 10, 1000.0)
    assert scan_partitions_estimate(sf, "lineitem") == 1
    # same path, bigger file, new mtime -> estimate must move
    _write(p, 3 * _MAX_SPLIT_BYTES, 2000.0)
    assert scan_partitions_estimate(sf, "lineitem") == 3


def test_table_bytes_refreshes_on_mtime(tmp_path):
    sf = str(tmp_path)
    p = os.path.join(sf, "orders.parquet")
    _write(p, 123, 1000.0)
    assert table_bytes(sf, "orders") == 123
    _write(p, 456, 2000.0)
    assert table_bytes(sf, "orders") == 456


def test_missing_path_returns_none(tmp_path):
    assert scan_partitions_estimate(str(tmp_path), "nation") is None
    assert table_bytes(str(tmp_path), "nation") is None
