"""R1-R3 reliability semantics of the HTTP fetch-map (SURVEY §2.12):
retry count, exponential backoff schedule, reraise-after-exhaustion,
and the per-partition rate cap. Driver-side with a monkeypatched
clock — no sleeping, no network."""

from __future__ import annotations

import pytest

from cardano_spark.sources import http_fetch as HF


def test_with_retry_succeeds_after_transient_failures(monkeypatch):
    sleeps: list[float] = []
    monkeypatch.setattr(HF.time, "sleep", sleeps.append)
    calls = {"n": 0}

    def flaky(url: str) -> bytes:
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return b"ok"

    assert HF.with_retry(flaky)("u") == b"ok"
    assert calls["n"] == 3
    # reference schedule: base 0.1, x1.5 (get_block_from_s3.py:22-28)
    assert sleeps == [pytest.approx(0.1), pytest.approx(0.15)]


def test_with_retry_reraises_after_five_attempts(monkeypatch):
    sleeps: list[float] = []
    monkeypatch.setattr(HF.time, "sleep", sleeps.append)
    calls = {"n": 0}

    def always_down(url: str) -> bytes:
        calls["n"] += 1
        raise HF.HttpFetchError("503")

    with pytest.raises(HF.HttpFetchError):
        HF.with_retry(always_down)("u")
    assert calls["n"] == 5  # R2: five attempts, then reraise (R3)
    assert len(sleeps) == 4  # no sleep after the final failure
    assert sleeps == sorted(sleeps) and sleeps[0] < sleeps[-1]  # growing


def test_fetch_json_map_rate_cap_spaces_requests(spark):
    """requests_per_second drives the per-partition pacing path:
    every id is fetched exactly once (one output row each) with the
    rate cap active. The transport runs in executor workers, so the
    fetch timestamps are asserted executor-side: each payload carries
    its fetch time and consecutive fetches within the single
    partition must be >= 1/rps apart."""
    import time as _time

    from pyspark.sql import types as T

    def transport(url: str) -> bytes:
        h = int(url.rsplit("/", 1)[1])
        return b'{"id": %d, "t": %f}' % (h, _time.monotonic())

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("t", T.DoubleType())]
    )
    ids = HF.heights_range(spark, 1, 6).coalesce(1)
    out = HF.fetch_json_map(
        ids,
        "height",
        lambda h: f"http://x/{h}",
        schema,
        transport=transport,
        requests_per_second=100.0,  # 10ms spacing: measurable, fast
    ).collect()
    assert sorted(r.id for r in out) == [1, 2, 3, 4, 5, 6]
    times = sorted(r.t for r in out)
    gaps = [b - a for a, b in zip(times, times[1:])]
    # pacing sleeps BEFORE each fetch after the first; allow jitter
    assert all(g >= 0.008 for g in gaps), gaps


def test_fetch_json_map_list_payloads_flatten(spark):
    """A list-shaped payload (the reference's raw files hold lists of
    dicts) flattens into one row per element."""
    from pyspark.sql import types as T

    def transport(url: str) -> bytes:
        h = int(url.rsplit("/", 1)[1])
        return b'[{"id": %d}, {"id": %d}]' % (h, h + 100)

    schema = T.StructType([T.StructField("id", T.LongType())])
    ids = HF.heights_range(spark, 1, 3)
    out = HF.fetch_json_map(
        ids, "height", lambda h: f"http://x/{h}", schema, transport=transport
    ).collect()
    assert sorted(r.id for r in out) == [1, 2, 3, 101, 102, 103]
